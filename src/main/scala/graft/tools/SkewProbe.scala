package graft.tools

import org.apache.spark.sql.functions._
import graft.graph.{LinkGraph, Transcripts}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.ConnectedComponents
import graft.Bench

/** Dev probe: the Bench skew row in isolation with per-superstep walls.
 * Usage: runMain graft.tools.SkewProbe [convs] [iters] */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val convs = if (args.nonEmpty) args(0).toLong else 150000L
    val iters = if (args.length > 1) args(1).toInt else 8
    val s = Bench.session(16, 32, aqe = false)
    val t = Transcripts.synthetic(s, convs, 12, seed = 7L)
    val v = LinkGraph.vertices(t).select("vid", "turns", "turn_idx", "tool", "conv_id").cache()
    val sym = LinkGraph.symmetrize(LinkGraph.directedEdges(v)).cache()
    println("[skew] edges=" + sym.count() +
      " maxdeg=" + sym.groupBy("src").count().agg(max("count")).head().getLong(0))
    for (salt <- Seq(0L, 1L << 16)) {
      val t0 = System.nanoTime()
      val (_, m) = new Pregel(s, PregelConfig(numPartitions = 32, mode = Hybrid, saltMinDeg = salt))
        .run(new ConnectedComponents(iters), v.select("vid"), sym)
      println(f"[skew] salt=$salt total=${(System.nanoTime() - t0) / 1e9}%.1f " +
        "wallMs=" + m.map(x => s"${x.wallMs}(${x.style})").mkString(","))
    }
    s.stop()
  }
}
