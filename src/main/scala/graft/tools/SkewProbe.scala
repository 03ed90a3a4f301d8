package graft.tools

import org.apache.spark.sql.functions._
import graft.graph.{LinkGraph, Transcripts}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.LabelPropagation
import graft.Bench

/** Dev probe: the Bench skew row in isolation with per-superstep walls —
 * transcript graph + a genuine hub (vertex 0 linked to every vertex),
 * LPA so every vertex responds every superstep.
 * Usage: runMain graft.tools.SkewProbe [convs] [iters] */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val convs = if (args.nonEmpty) args(0).toLong else 150000L
    val iters = if (args.length > 1) args(1).toInt else 8
    val cores = if (args.length > 2) args(2).toInt else 16
    val s = Bench.session(cores, 32, aqe = false)
    val t = Transcripts.synthetic(s, convs, 12, seed = 7L)
    val v = LinkGraph.vertices(t).select("vid", "turns", "turn_idx", "tool", "conv_id").cache()
    val base = LinkGraph.symmetrize(LinkGraph.directedEdges(v))
    val star = v.select(col("vid")).filter(col("vid") =!= 0L)
      .select(lit(0L).as("src"), col("vid").as("dst"))
    val sym = base.unionByName(star)
      .unionByName(star.select(col("dst").as("src"), col("src").as("dst"))).cache()
    println("[skew] edges=" + sym.count() +
      " maxdeg=" + sym.groupBy("src").count().agg(max("count")).head().getLong(0))
    // mirror the Bench skew protocol: untimed in-session warm-up, then
    // interleaved off/on x2 with per-variant min
    new Pregel(s, PregelConfig(numPartitions = 32, mode = Hybrid))
      .run(new LabelPropagation(8), v.select("vid"), sym)
    def run(salt: Long): Double = {
      val t0 = System.nanoTime()
      val (_, m) = new Pregel(s, PregelConfig(numPartitions = 32, mode = Hybrid, saltMinDeg = salt))
        .run(new LabelPropagation(iters), v.select("vid"), sym)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[skew] salt=$salt total=$secs%.1f " +
        "wallMs=" + m.map(x => s"${x.wallMs}(${x.style})").mkString(","))
      secs
    }
    val off0 = run(0L); val on0 = run(1L << 16)
    val off1 = run(0L); val on1 = run(1L << 16)
    println(f"[skew] MIN unsalted=${math.min(off0, off1)}%.1f salted=${math.min(on0, on1)}%.1f")
    s.stop()
  }
}
