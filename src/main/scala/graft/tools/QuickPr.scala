package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.PageRank

/** Dev probe: headline PageRank on an sfDir graph at a given fuse level.
 * Usage: runMain graft.tools.QuickPr <sfDir> <fuse> [iters] */
object QuickPr {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val fuse = args(1).toInt
    val iters = if (args.length > 2) args(2).toInt else 10
    val s = Bench.session(32, 32)
    val g = SparkEntry.graphOf(s, sfDir)
    val e = g.prEdges.cache()
    val m = e.count()
    val pregel = new Pregel(s, PregelConfig(numPartitions = 32, mode = Hybrid, fusedSupersteps = fuse))
    val t0 = System.nanoTime()
    val (state, metrics) = pregel.run(new PageRank(g.n, iters), g.verts.select("vid"), e)
    state.agg(sum("value")).head()
    println(f"[qpr] fuse=$fuse edges=$m secs=${(System.nanoTime() - t0) / 1e9}%.1f " +
      "wallMs=" + metrics.map(_.wallMs).mkString(","))
    s.stop()
  }
}
