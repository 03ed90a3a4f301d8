package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.PageRank

/** Dev probe: PR kernel timing / superstep-2 plan (GRAFT_EXPLAIN). */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = Bench.session(32, 32)
    val g = SparkEntry.graphOf(s, dir)
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val (st, mets) = new Pregel(s, PregelConfig(numPartitions = 32, mode = Hybrid,
        fusedSupersteps = 4)).run(new PageRank(g.n, SparkEntry.PR_ITERS), g.verts.select("vid"), g.prEdges)
      st.agg(sum("value")).head()
      println(f"[probe] rep=$rep pr=${(System.nanoTime() - t0) / 1e9}%6.2fs [${mets.map(_.wallMs).mkString(",")}]")
    }
    s.stop()
  }
}
