package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.{PageRank, ConnectedComponents}

/** Dev probe: PR/CC kernel cost vs (aqe, fuse). */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    for (aqe <- Seq(true, false); fuse <- Seq(4, 1); rep <- 1 to 2) {
      val s = Bench.session(32, 32, aqe = aqe)
      val g = SparkEntry.graphOf(s, dir)
      val pe = g.prEdges.cache(); pe.count()
      val pregel = new Pregel(s, PregelConfig(numPartitions = 32, mode = Hybrid, fusedSupersteps = fuse))
      val t0 = System.nanoTime()
      val (st, mets) = pregel.run(new PageRank(g.n, SparkEntry.PR_ITERS), g.verts.select("vid"), pe)
      st.agg(sum("value")).head()
      val tpr = (System.nanoTime() - t0) / 1e9
      val walls = mets.map(_.wallMs).mkString(",")
      val t1 = System.nanoTime()
      val (st2, mets2) = new Pregel(s, PregelConfig(numPartitions = 32, mode = Hybrid))
        .run(new ConnectedComponents(SparkEntry.CC_ITERS), g.verts.select("vid"), g.undirected)
      st2.agg(count(lit(1))).head()
      val tcc = (System.nanoTime() - t1) / 1e9
      println(f"[probe] aqe=$aqe fuse=$fuse rep=$rep pr=$tpr%6.2fs [$walls] cc=$tcc%6.2fs")
      pe.unpersist()
      s.stop()
    }
  }
}
