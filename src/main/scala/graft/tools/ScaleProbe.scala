package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graph.{LinkGraph, Transcripts}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.PageRank

/** Dev probe: time each phase of the scaling benchmark at one core count.
 * Usage: runMain graft.tools.ScaleProbe <cores> <convs> [iters] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val convs = args(1).toLong
    val iters = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = Transcripts.synthetic(spark, convs, 12, 42L)
    val v = timed("vertices+cache") {
      val v = LinkGraph.vertices(t).cache(); v.count(); v
    }
    val pe = timed("edges+selfloops+cache") {
      val pe = LinkGraph.withSelfLoops(LinkGraph.directedEdges(v), v).cache()
      println("[probe] edges=" + pe.count()); pe
    }
    val n = v.count()
    val (state, metrics) = timed(s"pagerank x$iters") {
      new Pregel(spark, PregelConfig(numPartitions = cores, mode = Hybrid, fusedSupersteps = sys.env.getOrElse("SPARK_GRAFT_FUSE", "1").toInt))
        .run(new PageRank(n, iters), v.select("vid"), pe)
    }
    timed("force final") { state.agg(org.apache.spark.sql.functions.sum("value")).head() }
    metrics.foreach(m => println(s"[probe] step=${m.superstep} style=${m.style} wallMs=${m.wallMs} respond=${m.respondCount} estMsgs=${m.estMsgs}"))
    spark.stop()
  }
}
