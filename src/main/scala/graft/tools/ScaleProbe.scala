package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graph.{LinkGraph, Transcripts}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.PageRank

/** Dev probe: the Bench scaling measurement in isolation, with knobs.
 * Defaults mirror Bench.scaleRun (tmpfs local dir, lz4 compression ON,
 * AQE off, fuse=4, graph pre-materialized to parquet); the summary
 * statistic here is the simpler median-of-second-half, so compare raw
 * wallMs groups when cross-checking against Bench's min/median-of-groups.
 * Usage: runMain graft.tools.ScaleProbe <convs> <iters> <cores>[,<cores>...]
 * Env: SPARK_GRAFT_FUSE, SPARK_GRAFT_COMPRESS, SPARK_GRAFT_RDD_COMPRESS,
 *      SPARK_GRAFT_PARTS_MULT, SPARK_GRAFT_PARTS_FIXED
 */
object ScaleProbe {
  private def session(cores: Int, parts: Int): SparkSession = {
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-probe-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", sys.env.getOrElse("SPARK_GRAFT_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("SPARK_GRAFT_COMPRESS", "true"))
      // superstep shuffle files are only freed when their (lineage-
      // truncated, unreferenced) RDDs get GC'd; the 30-min default lets
      // them pile up on tmpfs for the whole run
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.rdd.compress", sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "true"))
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4"))
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val convs = args(0).toLong
    val iters = args(1).toInt
    val coresList = args(2).split(",").map(_.toInt).toSeq
    val fuse = sys.env.getOrElse("SPARK_GRAFT_FUSE", "4").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_PARTS_MULT", "1").toInt
    val fixedParts = sys.env.get("SPARK_GRAFT_PARTS_FIXED").map(_.toInt)
    val dir = "/dev/shm/graft-probe"

    locally {
      val s = session(32, 32)
      val t = Transcripts.synthetic(s, convs, 12, seed = 42L)
      val v = LinkGraph.vertices(t).select("vid", "turns", "turn_idx", "tool", "conv_id").cache()
      LinkGraph.withSelfLoops(LinkGraph.directedEdges(v), v)
        .write.mode("overwrite").parquet(s"$dir/edges")
      v.select("vid").write.mode("overwrite").parquet(s"$dir/verts")
      s.stop()
    }

    val results = coresList.map { cores =>
      val parts = fixedParts.getOrElse(cores * mult)
      val s = session(cores, parts)
      val verts = s.read.parquet(s"$dir/verts")
      val pe = s.read.parquet(s"$dir/edges").cache()
      val m = pe.count()
      val n = verts.count()
      val pregel = new Pregel(s, PregelConfig(numPartitions = parts, mode = Hybrid,
        fusedSupersteps = fuse))
      val t0 = System.nanoTime()
      val (state, metrics) = pregel.run(new PageRank(n, iters), verts, pe)
      state.agg(org.apache.spark.sql.functions.sum("value")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      val wall = metrics.map(_.wallMs)
      val steady = wall.drop(math.max(2, wall.length / 2)).sorted
      val med = (if (steady.isEmpty) wall.sorted else steady).apply(
        (if (steady.isEmpty) wall.length else steady.length) / 2) / 1000.0
      println(f"[probe] cores=$cores parts=$parts fuse=$fuse edges=$m total=$secs%.1f medStep=$med%.3f thr=${m / med}%.0f e/s")
      println("[probe]   wallMs=" + wall.mkString(","))
      s.stop()
      (cores, m / med)
    }
    for (Seq((c1, t1), (c2, t2)) <- results.sliding(2)) {
      val eff = (t2 / t1) / (c2.toDouble / c1)
      println(f"[probe] eff $c1->$c2: $eff%.3f")
    }
  }
}
