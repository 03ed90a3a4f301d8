package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.Bench
import graft.graph.{LinkGraph, Transcripts}
import graft.pregel.{Pregel, PregelConfig, Hybrid}
import graft.algos.PageRank

/** Dev probe: decompose the scaling workload's step time at N cores into
 * task compute / GC / shuffle / scheduler-gap — answers "what part of the
 * hi-core step does not scale". Mirrors Bench.scaleRun's session config.
 * Usage: runMain graft.tools.ScaleDecomp <convs> <iters> <cores>[,<cores>] */
object ScaleDecomp {
  private final class MetricSum extends SparkListener {
    var tasks = 0L
    var durMs = 0L; var runMs = 0L; var gcMs = 0L
    var shufWriteNs = 0L; var fetchWaitMs = 0L; var deserMs = 0L; var serMs = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val m = t.taskMetrics
      if (m != null && t.taskInfo != null) {
        tasks += 1
        durMs += t.taskInfo.duration
        runMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shufWriteNs += m.shuffleWriteMetrics.writeTime
        fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
        deserMs += m.executorDeserializeTime
        serMs += m.resultSerializationTime
      }
    }
    def snapshot: (Long, Long, Long, Long, Long, Long, Long, Long) =
      synchronized { (tasks, durMs, runMs, gcMs, shufWriteNs / 1000000, fetchWaitMs, deserMs, serMs) }
  }

  def main(args: Array[String]): Unit = {
    val convs = args(0).toLong
    val iters = args(1).toInt
    val coresList = args(2).split(",").map(_.toInt).toSeq
    val fuse = sys.env.getOrElse("SPARK_GRAFT_FUSE", "4").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_SCALE_PARTS", "32").toInt
    val dir = "/dev/shm/graft-decomp"
    locally {
      val s = Bench.session(32, 32)
      val t = Transcripts.synthetic(s, convs, 12, seed = 42L)
      val v = LinkGraph.vertices(t).select("vid", "turns", "turn_idx", "tool", "conv_id").cache()
      LinkGraph.withSelfLoops(LinkGraph.directedEdges(v), v)
        .write.mode("overwrite").parquet(s"$dir/edges")
      v.select("vid").write.mode("overwrite").parquet(s"$dir/verts")
      s.stop()
    }
    for (cores <- coresList) {
      val s = Bench.session(cores, parts, aqe = false)
      val verts = s.read.parquet(s"$dir/verts")
      val pe = s.read.parquet(s"$dir/edges").cache()
      val m = pe.count(); val n = verts.count()
      val pregel = new Pregel(s, PregelConfig(numPartitions = parts, mode = Hybrid,
        fusedSupersteps = fuse))
      // untimed warm-up, as Bench does
      pregel.run(new PageRank(n, math.max(fuse * 4, 16)), verts, pe)
      val lst = new MetricSum
      s.sparkContext.addSparkListener(lst)
      val t0 = System.nanoTime()
      val (state, mets) = pregel.run(new PageRank(n, iters), verts, pe)
      state.agg(org.apache.spark.sql.functions.sum("value")).head()
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      s.sparkContext.removeSparkListener(lst)
      val (tasks, durMs, runMs, gcMs, swMs, fwMs, deMs, seMs) = lst.snapshot
      val walls = mets.map(_.wallMs)
      println(f"[decomp] cores=$cores wall=$wallS%.1f edges=$m steps=${walls.mkString(",")}")
      println(f"[decomp] cores=$cores tasks=$tasks taskDur=${durMs / 1000.0}%.1fs run=${runMs / 1000.0}%.1fs " +
        f"gc=${gcMs / 1000.0}%.1fs shufWrite=${swMs / 1000.0}%.1fs fetchWait=${fwMs / 1000.0}%.1fs " +
        f"deser=${deMs / 1000.0}%.1fs ser=${seMs / 1000.0}%.1fs " +
        f"busy=${durMs / 1000.0 / cores / wallS * 100}%.0f%% (taskDur/cores/wall)")
      s.stop()
    }
  }
}
