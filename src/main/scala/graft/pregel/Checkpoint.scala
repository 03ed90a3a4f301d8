package graft.pregel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/**
 * Superstep-state checkpointing with per-partition lineage + convergence
 * metrics, resumable mid-iteration (north rule; reference analog:
 * /root/reference/src/java/org/apache/hama/myhama/graph/
 * CheckPointManager.java:61-122 and the ARCHIVE/RECOVER command cycle in
 * bsp/JobInProgress.java:862-883).
 *
 * Layout (snapshot-per-superstep, Iceberg-shaped — swap the parquet write
 * for `writeTo(table).createOrReplace()` when an Iceberg catalog is on the
 * classpath; none ships in this sandbox):
 *   <dir>/<algo>/step=<t>/state/      vertex-state parquet snapshot
 *   <dir>/<algo>/step=<t>/meta.json   jobAgg + per-partition row counts
 *                                     + full superstep metrics history
 *
 * Reloading the written snapshot also truncates the iterative lineage
 * (replaces the reference's value-<ite> file double-buffering,
 * GraphDataServerDisk.java:1222-1258).
 */
final class Checkpoint(spark: SparkSession, dir: String, algo: String) {
  private def stepDir(t: Int): String = s"$dir/$algo/step=$t"

  /** Write snapshot + metadata; return the reloaded (lineage-free) state. */
  def save(state: DataFrame, t: Int, jobAgg: Double, history: Seq[SuperstepMetrics]): DataFrame = {
    val sd = stepDir(t)
    state.write.mode("overwrite").parquet(s"$sd/state")
    val parts = state.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => s"""{"pid":${r.getInt(0)},"rows":${r.getLong(1)}}""")
    val hist = history.map(m =>
      s"""{"superstep":${m.superstep},"style":"${m.style}","respond":${m.respondCount},""" +
        s""""estMsgs":${m.estMsgs},"jobAgg":${m.jobAgg},"q":${m.q},""" +
        s""""activeBlocks":${m.activeBlocks},"wallMs":${m.wallMs}}""")
    val json =
      s"""{"algo":"$algo","superstep":$t,"jobAgg":$jobAgg,
         |"partitions":[${parts.mkString(",")}],
         |"metrics":[${hist.mkString(",")}]}""".stripMargin
    Files.createDirectories(Paths.get(sd))
    Files.writeString(Paths.get(s"$sd/meta.json"), json)
    spark.read.parquet(s"$sd/state")
  }

  /** Most recent complete snapshot: (superstep, state, jobAgg). */
  def latest(): Option[(Int, DataFrame, Double)] = {
    val base = Paths.get(s"$dir/$algo")
    if (!Files.isDirectory(base)) return None
    val steps = Files.list(base).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("step=") && complete(p))
      .map(p => p.getFileName.toString.stripPrefix("step=").toInt)
      .toSeq.sorted
    steps.lastOption.map { t =>
      val meta = Files.readString(Paths.get(s"${stepDir(t)}/meta.json"))
      val jobAgg = """"jobAgg":([-0-9.eE]+)""".r.findFirstMatchIn(meta)
        .map(_.group(1).toDouble).getOrElse(0.0)
      (t, spark.read.parquet(s"${stepDir(t)}/state"), jobAgg)
    }
  }

  private def complete(p: Path): Boolean =
    Files.exists(p.resolve("state/_SUCCESS")) && Files.exists(p.resolve("meta.json"))
}
