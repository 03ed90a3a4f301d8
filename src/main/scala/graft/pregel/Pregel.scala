package graft.pregel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One superstep's telemetry — the Spark analog of the reference's
 * SuperStepReport/SuperStepCommand pair (comm/SuperStepCommand.java:15-335):
 * collected at the barrier action, fed to the cost model, persisted with
 * checkpoints as the convergence-metrics lineage the north rule requires. */
case class SuperstepMetrics(
    superstep: Int,
    style: String,
    respondCount: Long,
    estMsgs: Long,
    jobAgg: Double,
    q: Double,
    activeBlocks: Int,
    numBlocks: Int,
    wallMs: Long,
    checkpointed: Boolean)

case class PregelConfig(
    numPartitions: Int = 32,
    numBlocks: Int = 256, // VBlock analog (Constants.java:84 default 5/task)
    mode: ExchangeMode = Hybrid,
    numExecutors: Int = 4, // cost-model cluster-size knob
    broadcastCapBytes: Long = 64L << 20,
    stateRowBytes: Int = 32,
    checkpointDir: Option[String] = None,
    checkpointEvery: Int = 10,
    resume: Boolean = false,
    blockPruneThreshold: Double = 0.5)

/**
 * The superstep kernel — Spark-native analog of the reference's BSP driver
 * loop (/root/reference/src/java/org/apache/hama/bsp/BSPTask.java:822-839).
 *
 * One superstep = exactly one Spark action (the metrics aggregate on the
 * persisted new state); the action IS the barrier. Message exchange is a
 * declarative plan chosen per superstep by [[CostModel]]:
 *   PUSH  -> shuffle join senders->edges, partial+final combine on dst
 *            (shuffle = the reference's push buffers/spill, C10-C11);
 *   PULL  -> broadcast-hash gather: respond values broadcast to the
 *            partitioned edge relation (b-PULL, GraphDataServerDisk
 *            .getMsg:857-944), with source-block pruning mirroring the
 *            master's pull-route matrix (JobInformation
 *            .getActualRouteTable:318-350) as a block-membership filter
 *            pushed into the edge scan.
 *
 * Scale notes: edges are hash-partitioned once on src and persisted —
 * every superstep's sender join reuses that partitioning; vertex state is
 * partitioned on vid so the inbox join co-partitions. The only per-step
 * shuffle is the message combine (unavoidable: it IS the exchange). Skewed
 * hub vertices are absorbed by map-side partial aggregation (each hub
 * receives <= numPartitions partially-combined rows, not deg(hub) rows).
 */
final class Pregel(spark: SparkSession, cfg: PregelConfig = PregelConfig()) {

  /** @param vertices (vid: long) one row per vertex
   *  @param edges    (src: long, dst: long [, weight: double]) directed
   *  @return (final state, per-superstep metrics) */
  def run(program: VertexProgram, vertices: DataFrame, edges: DataFrame): (DataFrame, Seq[SuperstepMetrics]) = {
    val p = cfg.numPartitions
    val e = edges.repartition(p, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src").as("vid")).agg(count(lit(1)).as("outdeg"))
    val maxVid = vertices.agg(max(col("vid"))).head().getLong(0)
    val blkLen = math.max(1L, (maxVid + cfg.numBlocks) / cfg.numBlocks)
    val cost = new CostModel(cfg.mode, cfg.numExecutors, cfg.broadcastCapBytes)
    val ckpt = cfg.checkpointDir.map(d => new Checkpoint(spark, d, program.name))

    val vertsWithDeg = vertices.join(deg, Seq("vid"), "left_outer")
      .withColumn("outdeg", coalesce(col("outdeg"), lit(0L)))

    val resumed = if (cfg.resume) ckpt.flatMap(_.latest()) else None
    // localCheckpoint each superstep: materializes the state AND truncates
    // the iterative logical plan (otherwise analyzer/optimizer cost and
    // driver heap grow superlinearly with superstep count).
    var state = resumed.map(_._2).getOrElse(
        program.initState(vertsWithDeg).repartition(p, col("vid")))
      .localCheckpoint(true)
    var startStep = resumed.map(_._1 + 1).getOrElse(1)
    var inbox: Option[DataFrame] = None
    if (resumed.isDefined) {
      // regenerate the inbox the checkpointed step had already sent
      val style = cost.choose(startStep, state.filter(col("respond")).count(), 0, cfg.stateRowBytes, 1.0)
      inbox = Some(program.aggregate(exchange(program, state, e, style, Nil, blkLen)))
    }

    var jobAgg = resumed.map(_._3).getOrElse(0.0)
    val metrics = scala.collection.mutable.ArrayBuffer[SuperstepMetrics]()
    var t = startStep
    var done = false
    while (!done && t <= program.maxSupersteps) {
      val t0 = System.nanoTime()
      val joined = inbox match {
        case Some(in) => state.join(in.withColumnRenamed("vid", "_mvid"),
          col("vid") === col("_mvid"), "left_outer").drop("_mvid")
        case None => program.emptyInboxCols.foldLeft(state)((df, c) => df.withColumn(c._1, c._2))
      }
      // BARRIER materialization: eager localCheckpoint is the superstep
      // sync point; it also truncates lineage (double-buffered value files
      // of the reference, GraphDataServerDisk.java:1222-1258).
      val newState = program.update(joined, t, jobAgg)
        .repartition(p, col("vid"))
        .localCheckpoint(true)

      // BARRIER: one aggregate action = the reference's superstep sync +
      // SuperStepReport (taskAgg, respond counts) in a single pass.
      val row = newState.agg(
        sum(when(col("respond"), 1L).otherwise(0L)).as("respond"),
        sum(when(col("respond"), col("outdeg")).otherwise(0L)).as("estMsgs"),
        sum(program.vertexAggCol).as("vagg")).head()
      val respondCount = Option(row.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val estMsgs = Option(row.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val newJobAgg = Option(row.get(2)).map(_.toString.toDouble).getOrElse(0.0)

      // per-block respond stats (VerBlockBeta analog): drives pull-route
      // pruning and is recorded as per-partition lineage at checkpoints.
      val blockRows = newState.filter(col("respond"))
        .groupBy(floor(col("vid") / blkLen).as("blk")).count().collect()
      val respondBlocks = blockRows.map(_.getLong(0))

      val halt = respondCount == 0L || program.halted(newJobAgg, t) || t == program.maxSupersteps
      val style = cost.choose(t, respondCount, estMsgs, cfg.stateRowBytes,
        combineRatio = math.min(1.0, (maxVid + 1).toDouble / math.max(1L, estMsgs)))

      val doCkpt = ckpt.isDefined && (t % cfg.checkpointEvery == 0 || halt)
      val wallMs = (System.nanoTime() - t0) / 1000000
      val m = SuperstepMetrics(t, style.tag, respondCount, estMsgs, newJobAgg,
        cost.lastQ, respondBlocks.length, cfg.numBlocks, wallMs, doCkpt)
      metrics += m
      var cur = newState
      if (doCkpt) cur = ckpt.get.save(newState, t, newJobAgg, metrics.toSeq)

      if (!halt) {
        val msgs = exchange(program, cur, e, style, respondBlocks.toSeq, blkLen)
        inbox = Some(program.aggregate(msgs))
      } else done = true

      state.unpersist(blocking = false)
      state = cur
      jobAgg = newJobAgg
      t += 1
    }
    e.unpersist(blocking = false)
    (state, metrics.toSeq)
  }

  /** Build the raw message relation msgs(vid, msg) for one exchange. */
  private def exchange(program: VertexProgram, state: DataFrame, e: DataFrame,
                       style: Style, respondBlocks: Seq[Long], blkLen: Long): DataFrame = {
    val senders = state.filter(col("respond")).withColumnRenamed("vid", "src")
    // pull-route pruning (C13): when few source blocks respond, push a
    // block-membership predicate into the (big) edge relation scan.
    val eSrc =
      if (respondBlocks.nonEmpty && respondBlocks.length < cfg.numBlocks * cfg.blockPruneThreshold)
        e.filter(floor(col("src") / blkLen).isin(respondBlocks: _*))
      else e
    val joined = style match {
      case Pull => eSrc.join(broadcast(senders), "src") // b-PULL: gather on edge side
      case Push => senders.join(eSrc.hint("shuffle_hash"), "src") // PUSH: scatter
    }
    joined.select(col("dst").as("vid"), program.msgExpr.as("msg"))
  }
}
