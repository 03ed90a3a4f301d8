package graft.pregel

/**
 * Dynamic (cost-based) checkpoint decision, mirroring the reference's
 * master-side rule (/root/reference/src/java/org/apache/hama/bsp/
 * JobInProgress.isCheckPoint:1022-1034 + monitor/JobMonitor
 * .isDynCheckPointRequired:120-122): a snapshot is taken only when the
 * checkpoint interval has elapsed AND recovering a failure would cost at
 * least as much as archiving — i.e. the iteration runtime accumulated
 * since the last snapshot has reached the average observed snapshot cost.
 * The first eligible boundary always checkpoints (no cost history yet,
 * averageCheckpointTime()==0), exactly like the reference.
 *
 * Pure driver-side bookkeeping: the kernel feeds it measured superstep
 * walls and snapshot costs; it never touches Spark.
 */
final class CheckpointPolicy {
  private var ckptCostTotalMs = 0.0
  private var numCkpts = 0
  private var accumulatedMs = 0.0

  /** JobMonitor.addAccumulatedRuntime analog: superstep finished. */
  def recordStep(wallMs: Long): Unit = accumulatedMs += math.max(0L, wallMs)

  /** A snapshot was archived: remember its cost, reset the recompute
   * accumulator (JobMonitor.resetAccumulatedRuntime). */
  def recordCheckpoint(costMs: Long): Unit = {
    numCkpts += 1
    ckptCostTotalMs += math.max(0L, costMs)
    accumulatedMs = 0.0
  }

  private def averageCheckpointMs: Double =
    if (numCkpts == 0) 0.0 else ckptCostTotalMs / numCkpts

  /** isDynCheckPointRequired: archive only when recompute-since-snapshot
   * has grown past the average archive cost. Call at interval boundaries
   * (the interval test is the caller's, as in isCheckPoint). */
  def required: Boolean = averageCheckpointMs <= accumulatedMs
}
