package graft.pregel

/** Exchange style for one superstep — the Spark translation of the
 * reference's PUSH vs b-PULL choice (SIGMOD'16 hybrid engine). */
sealed trait Style { def tag: String }
case object Push extends Style { val tag = "push" } // shuffle scatter + groupBy(dst) combine
case object Pull extends Style { val tag = "pull" } // broadcast-hash gather of respond values

sealed trait ExchangeMode
case object ForcePush extends ExchangeMode
case object ForcePull extends ExchangeMode
case object Hybrid extends ExchangeMode
/** Mini-superstep estimation (reference C17): the style is re-decided
 * EVERY superstep, pre-exchange, purely from the estimated counters of
 * the imminent exchange (JobInProgress.getNextMiniSuperStepCommand
 * :511-584) — no dead-band, no switch lock. PUSH must clear a
 * pull-biased margin (:575-581, `miniQ < -230` in the reference's
 * disk-seconds units; here MB of exchange traffic). */
case object MiniHybrid extends ExchangeMode

/**
 * Per-superstep exchange chooser, mirroring the reference's master-side
 * cost model and switching discipline
 * (/root/reference/src/java/org/apache/hama/bsp/JobInProgress.java:885-998):
 *  - Q >= 0 -> PULL, Q < 0 -> PUSH;
 *  - dead-band |Q| <= 2.0 (MB here) -> keep current style;
 *  - after a switch the style is locked for w=2 supersteps;
 *  - switching is only considered after superstep 2 and only while the
 *    respond count is decreasing (JobInProgress.java:947-966).
 *
 * Spark cost translation: PULL = broadcast the respond-value relation to
 * every executor (cost ~ respondBytes * numExecutors, plus it must fit the
 * broadcast cap); PUSH = shuffle the respond relation into the edge join
 * plus shuffle the (partially combined) messages (cost ~ respondBytes +
 * combinedMsgBytes). Catalyst/AQE makes this call per join inside ONE
 * plan; across supersteps with history it is driver logic — this class.
 */
final class CostModel(
    mode: ExchangeMode,
    numExecutors: Int,
    broadcastCapBytes: Long,
    deadBandMb: Double = 2.0,
    switchLock: Int = 2,
    miniPushMarginMb: Double = 2.0) {

  private var current: Style = Pull
  private var first = true
  private var lockedUntil: Int = 0
  private var prevRespond: Long = Long.MaxValue
  var lastQ: Double = 0.0

  /** Estimated push-minus-pull cost of the imminent exchange, in MB
   * (q >= 0 -> pull cheaper). PULL = broadcast the respond values to every
   * executor; PUSH = shuffle the respond relation + the partially-combined
   * messages. */
  private def qEstimate(respondBytes: Long, estMsgs: Long, combineRatio: Double): Double = {
    val pullCost = respondBytes.toDouble * numExecutors
    val pushCost = respondBytes.toDouble + estMsgs * 16.0 * combineRatio
    (pushCost - pullCost) / (1 << 20)
  }

  /** @param estMsgs   sum of out-degrees over responding vertices
   *  @param rowBytes  estimated bytes per respond-relation row
   *  @param combineRatio measured combined/produced message ratio (<=1) */
  def choose(superstep: Int, respondCount: Long, estMsgs: Long,
             rowBytes: Int, combineRatio: Double): Style = {
    val respondBytes = respondCount * rowBytes
    mode match {
      case ForcePush => current = Push
      case ForcePull => current = Pull
      case MiniHybrid =>
        // C17: per-superstep miniQ decision from estimated counters alone
        val q = qEstimate(respondBytes, estMsgs, combineRatio)
        lastQ = q
        current =
          if (respondBytes > broadcastCapBytes) Push // cannot broadcast
          else if (q < -miniPushMarginMb) Push // pull-biased margin
          else Pull
      case Hybrid =>
        val q = qEstimate(respondBytes, estMsgs, combineRatio)
        lastQ = q
        val decreasing = respondCount <= prevRespond
        val want =
          if (respondBytes > broadcastCapBytes) Push // hard cap: cannot broadcast
          else if (first) { // initial style from cost (dead-band keeps the Pull default), no lock
            first = false
            if (math.abs(q) <= deadBandMb) current else if (q >= 0) Pull else Push
          }
          else if (superstep <= 2 || !decreasing || superstep < lockedUntil) current
          else if (math.abs(q) <= deadBandMb) current
          else if (q >= 0) Pull
          else Push
        if (want != current && !first) lockedUntil = superstep + switchLock
        current = want
        prevRespond = respondCount
    }
    current
  }
}
