package graft.pregel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VBlock processing rule analog (reference
 * /root/reference/src/java/org/apache/hama/Constants.java:118-140):
 * UPDATE = process every vertex every superstep (PageRank, LPA);
 * MSG_DEPEND = process only vertices that received a message (CC, SSSP). */
sealed trait UpdateRule
case object UpdateAll extends UpdateRule
case object MsgDepend extends UpdateRule

/**
 * The vertex-centric programming surface — the Spark-native analog of the
 * reference's BSP<V,W,M,I> + UserTool contract
 * (/root/reference/src/java/org/apache/hama/myhama/api/BSPInterface.java:21-98,
 * api/UserTool.java:12-35), re-expressed as Catalyst column algebra so the
 * whole superstep stays inside whole-stage codegen (no UDFs, no RDDs).
 *
 * State schema contract: (vid: long, outdeg: long, <program value cols>,
 * respond: boolean). `respond` == the reference's setRespond(): the vertex
 * sends messages over its out-edges in the exchange that follows.
 */
trait VertexProgram {
  def name: String

  /** Initial state from vertices(vid, ...) joined with out-degrees.
   * Input frame provides (vid, outdeg). Must emit the state schema. */
  def initState(vertices: DataFrame): DataFrame

  /** Message value, evaluated over a responding sender's state row joined
   * with one out-edge (available cols: all state cols + `dst` [+ `weight`]).
   * Analog of BSPInterface.getMessages (one message per out-edge). */
  def msgExpr: Column

  /** Combine raw messages msgs(vid, msg) into inbox(vid, <agg cols>).
   * Analog of MsgRecord.combiner; Spark's partial+final hash aggregation
   * is the sender-side + receiver-side combining of the reference
   * (GraphDataServerDisk.java:901-903 / MsgDataServer.java:845-873). */
  def aggregate(msgs: DataFrame): DataFrame

  /** New state from old-state columns + nullable inbox agg columns.
   * `joined` = state LEFT OUTER JOIN inbox ON vid. Must emit state schema.
   * Analog of BSPInterface.update(context). */
  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame

  /** Per-vertex contribution to the global aggregate (reference
   * setVertexAgg -> taskAgg -> jobAgg, Context.java:122-124). Evaluated
   * over the new state. */
  def vertexAggCol: Column = lit(0.0)

  /** Inbox agg columns as null literals of the right type, used at
   * superstep 1 when no messages exist yet (keeps update() resolvable). */
  def emptyInboxCols: Seq[(String, Column)]

  /** False when update() reads only the static vertex columns
   * (vid, outdeg) plus the inbox — e.g. PageRank, whose new value is a
   * pure function of the messages. The kernel then joins the inbox with
   * the CACHED static vertex relation instead of the previous state:
   * no per-superstep state shuffle, no lineage-truncation row copies,
   * and linear (not exponential) logical-plan growth. */
  def usesPriorState: Boolean = true

  def updateRule: UpdateRule
  def maxSupersteps: Int

  /** Delta/active-set contract — the Spark analog of the reference's
   * VBlock skip rule (BSPTask.isUpdateVBlock:542-580,
   * GraphDataServer.skipBucket:436-455): Some(cond) declares that for any
   * state-join-inbox row where `cond` is FALSE, update() emits the row
   * UNCHANGED except respond=false, and vertexAggCol evaluates to 0.
   * The kernel then materializes only the rows matching `cond` each
   * superstep (a small overlay carried over the untouched base state)
   * instead of rewriting all |V| rows — the tail supersteps of
   * long-convergence algorithms (SSSP/CC) become O(|active|) writes.
   * Requirements: value columns must be non-null (NULL marks "absent" in
   * the overlay merge) and update() must be a per-row function. */
  def deltaFilter: Option[Column] = None

  /** Per-row count of vertices that must be processed every superstep
   * even without messages (MIS: the still-unknown set). Summed at the
   * barrier; the kernel stays in full-update mode while this is large. */
  def activeCol: Column = lit(0L)

  /** Extra early-stop on top of respondCount==0 (e.g. LPA's jobAgg==0,
   * LPABSP.java:69-74). jobAgg is the PREVIOUS superstep's aggregate,
   * exactly like the reference's broadcast-next-step semantics. */
  def halted(jobAgg: Double, superstep: Int): Boolean = false
}
