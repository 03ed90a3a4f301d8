package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * Maximal independent set, reference semantics
 * (/root/reference/src/examples/hybridgraph/examples/mis/MISBSP.java:36-131,
 * combiner=min MISUserTool.java:114-116; MSG_ACTIVE_DEPENDED rule).
 * Status: 0=unknown, 1=in S, 2=not in S. Two-superstep phases:
 *  - even supersteps (selection): an unknown vertex joins S when its id is
 *    <= the min incoming message (unknown neighbours broadcast their ids;
 *    vertices in NotInS broadcast MAX so they never win) or when it
 *    received no message at all; joining S broadcasts the sentinel 2;
 *  - odd supersteps (notification): any vertex not yet in NotInS that
 *    receives a message was just dominated — it enters NotInS and
 *    broadcasts MAX once; unknown vertices with no message re-broadcast
 *    their ids for the next selection round.
 * Messages are a pure function of the sender's CURRENT status:
 *   0 -> vid, 1 -> 2, 2 -> MAX  (MISBSP.getMessages:105-123).
 * Expects a symmetrized, loop-free edge set (isolated vertices select
 * themselves via the no-message rule, which subsumes the reference's
 * self-loop convention).
 */
final class MIS(maxIters: Int = 60) extends VertexProgram {
  val name = "mis"
  // Long.MaxValue (not the reference's Integer.MAX_VALUE): vids are longs
  // here, and `vid <= magg` must stay true when only dominated neighbours
  // (who broadcast the sentinel) messaged — an Int sentinel silently broke
  // selection for vid > 2^31. The oracle models statuses directly (min over
  // unknown neighbours only), so it is sentinel-free and unchanged.
  private val MAX = lit(Long.MaxValue)

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      lit(0L).as("status"), lit(false).as("respond"))

  val msgExpr: Column =
    when(col("status") === 0, col("vid"))
      .when(col("status") === 1, lit(2L))
      .otherwise(MAX)

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.groupBy("vid").agg(min(col("msg")).as("magg"))

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("magg" -> lit(null).cast("long"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame =
    if (superstep == 1)
      joined.select(col("vid"), col("outdeg"),
        lit(0L).as("status"), lit(true).as("respond"))
    else if (superstep % 2 == 0) {
      // selection: unknown v joins S when vid <= min msg or no msg arrived
      val selected = col("status") === 0 &&
        (col("magg").isNull || col("vid") <= col("magg"))
      joined.select(col("vid"), col("outdeg"),
        when(selected, 1L).otherwise(col("status")).as("status"),
        selected.as("respond"))
    } else {
      // notification: a message means a neighbour just joined S
      val dominated = col("magg").isNotNull && col("status") =!= 2
      joined.select(col("vid"), col("outdeg"),
        when(dominated, 2L).otherwise(col("status")).as("status"),
        (dominated || (col("magg").isNull && col("status") === 0)).as("respond"))
    }

  // MSG_ACTIVE_DEPENDED: besides messaged rows, every still-unknown vertex
  // is touched each superstep (no-message selection / re-broadcast rules),
  // so the active set is (status == 0) OR messaged; decided/unmessaged
  // rows are identity with respond=false in every branch above.
  override val deltaFilter: Option[Column] =
    Some(col("status") === 0 || col("magg").isNotNull)
  override val activeCol: Column = when(col("status") === 0, 1L).otherwise(0L)
  val updateRule: UpdateRule = MsgDepend
  val maxSupersteps: Int = maxIters
}

object MIS {
  def statuses(pregel: Pregel, vertices: DataFrame, undirected: DataFrame, maxIters: Int = 60): DataFrame = {
    val (state, _) = pregel.run(new MIS(maxIters), vertices, undirected)
    state.select(col("vid"), col("status").as("in_set"))
  }

  /** Fixed-K unrolled oracle on values only (provably equal to the
   * message-level delta engine at every superstep — see MIS.scala
   * Scaladoc); requires `vertices`,`uedges` CTEs. K should be even. */
  def oracleSql(k: Int): String = {
    val sb = new StringBuilder
    sb.append("m1 AS (SELECT vid, CAST(0 AS BIGINT) AS st FROM vertices)")
    for (t <- 2 to k) {
      if (t % 2 == 0)
        sb.append(s""",
          |m$t AS (
          |  SELECT s.vid,
          |         CASE WHEN s.st = 0 AND (u.mn IS NULL OR s.vid <= u.mn) THEN 1 ELSE s.st END AS st
          |  FROM m${t - 1} s
          |  LEFT JOIN (
          |    SELECT e.dst, min(p.vid) AS mn
          |    FROM m${t - 1} p JOIN uedges e ON e.src = p.vid
          |    WHERE p.st = 0 GROUP BY e.dst
          |  ) u ON u.dst = s.vid
          |)""".stripMargin)
      else
        sb.append(s""",
          |m$t AS (
          |  SELECT s.vid,
          |         CASE WHEN s.st = 0 AND d.dst IS NOT NULL THEN 2 ELSE s.st END AS st
          |  FROM m${t - 1} s
          |  LEFT JOIN (
          |    SELECT DISTINCT e.dst
          |    FROM m${t - 1} p JOIN uedges e ON e.src = p.vid
          |    WHERE p.st = 1
          |  ) d ON d.dst = s.vid
          |)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, st AS in_set FROM m$k ORDER BY vid")
    sb.toString
  }
}
