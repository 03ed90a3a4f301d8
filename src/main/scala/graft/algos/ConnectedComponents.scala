package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * HCC connected components, reference semantics
 * (/root/reference/src/examples/hybridgraph/examples/cc/CCBSP.java:33-70,
 * combiner=min CCUserTool.java:107-112; PEGASUS-style min-label
 * propagation):
 *  - superstep 1: label = own vid, respond (broadcast to neighbors);
 *  - superstep t>1: adopt the min incoming label when smaller than the
 *    current one, responding only on change (delta propagation);
 *  - vertices vote to halt every step and are revived by messages —
 *    in engine terms: stop when respondCount == 0.
 * Expects a symmetrized edge set (the reference expects undirected input,
 * CCBSP.java note "a non-weighted undirected graph").
 *
 * Delta propagation (only changed vertices send) yields the identical
 * per-superstep state as the full formula
 * label_t(v) = min(label_{t-1}(v), min_{u in N(v)} label_{t-1}(u)),
 * because an unchanged neighbor's label was already incorporated the step
 * it last changed — which is what makes the fixed-K SQL oracle exact.
 */
final class ConnectedComponents(maxIters: Int = 100) extends VertexProgram {
  val name = "cc"

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      col("vid").as("label"), lit(false).as("respond"))

  val msgExpr: Column = col("label")

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.groupBy("vid").agg(min(col("msg")).as("magg"))

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("magg" -> lit(null).cast("long"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame =
    if (superstep == 1)
      joined.select(col("vid"), col("outdeg"),
        col("vid").as("label"), lit(true).as("respond"))
    else {
      val smaller = col("magg").isNotNull && col("magg") < col("label")
      joined.select(col("vid"), col("outdeg"),
        when(smaller, col("magg")).otherwise(col("label")).as("label"),
        smaller.as("respond"))
    }

  // messaged-only updates: unmessaged rows keep label, respond=false
  override val deltaFilter: Option[Column] = Some(col("magg").isNotNull)
  val updateRule: UpdateRule = MsgDepend
  val maxSupersteps: Int = maxIters
}

object ConnectedComponents {
  def labels(pregel: Pregel, vertices: DataFrame, undirected: DataFrame, maxIters: Int = 100): DataFrame = {
    val (state, _) = pregel.run(new ConnectedComponents(maxIters), vertices, undirected)
    state.select(col("vid"), col("label").as("component"))
  }

  /** Fixed-K unrolled min-label oracle; requires `vertices`,`uedges` CTEs.
   * K must be >= the propagation radius of the graph (asserted in tests). */
  def oracleSql(k: Int): String =
    oracleChainSql(k) + s"\nSELECT vid, lbl AS component FROM c$k ORDER BY vid"

  /** The c1..cK CTE chain alone (no final SELECT) — for composites that
   * relabel or join the converged component (e.g. dedup clustering). */
  def oracleChainSql(k: Int): String = {
    val sb = new StringBuilder
    sb.append("c1 AS (SELECT vid, vid AS lbl FROM vertices)")
    for (t <- 2 to k) {
      sb.append(s""",
        |c$t AS (
        |  SELECT s.vid,
        |         CASE WHEN m.ml IS NOT NULL AND m.ml < s.lbl THEN m.ml ELSE s.lbl END AS lbl
        |  FROM c${t - 1} s
        |  LEFT JOIN (
        |    SELECT e.dst, min(p.lbl) AS ml
        |    FROM c${t - 1} p JOIN uedges e ON e.src = p.vid GROUP BY e.dst
        |  ) m ON m.dst = s.vid
        |)""".stripMargin)
    }
    sb.toString
  }
}
