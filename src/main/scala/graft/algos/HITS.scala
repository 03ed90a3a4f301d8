package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * HITS (hubs & authorities, Kleinberg 1999) — no reference analog; an
 * addition in the reference's PageRank style
 * (/root/reference/src/examples/hybridgraph/examples/pagerank/
 * PageRankBSP.java:30-86) for the canonical link-graph use case the
 * reference's example suite targets. Synchronous power iteration:
 *  - superstep 1: hub = auth = 1.0 everywhere;
 *  - superstep t>1: auth(v) = sum of hub_{t-1}(u) over in-edges u->v,
 *                   hub(v)  = sum of auth_{t-1}(w) over out-edges v->w;
 *  - FIXED superstep count pinned engine<->oracle; normalization is done
 *    ONCE at the end (value / global sum, scaled by N and rounded to 6dp
 *    — the PageRank cross-engine float contract), not per iteration:
 *    per-iteration normalization needs TWO global reductions per
 *    superstep while the unnormalized recurrence needs zero, and the
 *    t-step unnormalized vector equals the normalized one up to the
 *    scalar the final division removes. Doubles hold the growth: values
 *    scale like (sigma1^2)^(t/2) and even a 1e8-degree hub stays under
 *    1e65 at 16 iterations — far inside double range.
 *
 * Both directions ride ONE edge relation: the directed graph unioned
 * with its transpose, the `weight` column carrying the direction tag
 * (0 = forward: src's hub feeds dst's auth; 1 = reverse: src's auth
 * feeds dst's hub). Messages are a 2-field struct summed per field, so
 * the exchange stays a single shuffle per superstep and the sender-side
 * partial aggregation combines both fields in one pass.
 *
 * Scale shape: identical to PageRank — usesPriorState=false (the update
 * reads only the inbox), one shuffle per superstep over 2|E| messages.
 */
final class HITS(iterations: Int) extends VertexProgram {
  val name = "hits"

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      lit(1.0).as("hub"), lit(1.0).as("auth"), lit(false).as("respond"))

  val msgExpr: Column = struct(
    when(col("weight") === 0.0, col("hub")).otherwise(0.0).as("f"),
    when(col("weight") === 1.0, col("auth")).otherwise(0.0).as("b"))

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.groupBy("vid").agg(
      sum(col("msg.f")).as("fagg"), sum(col("msg.b")).as("bagg"))

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("fagg" -> lit(null).cast("double"), "bagg" -> lit(null).cast("double"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame =
    if (superstep == 1)
      joined.select(col("vid"), col("outdeg"),
        lit(1.0).as("hub"), lit(1.0).as("auth"), lit(true).as("respond"))
    else
      joined.select(col("vid"), col("outdeg"),
        coalesce(col("bagg"), lit(0.0)).as("hub"),
        coalesce(col("fagg"), lit(0.0)).as("auth"),
        lit(true).as("respond"))

  override def usesPriorState: Boolean = false
  val updateRule: UpdateRule = UpdateAll
  val maxSupersteps: Int = iterations
}

object HITS {
  /** Direction-tagged union relation from distinct directed edges:
   * forward rows (weight 0) + transposed rows (weight 1). */
  def taggedEdges(directed: DataFrame): DataFrame = {
    val e = directed.select("src", "dst").distinct()
    e.select(col("src"), col("dst"), lit(0.0).as("weight"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst"), lit(1.0).as("weight")))
  }

  /** (vid, hub_scaled, auth_scaled): end-normalized (value / global sum
   * * N, rounded 6dp — the PageRank float contract; nullif guards the
   * all-zero edgeless case identically in both engines). */
  def scores(pregel: Pregel, vertices: DataFrame, directed: DataFrame,
             n: Long, iterations: Int): DataFrame = {
    val (state, _) = pregel.run(new HITS(iterations), vertices, taggedEdges(directed))
    val sums = state.agg(sum(col("hub")).as("sh"), sum(col("auth")).as("sa"))
    state.crossJoin(broadcast(sums)).select(col("vid"),
      round(col("hub") / nullif(col("sh"), lit(0.0)) * lit(n.toDouble), 6).as("hub_scaled"),
      round(col("auth") / nullif(col("sa"), lit(0.0)) * lit(n.toDouble), 6).as("auth_scaled"))
  }

  /** Unrolled-CTE DuckDB oracle body; requires `vertices` and `dedges`
   * CTEs. Mirrors the synchronous recurrence and the end-normalization. */
  def oracleSql(iterations: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """hedges AS (SELECT DISTINCT src, dst FROM dedges),
        |h1 AS (SELECT vid, 1.0 AS hub, 1.0 AS auth FROM vertices)""".stripMargin)
    for (t <- 2 to iterations) {
      sb.append(s""",
        |h$t AS (
        |  SELECT v.vid,
        |         coalesce(hb.s, 0.0) AS hub,
        |         coalesce(au.s, 0.0) AS auth
        |  FROM h${t - 1} v
        |  LEFT JOIN (
        |    SELECT e.src AS vid, sum(p.auth) AS s
        |    FROM h${t - 1} p JOIN hedges e ON e.dst = p.vid GROUP BY e.src
        |  ) hb ON hb.vid = v.vid
        |  LEFT JOIN (
        |    SELECT e.dst AS vid, sum(p.hub) AS s
        |    FROM h${t - 1} p JOIN hedges e ON e.src = p.vid GROUP BY e.dst
        |  ) au ON au.vid = v.vid
        |)""".stripMargin)
    }
    sb.append(s"""
      |SELECT s.vid,
      |       round(s.hub / nullif(g.sh, 0.0) * g.n, 6) AS hub_scaled,
      |       round(s.auth / nullif(g.sa, 0.0) * g.n, 6) AS auth_scaled
      |FROM h$iterations s
      |CROSS JOIN (SELECT sum(hub) AS sh, sum(auth) AS sa, CAST(count(*) AS DOUBLE) AS n FROM h$iterations) g
      |ORDER BY s.vid""".stripMargin)
    sb.toString
  }
}
