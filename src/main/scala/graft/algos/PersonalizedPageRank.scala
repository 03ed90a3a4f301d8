package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * Personalized PageRank (random walk with restart to a single source) —
 * no reference analog; an addition in the reference's PageRank style
 * (/root/reference/src/examples/hybridgraph/examples/pagerank/
 * PageRankBSP.java:30-86), with the teleport vector concentrated on one
 * vertex instead of uniform:
 *  - superstep 1: value = 0.15 at the source, 0 elsewhere;
 *  - superstep t>1: value = 0.15*[vid==source] + 0.85 * sum(messages);
 *  - stored/messaged payload is value/outDegree exactly like PageRank
 *    (dangling vertices carry a derivation-time self-loop, outdeg >= 1);
 *  - every vertex responds every superstep; FIXED superstep count.
 *
 * Unlike global PageRank, most of the graph holds exactly 0.0 until the
 * walk frontier reaches it, so cross-engine parity is bitwise for the
 * unreached region and allclose-1e-6 (after the same N-scaling/rounding
 * as PageRank) for the reached one.
 *
 * Scale shape: identical to PageRank — usesPriorState=false, so the
 * kernel joins the inbox against the cached static vertex relation; one
 * shuffle per superstep.
 */
final class PersonalizedPageRank(source: Long, iterations: Int) extends VertexProgram {
  val name = "ppr"
  private val base = when(col("vid") === source, lit(0.15)).otherwise(lit(0.0))

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      lit(0.0).as("value"), lit(0.0).as("stored"), lit(false).as("respond"))

  val msgExpr: Column = col("stored")

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.groupBy("vid").agg(sum(col("msg")).as("magg"))

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("magg" -> lit(null).cast("double"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame = {
    val value =
      if (superstep == 1) base
      else base + lit(0.85) * coalesce(col("magg"), lit(0.0))
    joined.select(col("vid"), col("outdeg"),
      value.as("value"),
      (value / greatest(col("outdeg"), lit(1L))).as("stored"),
      lit(true).as("respond"))
  }

  override def vertexAggCol: Column = col("value")
  override def usesPriorState: Boolean = false
  val updateRule: UpdateRule = UpdateAll
  val maxSupersteps: Int = iterations
}

object PersonalizedPageRank {
  /** (vid, ppr_scaled = value * N rounded to 6dp) — the same scaling and
   * rounding contract as PageRank.scores, so the oracle compare tolerates
   * cross-engine float reduction order. */
  def scores(pregel: Pregel, vertices: DataFrame, prEdges: DataFrame,
             source: Long, n: Long, iterations: Int): DataFrame = {
    val (state, _) = pregel.run(new PersonalizedPageRank(source, iterations), vertices, prEdges)
    state.select(col("vid"), round(col("value") * lit(n.toDouble), 6).as("ppr_scaled"))
  }

  /** Unrolled-CTE DuckDB oracle body; requires `vertices` and `predges`
   * CTEs — PageRank.oracleSql with the point teleport vector. */
  def oracleSql(source: Long, iterations: Int): String = {
    def tele(vidRef: String) = s"CASE WHEN $vidRef = $source THEN 0.15 ELSE 0.0 END"
    val sb = new StringBuilder
    sb.append(
      s"""pdeg AS (SELECT src, count(*) AS d FROM predges GROUP BY src),
         |nv AS (SELECT count(*) AS n FROM vertices),
         |p1 AS (SELECT vid, ${tele("vid")} AS pr FROM vertices)""".stripMargin)
    for (t <- 2 to iterations) {
      sb.append(s""",
        |p$t AS (
        |  SELECT v.vid, ${tele("v.vid")} + 0.85*coalesce(m.s, 0.0) AS pr
        |  FROM vertices v
        |  LEFT JOIN (
        |    SELECT e.dst, sum(p.pr/dg.d) AS s
        |    FROM p${t - 1} p JOIN predges e ON e.src = p.vid JOIN pdeg dg ON dg.src = p.vid
        |    GROUP BY e.dst
        |  ) m ON m.dst = v.vid
        |)""".stripMargin)
    }
    sb.append(s"""
      |SELECT s.vid, round(s.pr * nv.n, 6) AS ppr_scaled
      |FROM p$iterations s CROSS JOIN nv ORDER BY s.vid""".stripMargin)
    sb.toString
  }
}
