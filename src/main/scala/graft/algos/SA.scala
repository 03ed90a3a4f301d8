package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * Simulated advertisements, reference semantics
 * (/root/reference/src/examples/hybridgraph/examples/sa/SABSP.java:45-163,
 * initial value (verId, 1) SAUserTool.java:46-56; concat messages):
 *  - superstep 1: only the source vertex responds (broadcasts its ad id);
 *  - superstep t>1: a messaged vertex computes the most frequent incoming
 *    ad id (popularity), ties broken deterministically by MAX ad id
 *    (SABSP.findNewValue:147-155), and adopts it when the id differs from
 *    its current ad OR the popularity is strictly higher; adopting
 *    vertices respond; everyone votes to halt (stop at respond==0).
 * Uses the directed edge set with dangling self-loops (same parse rule as
 * PageRank). The fixed-K oracle must model the respond set explicitly
 * (popularity counts are not monotone, unlike min-combiners), which the
 * `resp` column does.
 */
final class SA(source: Long, maxIters: Int) extends VertexProgram {
  val name = "sa"
  private val ENC = 100000000L

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      col("vid").as("aid"), lit(1L).as("cnt"), lit(false).as("respond"))

  val msgExpr: Column = col("aid")

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.groupBy(col("vid"), col("msg")).agg(count(lit(1)).as("c"))
      .groupBy("vid").agg(max(col("c") * ENC + col("msg")).as("enc"))
      .select(col("vid"), expr(s"enc div $ENC").as("mcnt"), (col("enc") % ENC).as("maid"))

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("mcnt" -> lit(null).cast("long"), "maid" -> lit(null).cast("long"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame =
    if (superstep == 1)
      joined.select(col("vid"), col("outdeg"),
        col("vid").as("aid"), lit(1L).as("cnt"),
        (col("vid") === source).as("respond"))
    else {
      val adopt = col("maid").isNotNull &&
        (col("maid") =!= col("aid") || col("cnt") < col("mcnt"))
      joined.select(col("vid"), col("outdeg"),
        when(adopt, col("maid")).otherwise(col("aid")).as("aid"),
        when(adopt, col("mcnt")).otherwise(col("cnt")).as("cnt"),
        adopt.as("respond"))
    }

  override def vertexAggCol: Column = when(col("respond"), 1.0).otherwise(0.0)
  val updateRule: UpdateRule = MsgDepend
  val maxSupersteps: Int = maxIters
  override val maxVidBound: Option[Long] = Some(ENC)
}

object SA {
  def run(pregel: Pregel, vertices: DataFrame, prEdges: DataFrame,
          source: Long, maxIters: Int): DataFrame = {
    val (state, _) = pregel.run(new SA(source, maxIters), vertices, prEdges)
    state.select(col("vid"), col("aid"), col("cnt"))
  }

  /** Fixed-K unrolled oracle with explicit respond tracking; requires
   * `vertices`,`predges` CTEs. */
  def oracleSql(source: Long, k: Int): String = {
    val E = 100000000L
    val sb = new StringBuilder
    sb.append(
      s"a1 AS (SELECT vid, vid AS aid, CAST(1 AS BIGINT) AS cnt, (vid = $source) AS resp FROM vertices)")
    for (t <- 2 to k) {
      sb.append(s""",
        |a$t AS (
        |  SELECT s.vid,
        |         CASE WHEN m.enc IS NOT NULL AND ((m.enc % $E) <> s.aid OR s.cnt < (m.enc // $E))
        |              THEN m.enc % $E ELSE s.aid END AS aid,
        |         CASE WHEN m.enc IS NOT NULL AND ((m.enc % $E) <> s.aid OR s.cnt < (m.enc // $E))
        |              THEN m.enc // $E ELSE s.cnt END AS cnt,
        |         (m.enc IS NOT NULL AND ((m.enc % $E) <> s.aid OR s.cnt < (m.enc // $E))) AS resp
        |  FROM a${t - 1} s
        |  LEFT JOIN (
        |    SELECT dst, max(c * $E + aid) AS enc FROM (
        |      SELECT e.dst, p.aid, count(*) AS c
        |      FROM a${t - 1} p JOIN predges e ON e.src = p.vid
        |      WHERE p.resp GROUP BY e.dst, p.aid
        |    ) GROUP BY dst
        |  ) m ON m.dst = s.vid
        |)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, aid, cnt FROM a$k ORDER BY vid")
    sb.toString
  }
}
