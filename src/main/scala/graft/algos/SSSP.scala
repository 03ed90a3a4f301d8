package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * Single-source shortest paths, DETERMINISTIC weighted variant — the
 * reference's default SSSP draws random edge weights, only the `determ`
 * variant is reproducible (/root/reference/src/examples/hybridgraph/
 * examples/sssp/determ/SPUserToolDeterm.java:40-57, combiner=min at
 * :125-128; relax-on-smaller-message semantics as in sssp/SPBSP.java):
 *  - superstep 1: source dist = 0 and responds; all others dist = INF;
 *  - superstep t>1: adopt a smaller incoming distance, respond on change;
 *  - messages carry dist + w(edge); combiner = min; stop at respond==0.
 *
 * Edge weights are a deterministic pure function of (src,dst) so the
 * DuckDB oracle computes bit-identical doubles:
 *   w = ((src*31 + dst*17) % 97 + 1) / 10.0
 * INF is 1e300 (absorbs + w without overflow, never wins a min).
 */
final class SSSP(source: Long, maxIters: Int = 100) extends VertexProgram {
  val name = "sssp"
  private val INF = lit(1e300)

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      lit(0.0).as("dist"), lit(false).as("respond"))

  val msgExpr: Column = col("dist") + col("weight")

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.groupBy("vid").agg(min(col("msg")).as("magg"))

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("magg" -> lit(null).cast("double"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame =
    if (superstep == 1)
      joined.select(col("vid"), col("outdeg"),
        when(col("vid") === source, 0.0).otherwise(INF).as("dist"),
        (col("vid") === source).as("respond"))
    else {
      val smaller = col("magg").isNotNull && col("magg") < col("dist")
      joined.select(col("vid"), col("outdeg"),
        when(smaller, col("magg")).otherwise(col("dist")).as("dist"),
        smaller.as("respond"))
    }

  // messaged-only updates: unmessaged rows keep dist, respond=false
  override val deltaFilter: Option[Column] = Some(col("magg").isNotNull)
  val updateRule: UpdateRule = MsgDepend
  val maxSupersteps: Int = maxIters
}

object SSSP {
  /** Deterministic weight column over (src, dst). */
  def weightCol: Column =
    (((col("src") * 31 + col("dst") * 17) % 97 + 1).cast("double") / 10.0).as("weight")

  def distances(pregel: Pregel, vertices: DataFrame, undirected: DataFrame,
                source: Long, maxIters: Int = 100): DataFrame = {
    val weighted = undirected.select(col("src"), col("dst"), weightCol)
    weightedDistances(pregel, vertices, weighted, source, maxIters)
  }

  /** SSSP over an explicit (src, dst, weight) relation — e.g. the
   * reference text format via AdjacencyText.weightedEdges. */
  def weightedDistances(pregel: Pregel, vertices: DataFrame, weighted: DataFrame,
                        source: Long, maxIters: Int = 100): DataFrame = {
    val (state, _) = pregel.run(new SSSP(source, maxIters), vertices, weighted)
    state.filter(col("dist") < 1e299).select(col("vid"), col("dist"))
  }

  /** Fixed-K unrolled relax chain d1..dK + final select; requires
   * `vertices`(vid) and `wedges`(src, dst, weight) CTEs. */
  def relaxSql(source: Long, k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""d1 AS (SELECT vid, CASE WHEN vid = $source THEN 0.0 ELSE 1e300 END AS dist FROM vertices)""".stripMargin)
    for (t <- 2 to k) {
      sb.append(s""",
        |d$t AS (
        |  SELECT s.vid,
        |         CASE WHEN m.md IS NOT NULL AND m.md < s.dist THEN m.md ELSE s.dist END AS dist
        |  FROM d${t - 1} s
        |  LEFT JOIN (
        |    SELECT e.dst, min(p.dist + e.weight) AS md
        |    FROM d${t - 1} p JOIN wedges e ON e.src = p.vid
        |    WHERE p.dist < 1e299
        |    GROUP BY e.dst
        |  ) m ON m.dst = s.vid
        |)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, dist FROM d$k WHERE dist < 1e299 ORDER BY vid")
    sb.toString
  }

  /** Fixed-K oracle over the derived graph's deterministic weights;
   * requires `vertices`,`uedges` CTEs. */
  def oracleSql(source: Long, k: Int): String =
    s"""wedges AS (
       |  SELECT src, dst, CAST((src*31 + dst*17) % 97 + 1 AS DOUBLE)/10.0 AS weight FROM uedges
       |),
       |""".stripMargin + relaxSql(source, k)
}
