package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * k-core membership via synchronous peeling, expressed on the same
 * vertex-centric kernel as the reference algorithms (no reference analog —
 * an addition in the spirit of the reference's example suite,
 * the /root/reference/src/examples tree; the peel recurrence
 * is the standard one from Seidman's k-core definition):
 *  - superstep 1: every vertex is alive and responds (sends 1 over each
 *    out-edge of the symmetrized graph);
 *  - superstep t>1: alive := alive AND (count of messages >= k) — a
 *    message count IS the vertex's degree within the currently-alive
 *    subgraph, because only alive vertices responded at t-1;
 *  - a vertex that dies stays dead (the AND), and responds only while
 *    alive, so the message volume shrinks with the peel front.
 * Runs a FIXED number of supersteps pinned in engine and oracle; the peel
 * reaches its fixed point (the true k-core) once no vertex dies in a
 * round, after which further rounds are no-ops — so any K >= the peel
 * depth yields the exact k-core, and ANY K yields oracle parity.
 *
 * Scale shape: identical to CC/LPA — one shuffle per superstep (the
 * count-combine), message volume O(|E_alive|) shrinking monotonically.
 * UpdateAll (not delta): an alive vertex with NO incoming messages must
 * still update (its alive-degree is 0 < k), so unmessaged rows cannot be
 * skipped.
 */
final class KCore(k: Int, maxIters: Int) extends VertexProgram {
  val name = "kcore"

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      lit(true).as("alive"), lit(false).as("respond"))

  val msgExpr: Column = lit(1L)

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.groupBy("vid").agg(count(lit(1)).as("magg"))

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("magg" -> lit(null).cast("long"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame =
    if (superstep == 1)
      joined.select(col("vid"), col("outdeg"),
        lit(true).as("alive"), lit(true).as("respond"))
    else {
      val aliveNew = col("alive") && coalesce(col("magg"), lit(0L)) >= k
      joined.select(col("vid"), col("outdeg"),
        aliveNew.as("alive"), aliveNew.as("respond"))
    }

  val updateRule: UpdateRule = UpdateAll
  val maxSupersteps: Int = maxIters
}

object KCore {
  /** (vid, in_kcore 0/1) after `maxIters` pinned peel supersteps over the
   * symmetrized edge set. */
  def membership(pregel: Pregel, vertices: DataFrame, undirected: DataFrame,
                 k: Int, maxIters: Int): DataFrame = {
    val (state, _) = pregel.run(new KCore(k, maxIters), vertices, undirected)
    state.select(col("vid"), col("alive").cast("int").as("in_kcore"))
  }

  /** Fixed-K unrolled peel oracle; requires `vertices`,`uedges` CTEs.
   * a1 = all alive; a_t = alive_(t-1) AND alive-degree >= k — the exact
   * mirror of the engine's superstep chain. */
  def oracleSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append("a1 AS (SELECT vid, TRUE AS alive FROM vertices)")
    for (t <- 2 to iters) {
      sb.append(s""",
        |a$t AS (
        |  SELECT s.vid, s.alive AND coalesce(m.d, 0) >= $k AS alive
        |  FROM a${t - 1} s
        |  LEFT JOIN (
        |    SELECT e.dst, count(*) AS d
        |    FROM a${t - 1} p JOIN uedges e ON e.src = p.vid
        |    WHERE p.alive GROUP BY e.dst
        |  ) m ON m.dst = s.vid
        |)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, CAST(alive AS INTEGER) AS in_kcore FROM a$iters ORDER BY vid")
    sb.toString
  }
}
