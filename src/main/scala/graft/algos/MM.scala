package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pregel._

/**
 * Random Maximal Matching over a bipartite graph (left = odd vid, right =
 * even vid), reference semantics
 * (/root/reference/src/examples/hybridgraph/examples/mm/MMBipartiteBSP.java:53-163):
 * phases of invitation -> acceptance -> confirmation -> marking, repeated
 * until a phase finds no new edge (jobAgg == 0).
 *
 * Determinism: the reference's randomSelectVert is swapped for its OWN
 * deterministic variant maxSelectVert (MMBipartiteBSP.java:217-230, "Select
 * the vertex with the biggest id. Deterministic version for testing."), so
 * the acceptance/confirmation choice is max(incoming id) — which makes the
 * selection a max-combiner and the whole algorithm oracle-checkable.
 *
 * Phase pipelining: the reference spends a 4th superstep on marking alone;
 * marking (right vertex records the confirmation) and the NEXT phase's
 * invitation (unmatched left vertices broadcast) exchange no messages with
 * each other, so this implementation fuses them into one superstep — phase
 * length 3 after the first. The matching produced is superstep-for-
 * superstep identical on the phase boundaries (the mini-superstep batching
 * idea, BSPTask.runIteration:675-711).
 *
 * Superstep schedule (t starts at 1):
 *   t = 1:          reset; unmatched LEFT respond (invite: flag = -1 means
 *                   broadcast own vid over all out-edges)
 *   t % 3 == 2:     acceptance — unmatched vertex with messages accepts
 *                   max inviter (flag = max msg) and responds TARGETED
 *                   (message goes only to dst == flag)
 *   t % 3 == 0:     confirmation — unmatched vertex with messages marks
 *                   itself matched with partner = max acceptor, responds
 *                   targeted
 *   t % 3 == 1 (>1): mark + invite — a message means the confirmation
 *                   arrived: mark matched (vertexAgg counts the new edge);
 *                   everyone unmatched resets flag; unmatched LEFT respond
 *
 * Messages always carry the sender's own vid (MMBipartiteBSP
 * .getMessages:141-177: msgValue = verId; targeted when value() != -1).
 * Expects a parity-crossing (bipartite) symmetrized edge set — the
 * EdgeParser bipartite rule (io/EdgeParser.java:51-83).
 */
final class MM(maxIters: Int) extends VertexProgram {
  val name = "mm"

  def initState(vertices: DataFrame): DataFrame =
    vertices.select(col("vid"), col("outdeg"),
      lit(false).as("matched"), lit(-1L).as("flag"),
      lit(false).as("respond"), lit(false).as("_newedge"))

  /** flag == -1: broadcast own id; else targeted to flag (the exchange
   * evaluates this per (sender, out-edge) row; nulls are dropped in the
   * aggregate — the Spark form of the reference's single-target message). */
  val msgExpr: Column =
    when(col("flag") === -1L || col("dst") === col("flag"), col("vid"))
      .otherwise(lit(null).cast("long"))

  def aggregate(msgs: DataFrame): DataFrame =
    msgs.filter(col("msg").isNotNull)
      .groupBy("vid").agg(max(col("msg")).as("mx")) // maxSelectVert combiner

  def emptyInboxCols: Seq[(String, Column)] =
    Seq("mx" -> lit(null).cast("long"))

  def update(joined: DataFrame, superstep: Int, jobAgg: Double): DataFrame =
    if (superstep == 1)
      joined.select(col("vid"), col("outdeg"),
        lit(false).as("matched"), lit(-1L).as("flag"),
        (col("vid") % 2 === 1).as("respond"), lit(false).as("_newedge"))
    else if (superstep % 3 == 2) { // acceptance
      val accept = !col("matched") && col("mx").isNotNull
      joined.select(col("vid"), col("outdeg"), col("matched"),
        when(accept, col("mx")).otherwise(col("flag")).as("flag"),
        accept.as("respond"), lit(false).as("_newedge"))
    } else if (superstep % 3 == 0) { // confirmation
      val confirm = !col("matched") && col("mx").isNotNull
      joined.select(col("vid"), col("outdeg"),
        (col("matched") || confirm).as("matched"),
        when(confirm, col("mx")).otherwise(col("flag")).as("flag"),
        confirm.as("respond"), lit(false).as("_newedge"))
    } else { // mark + next phase's invitation
      val mark = !col("matched") && col("mx").isNotNull
      val nowMatched = col("matched") || mark
      joined.select(col("vid"), col("outdeg"),
        nowMatched.as("matched"),
        when(nowMatched, col("flag")).otherwise(lit(-1L)).as("flag"),
        (!nowMatched && col("vid") % 2 === 1).as("respond"),
        mark.as("_newedge"))
    }

  override def vertexAggCol: Column = when(col("_newedge"), 1.0).otherwise(0.0)

  /** Reference convergence rule (MMBipartiteBSP.java:96-103): when a full
   * phase finds no new edge, stop. jobAgg here is the new-edge count of the
   * mark superstep that just ran. */
  override def halted(jobAgg: Double, superstep: Int): Boolean =
    superstep > 1 && superstep % 3 == 1 && jobAgg == 0.0

  val updateRule: UpdateRule = MsgDepend
  val maxSupersteps: Int = maxIters
}

object MM {
  /** (vid, matched, partner): partner is flag for matched vertices (odd
   * side: the confirmed acceptor; even side: the odd it accepted — set
   * before its confirmation arrived), null otherwise. Symmetric by
   * construction. `bipartite` must be a parity-crossing symmetrized edge
   * set. K should be == 1 (mod 3) so both engines stop on a phase boundary. */
  def matching(pregel: Pregel, vertices: DataFrame, bipartite: DataFrame, maxIters: Int): DataFrame = {
    val (state, _) = pregel.run(new MM(maxIters), vertices, bipartite)
    state.select(col("vid"), col("matched"),
      when(col("matched"), col("flag")).otherwise(lit(null).cast("long")).as("partner"))
  }

  /** Fixed-K unrolled oracle with explicit respond + targeted-message
   * tracking; requires `vertices`,`uedges` CTEs (the bipartite filter is
   * applied here). */
  def oracleSql(k: Int): String = {
    require(k % 3 == 1, "stop on a phase boundary (mark superstep)")
    val sb = new StringBuilder
    sb.append(
      """bedges AS (SELECT src, dst FROM uedges WHERE src % 2 <> dst % 2),
        |mm1 AS (SELECT vid, false AS matched, CAST(-1 AS BIGINT) AS flag, (vid % 2 = 1) AS resp FROM vertices)""".stripMargin)
    for (t <- 2 to k) {
      val inbox =
        s"""LEFT JOIN (
           |    SELECT e.dst, max(p.vid) AS mx
           |    FROM mm${t - 1} p JOIN bedges e ON e.src = p.vid AND (p.flag = -1 OR e.dst = p.flag)
           |    WHERE p.resp GROUP BY e.dst
           |  ) m ON m.dst = s.vid""".stripMargin
      if (t % 3 == 2)
        sb.append(s""",
          |mm$t AS (
          |  SELECT s.vid, s.matched,
          |         CASE WHEN NOT s.matched AND m.mx IS NOT NULL THEN m.mx ELSE s.flag END AS flag,
          |         (NOT s.matched AND m.mx IS NOT NULL) AS resp
          |  FROM mm${t - 1} s
          |  $inbox
          |)""".stripMargin)
      else if (t % 3 == 0)
        sb.append(s""",
          |mm$t AS (
          |  SELECT s.vid,
          |         (s.matched OR m.mx IS NOT NULL) AS matched,
          |         CASE WHEN NOT s.matched AND m.mx IS NOT NULL THEN m.mx ELSE s.flag END AS flag,
          |         (NOT s.matched AND m.mx IS NOT NULL) AS resp
          |  FROM mm${t - 1} s
          |  $inbox
          |)""".stripMargin)
      else
        sb.append(s""",
          |mm$t AS (
          |  SELECT s.vid,
          |         (s.matched OR m.mx IS NOT NULL) AS matched,
          |         CASE WHEN s.matched OR m.mx IS NOT NULL THEN s.flag ELSE CAST(-1 AS BIGINT) END AS flag,
          |         (NOT (s.matched OR m.mx IS NOT NULL) AND s.vid % 2 = 1) AS resp
          |  FROM mm${t - 1} s
          |  $inbox
          |)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT vid, matched, CASE WHEN matched THEN flag ELSE NULL END AS partner
         |FROM mm$k ORDER BY vid""".stripMargin)
    sb.toString
  }
}
