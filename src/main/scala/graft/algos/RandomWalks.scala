package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic random-walk corpus generation (DeepWalk/node2vec-style
 * walk sampling) — no reference analog (HybridGraph's library stops at
 * PR/SSSP/CC/LPA/MIS/MM/SA, /root/reference/src/examples/hybridgraph/
 * examples/driver/ExampleDriver.java:26-62); this is the op a link-graph
 * engine feeding an embedding-training pipeline needs: one length-W walk
 * per vertex, emitted in long form `(walk_id, step, vid)` ready to feed a
 * skip-gram trainer.
 *
 * Transitions are PSEUDO-random and cross-engine reproducible: at step t a
 * walk at vertex v moves to the out-neighbor minimizing the lexicographic
 * pair (h, dst) where h = (A*(walk%2^31) + B*t + C*(dst%2^31)) mod M,
 * M = 2^61-1 (prime). The dst tie-break makes the argmin total even under
 * hash collisions, so the DuckDB oracle (`min({'h':…,'d':…}).d`) agrees
 * bit-for-bit with Spark's `min(struct(h, dst))`. A production deployment
 * would swap the mix for xxhash64(seed, walk, t, dst) — the plan shape is
 * identical; the linear mix exists so ANSI SQL can mirror it.
 *
 * Scale design: the walk frontier is |walks| rows. Each step is ONE
 * shuffled equi-join of the frontier against the adjacency relation
 * (persisted once, pre-partitioned on src, reused by every step) plus a
 * min-combine keyed by walk_id. All of a walk's candidate rows come from a
 * single src partition, so the partial aggregate collapses them to one row
 * per walk BEFORE the combine exchange — per step the shuffle volume is
 * O(|frontier|), never O(sum of visited out-degrees). Hub skew is absorbed
 * the same way (a hub's fan-out collapses map-side). Each step's frontier
 * is eagerly localCheckpointed: lineage stays one step deep, exactly like
 * the Pregel kernel's superstep barrier.
 */
object RandomWalks {
  // mix constants: keep every product < 2^62 so BIGINT arithmetic is exact
  // in BOTH engines (DuckDB errors on overflow rather than wrapping)
  private val A = 1000003L
  private val B = 7919L
  private val C = 998244353L
  private val M = 2305843009213693951L // 2^61 - 1
  private val R = 2147483647L          // pre-mix reduction, 2^31 - 1

  private def mix(walk: Column, step: Int, dst: Column): Column =
    (lit(A) * (walk % lit(R)) + lit(B * step) + lit(C) * (dst % lit(R))) % lit(M)

  /** One walk per vertex (walk_id = start vid), `steps` transitions over
   * `edges` (expects the PR edge set: out-edges plus self-loops for
   * dangling vertices, so no walk ever strands). Returns long-form rows
   * `(walk_id, step, vid)`, step 0 = the seed vertex. */
  def walks(vertices: DataFrame, edges: DataFrame, steps: Int,
            numPartitions: Int): DataFrame = {
    val adj = edges.select(col("src"), col("dst"))
      .repartition(numPartitions, col("src")).persist()
    var frontier = vertices
      .select(col("vid").as("walk_id"), col("vid").as("vid"))
    val outs = scala.collection.mutable.ArrayBuffer(
      frontier.select(col("walk_id"), lit(0L).as("step"), col("vid")))
    for (t <- 1 to steps) {
      frontier = frontier.join(adj, frontier("vid") === adj("src"))
        .select(col("walk_id"),
          struct(mix(col("walk_id"), t, col("dst")).as("h"), col("dst").as("d")).as("hd"))
        .groupBy("walk_id").agg(min(col("hd")).as("m"))
        .select(col("walk_id"), col("m.d").as("vid"))
        .localCheckpoint() // eager: truncates lineage, step results are materialized
      outs += frontier.select(col("walk_id"), lit(t.toLong).as("step"), col("vid"))
    }
    val res = outs.reduce(_.unionByName(_))
    adj.unpersist(blocking = false) // frontiers are checkpointed; adj no longer needed
    res
  }

  /** Unrolled oracle chain + final SELECT; requires `vertices`,`predges`
   * CTEs. Mirrors the mix arithmetic exactly (all BIGINT, mod before
   * multiply keeps every intermediate < 2^62). */
  def oracleSql(steps: Int): String = {
    val sb = new StringBuilder
    sb.append("w0 AS (SELECT vid AS walk_id, vid AS pos FROM vertices)")
    for (t <- 1 to steps) {
      sb.append(s""",
        |w$t AS (
        |  SELECT p.walk_id,
        |         (min({'h': (${A}::BIGINT * (p.walk_id % ${R}) + ${B * t} + ${C}::BIGINT * (e.dst % ${R})) % ${M},
        |               'd': e.dst})).d AS pos
        |  FROM w${t - 1} p JOIN predges e ON e.src = p.pos
        |  GROUP BY p.walk_id
        |)""".stripMargin)
    }
    val union = (0 to steps).map(t =>
      s"SELECT walk_id, CAST($t AS BIGINT) AS step, pos AS vid FROM w$t").mkString("\nUNION ALL ")
    sb.append("\n" + union + "\nORDER BY walk_id, step")
    sb.toString
  }
}
