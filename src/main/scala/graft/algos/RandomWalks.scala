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
 * pair (h, dst) where h is a SQUARED linear-congruential mix,
 *   s = (A*(walk%R) + B*t + C*(dst%R) [+ F*r]) % R,   h = s² % Q,
 * R = 2^31-1 and Q = 2147483629 (both prime, Q < R). The linear pass alone
 * is NOT enough: without the reduction its sum is monotone in dst (every
 * walk deterministically takes its smallest neighbor), and with only
 * LINEAR post-scrambling (multiply-mod rounds) the per-(walk,t) candidate
 * hashes form a near-rigid constellation — a shared shift never reorders
 * candidates, so selection frequencies stay lumpy. Squaring is the cheap
 * non-linearity that breaks it: (s+δ)² − s² = 2sδ + δ² makes each
 * candidate's offset depend on the walk-specific base s. Validated
 * empirically: over 10k walks × 9 candidates, selection counts are within
 * ±20% of uniform, vs 3× spreads for every linear variant tried. The dst
 * tie-break makes the argmin total even under residue collisions, so the
 * DuckDB oracle (`min({'h':…,'d':…}).d`) agrees bit-for-bit with Spark's
 * `min(struct(h, dst))`: all intermediates fit exactly in BIGINT
 * ((R−1)² < 2^63; DuckDB errors on overflow rather than wrapping, so a
 * mismatch would be loud). A production deployment would swap the mix for
 * xxhash64(seed, walk, t, dst) — the plan shape is identical; the modular
 * mix exists so ANSI SQL can mirror it exactly.
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
  // mix constants: keep every product < 2^63 so BIGINT arithmetic is exact
  // in BOTH engines (DuckDB errors on overflow rather than wrapping)
  private val A = 1000003L
  private val B = 7919L
  private val C = 998244353L
  private val F = 5779L          // replica-index term (biased walks)
  private val R = 2147483647L    // linear-residue prime, 2^31 - 1
  private val Q = 2147483629L    // post-square prime, largest prime < R

  private def mix(walk: Column, step: Int, dst: Column): Column = {
    val s = (lit(A) * (walk % lit(R)) + lit(B * step) + lit(C) * (dst % lit(R))) % lit(R)
    (s * s) % lit(Q)
  }

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

  /**
   * node2vec-style SECOND-ORDER biased walks (Grover & Leskovec 2016): the
   * transition at (prev, cur) weights each out-neighbor dst by
   *   wRet  if dst == prev            (1/p, the return parameter)
   *   wIn   if edge(prev, dst) exists (distance-1 "BFS" moves)
   *   wOut  otherwise                 (1/q, the in-out parameter)
   * with INTEGER weights so the sampling is exact and cross-engine: each
   * candidate is replicated w times (`sequence(1, w)`), every replica gets
   * an independent hash, and the walk takes the replica with the minimum
   * (h, dst). By symmetry of iid hashes, P(pick dst) = w(dst)/Σw exactly —
   * weighted sampling without any floating-point RNG the oracle could
   * disagree on. Step 1 has no prev (prev = -1), so it is uniform.
   *
   * Scale: adds one candidate-level LEFT equi-join per step (the
   * edge(prev,dst) membership probe against the same pre-partitioned
   * adjacency) and a ≤ max(w)-fold map-local replication that collapses
   * again in the same map-side min-combine; shuffle volume stays
   * O(|frontier|) per step.
   */
  def biasedWalks(vertices: DataFrame, edges: DataFrame, steps: Int,
                  wRet: Int, wIn: Int, wOut: Int, numPartitions: Int): DataFrame = {
    // replica-aware mix: r enters INSIDE the linear residue, BEFORE the
    // square, so each replica lands at an independent spot in [0, Q) —
    // added after the non-linearity it would only shift the base hash
    // rigidly and the weights would stop mattering
    def mixR(walk: Column, step: Int, dst: Column, r: Column): Column = {
      val s = (lit(A) * (walk % lit(R)) + lit(B * step) + lit(C) * (dst % lit(R)) + lit(F) * r) % lit(R)
      (s * s) % lit(Q)
    }
    // adj appears on BOTH sides of a per-step self-join (candidates +
    // membership probe): materialize it lineage-free so DeduplicateRelations
    // can't bust the cache match (one RDD referenced twice, never recomputed)
    val adj = org.apache.spark.sql.graftx.PartitionedCheckpoint.localCheckpointHashed(
      edges.select(col("src"), col("dst")).repartition(numPartitions, col("src")),
      Seq("src"), numPartitions) // stamped: plain localCheckpoint loses the
      // hash(src) layout under AQE and both per-step joins re-exchanged it
    var frontier = vertices
      .select(col("vid").as("walk_id"), lit(-1L).as("prev"), col("vid").as("cur"))
    val outs = scala.collection.mutable.ArrayBuffer(
      frontier.select(col("walk_id"), lit(0L).as("step"), col("cur").as("vid")))
    for (t <- 1 to steps) {
      val cand = frontier.join(adj, frontier("cur") === adj("src"))
        .select(col("walk_id"), col("prev"), col("cur"), col("dst"))
      // membership probe: is dst a neighbor of prev? (adj is distinct)
      val probe = adj.select(col("src").as("psrc"), col("dst").as("pdst"))
      val weighted = cand
        .join(probe, cand("prev") === probe("psrc") && cand("dst") === probe("pdst"), "left_outer")
        .select(col("walk_id"), col("cur"), col("dst"),
          when(col("dst") === col("prev"), lit(wRet))
            .when(col("psrc").isNotNull, lit(wIn))
            .otherwise(lit(wOut)).as("w"))
      frontier = weighted
        .select(col("walk_id"), col("cur"), col("dst"),
          explode(sequence(lit(1), col("w"))).as("r"))
        .select(col("walk_id"), col("cur"),
          struct(mixR(col("walk_id"), t, col("dst"), col("r")).as("h"),
            col("dst").as("d")).as("hd"))
        .groupBy("walk_id").agg(min(col("cur")).as("prev"), min(col("hd")).as("m"))
        .select(col("walk_id"), col("prev"), col("m.d").as("cur"))
        .localCheckpoint()
      outs += frontier.select(col("walk_id"), lit(t.toLong).as("step"), col("cur").as("vid"))
    }
    val res = outs.reduce(_.unionByName(_))
    graft.pregel.Pregel.unpersistCheckpointed(adj)
    res
  }

  /** Oracle for [[biasedWalks]]; requires `vertices`,`predges` CTEs. */
  def biasedOracleSql(steps: Int, wRet: Int, wIn: Int, wOut: Int): String = {
    val sb = new StringBuilder
    sb.append("n0 AS (SELECT vid AS walk_id, CAST(-1 AS BIGINT) AS prev, vid AS cur FROM vertices)")
    for (t <- 1 to steps) {
      sb.append(s""",
        |cand$t AS (
        |  SELECT f.walk_id, f.cur, e.dst,
        |         CASE WHEN e.dst = f.prev THEN $wRet
        |              WHEN ie.src IS NOT NULL THEN $wIn
        |              ELSE $wOut END AS w
        |  FROM n${t - 1} f
        |  JOIN predges e ON e.src = f.cur
        |  LEFT JOIN predges ie ON ie.src = f.prev AND ie.dst = e.dst
        |),
        |n$t AS (
        |  SELECT walk_id, min(cur) AS prev,
        |         (min({'h': (s * s) % ${Q}, 'd': dst})).d AS cur
        |  FROM (SELECT c.walk_id, c.cur, c.dst,
        |               (${A}::BIGINT * (c.walk_id % ${R}) + ${B * t} + ${C}::BIGINT * (c.dst % ${R}) + ${F} * r) % ${R} AS s
        |        FROM (SELECT c.*, unnest(range(1, w + 1)) AS r FROM cand$t c) c)
        |  GROUP BY walk_id
        |)""".stripMargin)
    }
    val union = (0 to steps).map(t =>
      s"SELECT walk_id, CAST($t AS BIGINT) AS step, cur AS vid FROM n$t").mkString("\nUNION ALL ")
    sb.append("\n" + union + "\nORDER BY walk_id, step")
    sb.toString
  }

  /**
   * Skip-gram training pairs over a walk corpus (the op that closes the
   * walks → embedding-training loop): for every walk position, emit
   * (center, context) for all contexts within `window` steps, tagged with
   * the signed offset. word2vec/DeepWalk's pair generation, expressed as
   * ONE window pass partitioned by walk_id (a single shuffle + sort) and
   * ONE explode of the 2·window per-position entries — no self-join of
   * the corpus against itself (no DeduplicateRelations hazard, no second
   * exchange), and no union of per-offset branches (a first cut unioned
   * 2·window projections over the windowed relation, which re-ran the
   * sort + WindowExec per branch: 18.6 s warm at sf0.1). Output rows
   * stream at O(|walks| · len · window).
   */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("walk_id").orderBy("step")
    val base = walks.select(Seq(col("walk_id"), col("step"), col("vid")) ++
      (1 to window).map(k => lead(col("vid"), k).over(w).as(s"_l$k")): _*)
    // forward entry at the position itself, backward entry mirrored onto
    // the context's position — a null lead = past the walk tail, dropped
    val entries = (1 to window).flatMap { k =>
      Seq(
        struct(col("step").as("step"), lit(k.toLong).as("off"),
          col("vid").as("center"), col(s"_l$k").as("context")),
        struct((col("step") + k).as("step"), lit(-k.toLong).as("off"),
          col(s"_l$k").as("center"), col("vid").as("context")))
    }
    base.select(col("walk_id"), explode(array(entries: _*)).as("p"))
      .filter(col("p.center").isNotNull && col("p.context").isNotNull)
      .select(col("walk_id"), col("p.step").as("step"), col("p.off").as("off"),
        col("p.center").as("center"), col("p.context").as("context"))
  }

  /** w0..wN chain + long-form corpus CTE `walkcorpus(walk_id, step, vid)`;
   * requires `vertices`,`predges` CTEs. Mirrors the mix arithmetic exactly
   * (all BIGINT; mod before multiply keeps every intermediate < 2^63). */
  def corpusChainSql(steps: Int): String = {
    val sb = new StringBuilder
    sb.append("w0 AS (SELECT vid AS walk_id, vid AS pos FROM vertices)")
    for (t <- 1 to steps) {
      sb.append(s""",
        |w$t AS (
        |  SELECT walk_id,
        |         (min({'h': (s * s) % ${Q}, 'd': dst})).d AS pos
        |  FROM (SELECT p.walk_id, e.dst,
        |               (${A}::BIGINT * (p.walk_id % ${R}) + ${B * t} + ${C}::BIGINT * (e.dst % ${R})) % ${R} AS s
        |        FROM w${t - 1} p JOIN predges e ON e.src = p.pos)
        |  GROUP BY walk_id
        |)""".stripMargin)
    }
    val union = (0 to steps).map(t =>
      s"SELECT walk_id, CAST($t AS BIGINT) AS step, pos AS vid FROM w$t").mkString("\nUNION ALL ")
    sb.append(",\nwalkcorpus AS (\n" + union + "\n)")
    sb.toString
  }

  /** Unrolled oracle chain + final SELECT for [[walks]]. */
  def oracleSql(steps: Int): String =
    corpusChainSql(steps) +
      "\nSELECT walk_id, step, vid FROM walkcorpus ORDER BY walk_id, step"

  /** Oracle for [[skipGramPairs]] over the [[walks]] corpus: the same
   * lead()-window construction in ANSI SQL. */
  def skipGramOracleSql(steps: Int, window: Int): String = {
    val leads = (1 to window).map(k =>
      s"lead(vid, $k) OVER (PARTITION BY walk_id ORDER BY step) AS _l$k").mkString(", ")
    val fwd = (1 to window).map(k =>
      s"SELECT walk_id, step, CAST($k AS BIGINT) AS off, vid AS center, _l$k AS context FROM sgw WHERE _l$k IS NOT NULL")
    val bwd = (1 to window).map(k =>
      s"SELECT walk_id, step + $k AS step, CAST(-$k AS BIGINT) AS off, _l$k AS center, vid AS context FROM sgw WHERE _l$k IS NOT NULL")
    corpusChainSql(steps) +
      s""",
         |sgw AS (SELECT walk_id, step, vid, $leads FROM walkcorpus)
         |${(fwd ++ bwd).mkString("\nUNION ALL ")}
         |ORDER BY walk_id, step, off""".stripMargin
  }
}
