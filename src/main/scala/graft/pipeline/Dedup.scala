package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deduplication operators over the `documents` table — the training-data
 * pipeline capability set (exact, MinHash+LSH, SimHash, n-gram Jaccard,
 * embedding cosine in Similarity.scala).
 *
 * Portability contract: every hash is an md5 hex STRING and every numeric
 * is integer arithmetic or IEEE-double division, so the DuckDB oracle
 * reproduces results bit-for-bit (no engine-specific hash functions).
 *
 * Scale notes: all shuffles key on doc_id or (band, bandHash) — LSH
 * banding is exactly the shuffle-key trick that makes near-dup detection
 * linear-ish at 100 TB (candidates only within a bucket, never all
 * pairs). Map-side partial aggregation absorbs hot shingles; the pair
 * verification join is band-bucket-local.
 */
object Dedup {

  /** (doc_id, pos, word) whitespace tokens; pos only orders within a doc. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))

  val tokensSql: String =
    """tokens AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
      |         unnest(range(1, len(string_split(text, ' '))+1)) AS pos
      |  FROM documents
      |)""".stripMargin

  /** Distinct word w-shingles per doc. Computed MAP-SIDE from the split
   * array (each window is a slice of the row's own word array) instead of
   * the previous per-doc Window+lead formulation, which cost an exchange
   * plus a per-doc sort before the distinct (r6; guide §2.4 — the shingle
   * set is a pure per-row function, no shuffle is fundamentally required
   * before the distinct). Same shingle multiset: window i of the array ==
   * (word at pos i) ++ lead(word, 1..w-1) with the null-tail rows dropped,
   * so the distinct set is identical — oracle-verified. */
  def shingles(docs: DataFrame, w: Int = 2): DataFrame =
    docs.select(col("doc_id"), expr(
      s"""explode(CASE WHEN size(split(text, ' ')) >= $w
         |  THEN transform(sequence(0, size(split(text, ' ')) - $w),
         |       i -> concat_ws(' ', slice(split(text, ' '), i + 1, $w)))
         |  ELSE array() END)""".stripMargin).as("sh"))
      .distinct()

  def shinglesSql(w: Int = 2): String = {
    val parts = (1 until w).foldLeft("word") { (acc, i) =>
      s"$acc || ' ' || lead(word,$i) OVER (PARTITION BY doc_id ORDER BY pos)"
    }
    s"""shingles AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, $parts AS sh
       |  FROM tokens QUALIFY sh IS NOT NULL
       |)""".stripMargin
  }

  /** Exact dedup: md5 content groups; canonical = min doc_id per group. */
  def exact(docs: DataFrame): DataFrame = {
    val g = docs.select(col("doc_id"), md5(col("text")).as("dup_group"))
    g.withColumn("is_canonical",
      col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("dup_group"))))
  }

  val exactSql: String =
    """WITH g AS (SELECT doc_id, md5(text) AS dup_group FROM documents)
      |SELECT doc_id, dup_group,
      |       doc_id = min(doc_id) OVER (PARTITION BY dup_group) AS is_canonical
      |FROM g ORDER BY doc_id""".stripMargin

  /** MinHash signatures: k independent permutations simulated by seeded
   * md5 ("i:" || shingle); the signature element is the lexicographic min
   * hex digest (a valid min-hash family over strings). */
  def minhashSigs(sh: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(i => min(md5(concat(lit(s"$i:"), col("sh")))).as(s"m$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  def minhashSigsSql(k: Int): String =
    s"""sigs AS MATERIALIZED (
       |  SELECT doc_id, ${(0 until k).map(i => s"min(md5('$i:' || sh)) AS m$i").mkString(", ")}
       |  FROM shingles GROUP BY doc_id
       |)""".stripMargin

  /** LSH banding: bands of `rows` signature elements; bucket key =
   * md5(concat(band elements)). Candidate pairs collide in >=1 band. */
  def lshCandidates(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandFrames = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"m$i"))
      sigs.select(col("doc_id"), lit(b).as("band"), md5(concat(cols: _*)).as("bh"))
    }
    val all = bandFrames.reduce(_ unionByName _)
    all.as("a").join(all.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b")).distinct()
  }

  def lshCandidatesSql(bands: Int, rows: Int): String = {
    val unions = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => s"m$i").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS bh FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""bands AS MATERIALIZED (
       |  $unions
       |),
       |cands AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  /** Verified Jaccard over candidate pairs. Output (a, b, jaccard). */
  def verifyJaccard(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sa = sh.select(col("doc_id").as("a"), col("sh"))
    val sb = sh.select(col("doc_id").as("b"), col("sh"))
    val common = cands.join(sa, "a").join(sb, Seq("b", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    common
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: (a, b, jaccard) above threshold. */
  def minhashLsh(docs: DataFrame, k: Int = 16, bands: Int = 4, minJaccard: Double = 0.2): DataFrame = {
    // single-action operator: repeated shingle refs reuse exchanges; a
    // cache here would outlive the query and pile up across invocations
    val sh = shingles(docs, 2)
    val cands = lshCandidates(minhashSigs(sh, k), bands, k / bands)
    verifyJaccard(cands, sh).filter(col("jaccard") >= minJaccard)
      .orderBy("a", "b")
  }

  /** CTE chain tokens -> shingles -> sigs -> cands -> sizes -> mhpairs
   * (verified pairs with jaccard), shared by the pair query and the
   * cluster composite. */
  def minhashPairCtes(k: Int = 16, bands: Int = 4, minJaccard: Double = 0.2): String =
    s"""$tokensSql,
       |${shinglesSql(2)},
       |${minhashSigsSql(k)},
       |${lshCandidatesSql(bands, k / bands)},
       |sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
       |mhpairs AS MATERIALIZED (
       |  SELECT c.a, c.b,
       |         CAST(count(*) AS DOUBLE) / (sa.n + sb.n - count(*)) AS jaccard
       |  FROM cands c
       |  JOIN shingles xa ON xa.doc_id = c.a
       |  JOIN shingles xb ON xb.doc_id = c.b AND xa.sh = xb.sh
       |  JOIN sizes sa ON sa.doc_id = c.a
       |  JOIN sizes sb ON sb.doc_id = c.b
       |  GROUP BY c.a, c.b, sa.n, sb.n
       |  HAVING CAST(count(*) AS DOUBLE) / (sa.n + sb.n - count(*)) >= $minJaccard
       |)""".stripMargin

  def minhashLshSql(k: Int = 16, bands: Int = 4, minJaccard: Double = 0.2): String =
    s"""WITH ${minhashPairCtes(k, bands, minJaccard)}
       |SELECT a, b, jaccard FROM mhpairs ORDER BY a, b""".stripMargin

  /** Duplicate-CLUSTER assignment — the composite every dedup pipeline
   * actually ships: MinHash-LSH verified pairs form an undirected graph
   * over doc_ids, connected components (the same Pregel kernel as the
   * graph algorithms, pinned to `iters` supersteps) labels each document
   * with min(doc_id) of its duplicate cluster; singletons label
   * themselves. Keeping one doc per cluster is then a trivial
   * groupBy(cluster).min(doc_id) the caller composes.
   *
   * Scale shape: the pair derivation is the bucketed LSH path (never
   * all-pairs) and the clustering inherits the kernel's one-shuffle-per-
   * superstep exchange — both pieces are the 100 TB-shaped variants. */
  def clusters(pregel: graft.pregel.Pregel, docs: DataFrame,
               k: Int = 16, bands: Int = 4, minJaccard: Double = 0.2,
               iters: Int = 8): DataFrame = {
    // same chain as minhashLsh WITHOUT its presentation orderBy — a sort
    // on the pair relation would be a wasted exchange here
    val sh = shingles(docs, 2)
    val cands = lshCandidates(minhashSigs(sh, k), bands, k / bands)
    val pairs = verifyJaccard(cands, sh)
      .filter(col("jaccard") >= minJaccard).select("a", "b")
    val verts = docs.select(col("doc_id").as("vid"))
    val uedges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    graft.algos.ConnectedComponents.labels(pregel, verts, uedges, iters)
      .select(col("vid").as("doc_id"), col("component").as("cluster"))
  }

  /** SimHash (32-bit default; any width up to 63 — sum(2^j, j<63) stays
   * inside positive BIGINT in both engines, so 63 is the portable max):
   * per-token md5 bits, majority vote per bit position, >=0 ties to 1. */
  def simhash(docs: DataFrame, bits: Int = 32): DataFrame = {
    require(bits <= 63, "bit 63 would overflow the signed-long encoding both engines share")
    val tk = tokens(docs)
    val sums = (0 until bits).map { j =>
      // hex nibble value via conv(char,16,10) == DuckDB strpos(hex,c)-1
      val v = conv(substring(col("md5w"), j / 4 + 1, 1), 16, 10).cast("long")
      val bit = shiftright(v, j % 4).bitwiseAND(1)
      sum(bit * 2 - 1).as(s"s$j")
    }
    val agg = tk.withColumn("md5w", md5(col("word")))
      .groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val sh = (0 until bits).map(j =>
      when(col(s"s$j") >= 0, lit(1L) * (1L << j)).otherwise(0L)).reduce(_ + _)
    agg.select(col("doc_id"), sh.as("simhash"))
  }

  def simhashSql(bits: Int = 32): String = {
    val sums = (0 until bits).map { j =>
      s"sum(((((strpos('0123456789abcdef', substr(md5(word), ${j / 4 + 1}, 1)) - 1) >> ${j % 4}) & 1) * 2) - 1) AS s$j"
    }.mkString(",\n    ")
    val enc = (0 until bits).map(j => s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH $tokensSql,
       |agg AS MATERIALIZED (
       |  SELECT doc_id,
       |    $sums
       |  FROM tokens GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($enc AS BIGINT) AS simhash FROM agg ORDER BY doc_id""".stripMargin
  }

  /** SimHash near-dup pairs within Hamming distance `maxHam`, via lossless
   * pigeonhole banding: the signature is split into `maxHam + 1` bands, and
   * any pair within Hamming distance maxHam differs in at most maxHam bit
   * positions, so it must agree EXACTLY on >= 1 band. Candidates therefore
   * come from an equi-join on (band, band bits) — bucket-local, no recall
   * loss, identical result set to the all-pairs formulation (which the
   * oracle keeps, since DuckDB at gate scale handles O(n^2) fine while a
   * 100 TB Spark plan cannot). Exact Hamming verification runs on the
   * candidate pairs only. Band width (bits / (maxHam+1)) sets the bucket
   * count per band — 2^8 at the 32-bit default; widen `bits` at real scale
   * (e.g. 60-bit signature -> 15-bit bands -> 32k buckets/band). */
  def simhashPairs(docs: DataFrame, bits: Int = 32, maxHam: Int = 3): DataFrame = {
    // no .cache(): the signature relation is referenced three times but the
    // whole operator is ONE action, and its references produce identical
    // aggregation subtrees that Spark's ReuseExchange collapses — a cache
    // would pin signature blocks in the session long after the query
    // (cross-invocation accumulation), for no within-query gain
    val s = simhash(docs, bits)
    val nBands = maxHam + 1
    val baseW = bits / nBands
    val rem = bits % nBands
    // band b covers [lo, lo + w): first `rem` bands get one extra bit
    val bandDefs = (0 until nBands).scanLeft((0, 0, 0)) { case ((_, lo, w), b) =>
      (b, lo + w, baseW + (if (b < rem) 1 else 0))
    }.tail
    val bandCols = bandDefs.map { case (b, lo, w) =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit((1L << w) - 1)).as("bb"))
    }
    val banded = s.select(col("doc_id"), explode(array(bandCols: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bb").as("bb"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bb") === col("y.bb") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    cands
      .join(s.select(col("doc_id").as("a"), col("simhash").as("ha")), "a")
      .join(s.select(col("doc_id").as("b"), col("simhash").as("hb")), "b")
      .select(col("a"), col("b"), bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHam)
      .orderBy("a", "b")
  }

  def simhashPairsSql(bits: Int = 32, maxHam: Int = 3): String = {
    val inner = simhashSql(bits).replace("ORDER BY doc_id", "")
    s"""WITH s AS MATERIALIZED ($inner)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHam
       |ORDER BY a, b""".stripMargin
  }

  /** Character n-gram Jaccard near-dups. The pair join is bucket-local per
   * gram, but ubiquitous grams ("the", "ing") create quadratic buckets at
   * scale; grams present in more than `maxDfFrac` of all documents are
   * dropped BEFORE sizing and intersecting (they carry no discriminating
   * signal — a gram shared by most of the corpus says nothing about any
   * one pair). The hot-gram list is tiny by construction (few grams can
   * exceed a corpus-fraction cap), so it broadcasts into an anti-join.
   * The oracle applies the identical cap. Recall effect is small but real:
   * borderline pairs move in both directions (measured at sf0.001: 2 of
   * 28 pairs drop below J=0.8, none enter; PipelineSpec asserts >= 0.9
   * pair-set overlap) — an idf-flavored trade most dedup pipelines
   * consider an improvement, not a loss. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.8,
                   maxDfFrac: Double = 0.5): DataFrame = {
    val allGrams = docs
      .select(col("doc_id"), col("text"), explode(
        when(length(col("text")) >= n, sequence(lit(1), length(col("text")) - (n - 1)))
          .otherwise(array())).as("pos"))
      .select(col("doc_id"), expr(s"substring(text, pos, $n)").as("g"))
      .distinct() // single-action operator: repeated refs reuse exchanges, no standing cache
    // driver scalar, not a 1-row crossJoin: the join form plans a (benign
    // but alarming) BroadcastNestedLoopJoin that the plan-shape spec bans
    val nd = docs.select(countDistinct(col("doc_id"))).head().getLong(0)
    val hot = allGrams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > nd * maxDfFrac).select("g")
    val grams = allGrams.join(broadcast(hot), Seq("g"), "left_anti")
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // PPJoin prefix filtering (lossless; Xiao et al., WWW'08): under a
    // global gram order (rarest first: df asc, gram asc), two docs with
    // J >= t MUST share a gram within each one's first
    // floor((1-t)*|d|) + 1 grams. Candidates therefore come from joining
    // PREFIXES only — rare grams have small buckets, so the candidate join
    // is near-linear where the full gram join is quadratic per bucket.
    // The +1e-6 nudge keeps floor() from under-sizing the prefix when
    // (1-t)*n lands just below an integer in binary floating point (a
    // too-small prefix would silently lose pairs; the oracle — still the
    // straightforward full gram join — would catch it).
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val prefix = grams.join(dfreq, "g")
      .withColumn("rn", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("rn") <= floor(lit(1.0 - minJaccard) * col("n") + 1e-6) + 1)
      .select(col("doc_id"), col("g"))
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val inter = cands
      .join(grams.select(col("doc_id").as("a"), col("g")), "a")
      .join(grams.select(col("doc_id").as("b"), col("g")), Seq("b", "g"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy("a", "b")
  }

  def ngramJaccardSql(n: Int = 3, minJaccard: Double = 0.8,
                      maxDfFrac: Double = 0.5): String =
    s"""WITH allgrams AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, substr(text, CAST(pos AS INT), $n) AS g
       |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - ${n - 2})) AS pos FROM documents)
       |),
       |hot AS MATERIALIZED (
       |  SELECT g FROM (SELECT g, count(*) AS df FROM allgrams GROUP BY g)
       |  CROSS JOIN (SELECT count(DISTINCT doc_id) AS nd FROM documents)
       |  WHERE df > nd * $maxDfFrac
       |),
       |grams AS MATERIALIZED (
       |  SELECT doc_id, g FROM allgrams WHERE g NOT IN (SELECT g FROM hot)
       |),
       |sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       |inter AS MATERIALIZED (
       |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
       |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT i.a, i.b, CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
       |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
       |WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= $minJaccard
       |ORDER BY i.a, i.b""".stripMargin
}
