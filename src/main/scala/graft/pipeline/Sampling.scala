package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a training-data pipeline runs after dedup:
 * deterministic stratified (quota) sampling for data mixing, and global
 * vocabulary top-K (corpus token statistics). Pure column algebra, both
 * mirrored 1:1 in DuckDB.
 */
object Sampling {

  /**
   * Deterministic per-stratum quota sample: the q docs per `source` with
   * the smallest (md5(doc_id), doc_id) priority — a reproducible uniform
   * sample (md5 is a fixed pseudo-random permutation of doc ids shared by
   * both engines), the primitive behind "mix s1 : s2 : … at these ratios".
   *
   * Scale: a naive per-stratum window puts a WHOLE stratum in one task —
   * the 100 TB failure mode when a corpus has few, huge sources. This is
   * the classic two-level top-k instead: partial top-q per (source, salt)
   * bucket (each bucket a fraction of the stratum), then the final
   * window ranks only the ≤ salts·q survivors per source. The salt never
   * affects the result — each bucket's local top-q is a superset of its
   * members of the global top-q — so the oracle is a plain one-level
   * QUALIFY over the same ordering.
   */
  def stratified(docs: DataFrame, q: Int, salts: Int = 8): DataFrame = {
    val pr = md5(col("doc_id").cast("string"))
    val partial = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(salts.toLong)))
      .orderBy(pr, col("doc_id"))
    val total = Window.partitionBy(col("source")).orderBy(pr, col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("prn", row_number().over(partial)).filter(col("prn") <= q).drop("prn")
      .withColumn("rk", row_number().over(total).cast("long")).filter(col("rk") <= q)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("doc_id")
  }

  def stratifiedSql(q: Int): String =
    s"""SELECT doc_id, source, rk FROM (
       |  SELECT doc_id, source,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
       |  FROM documents
       |) WHERE rk <= $q ORDER BY doc_id""".stripMargin

  /**
   * Global top-k vocabulary by token frequency (ties → lexicographically
   * smallest token). Whitespace tokenization shared with [[Dedup.tokens]].
   *
   * Scale: the frequency aggregate is partial-agg'd (map-side combine per
   * token), and the top-k is Spark's TakeOrderedAndProject — O(k) state
   * per partition, no global sort. The rank window runs on k rows.
   */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame = {
    val counts = Dedup.tokens(docs).filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("word")).limit(k)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("cnt").desc, col("word"))).cast("long"))
      .select(col("rnk"), col("word"), col("cnt"))
  }

  def vocabTopKSql(k: Int): String =
    s"""WITH ${Dedup.tokensSql},
       |counts AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM tokens WHERE length(word) > 0 GROUP BY word
       |)
       |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rnk, word, cnt
       |FROM counts ORDER BY cnt DESC, word LIMIT $k""".stripMargin
}
