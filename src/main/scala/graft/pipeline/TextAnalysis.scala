package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over `documents`: n-gram-lexicon language ID,
 * quality scoring, token counting, document fingerprinting. All pure
 * column algebra (codegen'd, no UDFs), all mirrored 1:1 in DuckDB SQL.
 */
object TextAnalysis {

  /** (lang, word) stopword lexicon — tiny, broadcast by Catalyst. */
  val lexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "a", "en" -> "in", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y", "es" -> "en",
    "fr" -> "le", "fr" -> "la", "fr" -> "de", "fr" -> "et", "fr" -> "les", "fr" -> "des",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist")

  val lexiconSql: String =
    "lexicon(lang, word) AS MATERIALIZED (SELECT * FROM (VALUES " +
      lexicon.map { case (l, w) => s"('$l','$w')" }.mkString(", ") + "))"

  /** Language ID: argmax stopword hits; ties -> lexicographically smallest
   * lang; no hits -> 'und'. */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = lexicon.toDF("lang", "word")
    val hits = Dedup.tokens(docs).join(broadcast(lex), "word")
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("hits"))
    // deterministic argmax: max hits, ties -> lexicographically smallest lang
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("hits").desc, col("lang"))
    val picked = hits.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"))
    docs.select("doc_id").join(picked, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("lang_pred"), lit("und")).as("lang_pred"))
      .orderBy("doc_id")
  }

  val langIdSql: String =
    s"""WITH ${Dedup.tokensSql},
       |$lexiconSql,
       |hits AS MATERIALIZED (
       |  SELECT t.doc_id, l.lang, count(*) AS hits
       |  FROM tokens t JOIN lexicon l ON t.word = l.word
       |  GROUP BY t.doc_id, l.lang
       |),
       |picked AS (
       |  SELECT doc_id, lang AS lang_pred
       |  FROM hits QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) = 1
       |)
       |SELECT d.doc_id, coalesce(p.lang_pred, 'und') AS lang_pred
       |FROM documents d LEFT JOIN picked p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Quality metrics: token count, mean token length, alpha ratio,
   * stopword ratio, and a composite score. Integer/IEEE-exact arithmetic;
   * score rounded to 6dp. */
  def quality(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = lexicon.map(_._2).distinct.toDF("word")
    val tk = Dedup.tokens(docs)
    val stops = tk.join(broadcast(lex), "word").groupBy("doc_id").agg(count(lit(1)).as("stop_hits"))
    val base = tk.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      sum(length(col("word"))).as("token_chars"))
    docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("alpha_chars"))
      .join(base, "doc_id")
      .join(stops, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), col("n_chars"),
        round(col("token_chars").cast("double") / col("n_tokens"), 6).as("avg_token_len"),
        round(col("alpha_chars").cast("double") / col("n_chars"), 6).as("alpha_ratio"),
        round(coalesce(col("stop_hits"), lit(0L)).cast("double") / col("n_tokens"), 6).as("stop_ratio"),
        round(col("alpha_chars").cast("double") / col("n_chars") * 0.5 +
          coalesce(col("stop_hits"), lit(0L)).cast("double") / col("n_tokens") * 0.5, 6).as("quality"))
      .orderBy("doc_id")
  }

  val qualitySql: String =
    s"""WITH ${Dedup.tokensSql},
       |$lexiconSql,
       |stops AS MATERIALIZED (
       |  SELECT t.doc_id, count(*) AS stop_hits
       |  FROM tokens t JOIN (SELECT DISTINCT word FROM lexicon) l ON t.word = l.word
       |  GROUP BY t.doc_id
       |),
       |base AS MATERIALIZED (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, sum(length(word)) AS token_chars
       |  FROM tokens GROUP BY doc_id
       |)
       |SELECT d.doc_id, b.n_tokens,
       |       CAST(length(d.text) AS BIGINT) AS n_chars,
       |       round(CAST(b.token_chars AS DOUBLE) / b.n_tokens, 6) AS avg_token_len,
       |       round(CAST(length(regexp_replace(d.text, '[^a-z]', '', 'g')) AS DOUBLE) / length(d.text), 6) AS alpha_ratio,
       |       round(CAST(coalesce(s.stop_hits, 0) AS DOUBLE) / b.n_tokens, 6) AS stop_ratio,
       |       round(CAST(length(regexp_replace(d.text, '[^a-z]', '', 'g')) AS DOUBLE) / length(d.text) * 0.5 +
       |             CAST(coalesce(s.stop_hits, 0) AS DOUBLE) / b.n_tokens * 0.5, 6) AS quality
       |FROM documents d
       |JOIN base b ON d.doc_id = b.doc_id
       |LEFT JOIN stops s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
   * (alpha runs | digit runs | single non-alnum marks). */
  private val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit(bpePattern)).cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  val tokenCountsSql: String =
    s"""SELECT doc_id,
       |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       |       CAST(len(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Document fingerprint: md5 of whitespace-normalized lowercase text
   * plus a coarse length bucket (winnowing-lite). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("fp"),
      floor(length(col("text")) / 64).cast("long").as("len_bucket")) // Column./ is double division
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |       md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fp,
      |       CAST(length(text) // 64 AS BIGINT) AS len_bucket
      |FROM documents ORDER BY doc_id""".stripMargin
}
