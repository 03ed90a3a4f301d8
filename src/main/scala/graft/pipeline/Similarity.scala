package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>[64], label).
 *
 * Cosine is computed in DOUBLE with a sequential left-fold
 * (`aggregate(zip_with(...))`) so the result is deterministic; outputs
 * are rounded to 6dp before any ranking/thresholding so cross-engine
 * float reduction order can never flip a comparison.
 *
 * Scale path: brute-force top-k is the correctness baseline (O(n^2));
 * [[annLsh]] buckets vectors by quantized sign bits (an SRP-LSH analog
 * with deterministic integer hyperplanes) so the pair join is
 * bucket-local — the same shuffle-key trick the dedup LSH uses.
 */
object Similarity {

  /** Deterministic double cosine ~ dot (embeddings are unit-norm, but we
   * normalize anyway). */
  def cosExpr(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0), (acc, z) => acc + z)
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    round(dot(ad, bd) / sqrt(dot(ad, ad)) / sqrt(dot(bd, bd)), 6)
  }

  val cosSqlFn: String =
    // DuckDB: list_dot_product on DOUBLE[] (same rounding shield)
    "round(list_dot_product(CAST(%A AS DOUBLE[]), CAST(%B AS DOUBLE[])) / " +
      "sqrt(list_dot_product(CAST(%A AS DOUBLE[]), CAST(%A AS DOUBLE[]))) / " +
      "sqrt(list_dot_product(CAST(%B AS DOUBLE[]), CAST(%B AS DOUBLE[]))), 6)"

  private def cosSql(a: String, b: String): String =
    cosSqlFn.replace("%A", a).replace("%B", b)

  /** Near-duplicate pairs by embedding cosine >= threshold. */
  def cosinePairs(emb: DataFrame, minCos: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), cosExpr(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy("a", "b")
  }

  def cosinePairsSql(minCos: Double): String =
    s"""SELECT a.vec_id AS a, b.vec_id AS b,
       |       ${cosSql("a.embedding", "b.embedding")} AS cos
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE ${cosSql("a.embedding", "b.embedding")} >= $minCos
       |ORDER BY a, b""".stripMargin

  /** Brute-force exact top-k cosine neighbors per vector (the baseline). */
  def annTopK(emb: DataFrame, k: Int): DataFrame = {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val w = Window.partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
    a.join(b, col("a") =!= col("b"))
      .select(col("a"), col("b"), cosExpr(col("ea"), col("eb")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("a").as("vec_id"), col("rank"), col("b").as("neighbor"), col("cos"))
      .orderBy("vec_id", "rank")
  }

  def annTopKSql(k: Int): String =
    s"""WITH scored AS MATERIALIZED (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |         ${cosSql("a.embedding", "b.embedding")} AS cos
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |),
       |ranked AS (
       |  SELECT a, b, cos, CAST(row_number() OVER (PARTITION BY a ORDER BY cos DESC, b) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT a AS vec_id, rank, b AS neighbor, cos FROM ranked WHERE rank <= $k
       |ORDER BY vec_id, rank""".stripMargin

  /** Sign-bit bucket over the first `bits` quantized dims — deterministic
   * integer LSH key both engines compute identically. */
  def bucketExpr(e: Column, bits: Int): Column =
    (0 until bits).map { d =>
      when(round(element_at(e, d + 1).cast("double") * 1000, 0) >= 0, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ + _)

  def bucketSql(e: String, bits: Int): String =
    (0 until bits).map { d =>
      s"CASE WHEN round(CAST($e[${d + 1}] AS DOUBLE) * 1000, 0) >= 0 THEN ${1L << d} ELSE 0 END"
    }.mkString(" + ")

  /** LSH-bucketed approximate top-k: neighbors only within the same
   * sign-bucket (the 100 TB-scale path; recall traded for bucket-local
   * joins). */
  def annLsh(emb: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    val withB = emb.withColumn("bkt", bucketExpr(col("embedding"), bits))
    val a = withB.select(col("vec_id").as("a"), col("embedding").as("ea"), col("bkt"))
    val b = withB.select(col("vec_id").as("b"), col("embedding").as("eb"), col("bkt"))
    val w = Window.partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
    a.join(b, Seq("bkt")).filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), cosExpr(col("ea"), col("eb")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("a").as("vec_id"), col("rank"), col("b").as("neighbor"), col("cos"))
      .orderBy("vec_id", "rank")
  }

  def annLshSql(k: Int, bits: Int = 8): String =
    s"""WITH wb AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${bucketSql("embedding", bits)} AS bkt FROM embeddings
       |),
       |scored AS MATERIALIZED (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |         ${cosSql("a.embedding", "b.embedding")} AS cos
       |  FROM wb a JOIN wb b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
       |),
       |ranked AS (
       |  SELECT a, b, cos, CAST(row_number() OVER (PARTITION BY a ORDER BY cos DESC, b) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT a AS vec_id, rank, b AS neighbor, cos FROM ranked WHERE rank <= $k
       |ORDER BY vec_id, rank""".stripMargin
}
