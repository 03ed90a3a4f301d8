package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * BINARY columns with typed metadata, and run decode / feature-extract /
 * frame-sample stages as distributed per-partition batch transforms.
 *
 * The actual codec is STUBBED (no image/audio libraries ship in this
 * container): [[FakeCodec.decode]] is a deterministic fake that derives
 * "decoded" dimensions/features from the bytes themselves. Everything
 * Spark-side — schema, binary handling, partitioning, batch shape,
 * mapPartitions plumbing — is real and tested; swap `FakeCodec` for a
 * real JNI/ffmpeg codec binding at deployment.
 */
object Multimodal {

  /** Synthesize an opaque binary payload column + modality kind from the
   * documents table (no binary test fixture ships; UTF-8 bytes stand in
   * for media bytes). Fully mirrored in the DuckDB oracle. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"))

  /** Metadata extraction — pure column algebra (codegen'd): byte length,
   * content hash, head sample. Oracle-comparable. */
  def meta(docs: DataFrame): DataFrame = {
    // Spark's base64 chunks at 76 chars (MIME); strip to match DuckDB's
    // unchunked RFC 4648 output before hashing.
    val b64 = regexp_replace(base64(col("payload")), "[\\r\\n]", "")
    assets(docs).select(col("doc_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(b64).as("content_hash"),
      substring(b64, 1, 24).as("head_b64"))
      .orderBy("doc_id")
  }

  val metaSql: String =
    """WITH assets AS MATERIALIZED (
      |  SELECT doc_id, encode(text) AS payload,
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
      |  FROM documents
      |)
      |SELECT doc_id, kind,
      |       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      |       md5(base64(payload)) AS content_hash,
      |       substr(base64(payload), 1, 24) AS head_b64
      |FROM assets ORDER BY doc_id""".stripMargin

  /** Deterministic stand-in for a real media codec. */
  object FakeCodec {
    /** ??? in spirit — a real deployment binds ffmpeg/libvips here. The
     * fake derives stable pseudo-dimensions and a tiny feature vector
     * from md5(base64(payload)) — chosen over a JVM hash so the DuckDB
     * oracle reproduces the SAME values and the whole mapPartitions
     * pipeline (schema, batching, row mapping) is correctness-GATED, not
     * just spec-tested. Features stay DOUBLE end-to-end: a float32
     * narrowing changes the 6dp rounding for 3 of the 256 possible values
     * (checked exhaustively), which the exact-hash gate would catch. */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Double]) = {
      val b64 = java.util.Base64.getEncoder.encodeToString(payload) // RFC 4648, unchunked
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(b64.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      def hv(pos: Int, len: Int): Long = java.lang.Long.parseLong(hex.substring(pos, pos + len), 16)
      val width = (hv(0, 6) % 1920 + 16).toInt
      val height = (hv(6, 6) % 1080 + 16).toInt
      val features = Array.tabulate(8)(i => hv(12 + 2 * i, 2).toDouble / 255.0)
      (width, height, features)
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType)),
    StructField("frames_sampled", IntegerType)))

  /** Decode + feature-extract + frame-sample over binary payloads as a
   * per-partition batch transform (the Scala analog of mapInPandas: one
   * iterator of rows per partition, batch-friendly, no driver collect).
   * Partitioning: payloads hash-partition on doc_id upstream; codec state
   * is per-partition (one FakeCodec init per task, not per row). */
  def decodeFeatures(docs: DataFrame, frameStride: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    assets(docs).select("doc_id", "kind", "payload").mapPartitions { rows =>
      // per-partition codec init happens here (stubbed)
      rows.map { r =>
        val (w, h, feats) = FakeCodec.decode(r.getString(1), r.getAs[Array[Byte]](2))
        val frames = if (r.getString(1) == "video") (r.getAs[Array[Byte]](2).length / frameStride).max(1) else 1
        Row(r.getLong(0), r.getString(1), w, h, feats.toSeq, frames)
      }
    }(enc)
  }

  /** Gate-shaped projection of [[decodeFeatures]]: the array column is
   * flattened to scalar f0..f7 (cross-engine CSV rendering of arrays
   * differs; scalars hash identically) and floats are compared as
   * 6dp-rounded doubles. */
  def decodeFeaturesFlat(docs: DataFrame, frameStride: Int = 4): DataFrame = {
    val feats = (0 until 8).map(i =>
      round(element_at(col("features"), i + 1).cast("double"), 6).as(s"f$i"))
    decodeFeatures(docs, frameStride)
      .select(Seq(col("doc_id"), col("kind"), col("width"), col("height"),
        col("frames_sampled")) ++ feats: _*)
      .orderBy("doc_id")
  }

  /** DuckDB mirror of the fake codec: the same md5(base64(payload)) hex
   * maths, hex parsed with a nibble polynomial. */
  def decodeFeaturesSql(frameStride: Int = 4): String = {
    def hv(pos: Int, len: Int): String =
      (0 until len).map(k =>
        s"(strpos('0123456789abcdef', substr(h, ${pos + 1 + k}, 1)) - 1) * ${math.pow(16, len - 1 - k).toLong}")
        .mkString("(", " + ", ")")
    val feats = (0 until 8).map(i =>
      s"round(CAST(${hv(12 + 2 * i, 2)} AS DOUBLE) / 255.0, 6) AS f$i").mkString(",\n       ")
    s"""WITH assets AS MATERIALIZED (
       |  SELECT doc_id, encode(text) AS payload,
       |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
       |  FROM documents
       |),
       |hashed AS MATERIALIZED (
       |  SELECT doc_id, kind, payload, md5(base64(payload)) AS h FROM assets
       |)
       |SELECT doc_id, kind,
       |       CAST(${hv(0, 6)} % 1920 + 16 AS INT) AS width,
       |       CAST(${hv(6, 6)} % 1080 + 16 AS INT) AS height,
       |       CAST(CASE WHEN kind = 'video' THEN greatest(octet_length(payload) // $frameStride, 1) ELSE 1 END AS INT) AS frames_sampled,
       |       $feats
       |FROM hashed ORDER BY doc_id""".stripMargin
  }
}
