package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ingest == batch derivation, on the same rows. */
class StreamingSpec extends graft.SparkTestBase {

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$m%02d:$s%02d")

  // two conversations, interleaved arrival, in-batch disorder for user 7
  private val batch1 = Seq(
    Event(3L, 7L, ts(0, 30), "view", "p1"), // in-batch disorder: later ts first
    Event(1L, 7L, ts(0, 10), "click", "p0"),
    Event(2L, 9L, ts(0, 20), "error", "boom"))
  private val batch2 = Seq(
    Event(4L, 7L, ts(1, 5), "purchase", "p2"),
    Event(5L, 9L, ts(1, 40), "signup", "p3"),
    Event(6L, 9L, ts(2, 15), "view", "p4"))

  private def batchTranscripts = {
    import spark.implicits._
    val ev = (batch1 ++ batch2).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    graft.graph.Transcripts.turnShape(
      ev.withColumn("turn_idx", (row_number().over(w) - lit(1)).cast("int")))
  }

  test("incremental transcripts (flatMapGroupsWithState) == batch derivation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.transcripts(ms.toDS())
      .writeStream.format("memory").queryName("st_turns")
      .outputMode("append").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      val stream = spark.table("st_turns")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getString(3), r.getString(4), r.getTimestamp(5))).sortBy(t => (t._1, t._2))
      val batch = batchTranscripts
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getString(3), r.getString(4), r.getTimestamp(5))).sortBy(t => (t._1, t._2))
      assert(stream.length == 6)
      assert(stream.sameElements(batch),
        s"stream=${stream.mkString(";")}\nbatch=${batch.mkString(";")}")
    } finally q.stop()
  }

  test("incremental ADJ edges == LinkGraph.directedEdges adj set (vid-mapped)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.adjEdges(ms.toDS())
      .writeStream.format("memory").queryName("st_edges")
      .outputMode("append").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      // map (conv_id, turn) -> the batch derivation's dense vid: the global
      // prefix-sum vid is a batch property; the streamed edges carry the
      // incremental (conv_id, turn) identity
      val verts = graft.graph.LinkGraph.vertices(batchTranscripts).cache()
      val vmap = verts.select(col("conv_id"), col("turn_idx"), col("vid"))
      val streamed = spark.table("st_edges")
        .join(vmap.withColumnRenamed("turn_idx", "src_turn")
          .withColumnRenamed("vid", "src"), Seq("conv_id", "src_turn"))
        .join(vmap.withColumnRenamed("turn_idx", "dst_turn")
          .withColumnRenamed("vid", "dst"), Seq("conv_id", "dst_turn"))
        .select("src", "dst", "kind")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      val batch = graft.graph.LinkGraph.directedEdges(verts)
        .filter(col("kind") === "adj")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      assert(streamed.length == 4) // 6 turns, 2 conversations -> 4 adj edges
      assert(streamed.sameElements(batch),
        s"stream=${streamed.mkString(";")}\nbatch=${batch.mkString(";")}")
      verts.unpersist(false)
    } finally q.stop()
  }

  test("watermarked conversation activity == batch windowed aggregation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.conversationActivity(ms.toDF())
      .writeStream.format("memory").queryName("st_act")
      .outputMode("complete").start()
    try {
      ms.addData(batch1 ++ batch2); q.processAllAvailable()
      val stream = spark.table("st_act")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
      val batch = (batch1 ++ batch2).toDF()
        .groupBy(col("user_id"), window(col("ts"), "1 minute").as("win"))
        .agg(count(lit(1)).as("events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
        .select(col("user_id"), col("win.start"), col("events"), col("errors"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
      assert(stream == batch, s"stream=$stream batch=$batch")
    } finally q.stop()
  }

  test("file source wiring: events(dir) streams the driver parquet schema") {
    // schema-only check (empty dir): the streaming relation must carry
    // the exact batch events schema so downstream plans line up
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val df = EventStream.events(spark, dir)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq ==
      Seq("event_id", "user_id", "ts", "event_type", "props"))
  }
}
