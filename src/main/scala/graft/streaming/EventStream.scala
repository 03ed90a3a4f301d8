package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.graph.Transcripts

/** One raw event (the driver `events` parquet schema). */
case class Event(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                 event_type: String, props: String)

/** A turn-indexed event, pre-projection (feed to Transcripts.turnShape). */
case class IndexedEvent(user_id: Long, turn_idx: Int, event_type: String,
                        props: String, ts: java.sql.Timestamp)

private case class ConvState(nextIdx: Int)

/**
 * Structured-Streaming ingest of the event stream into the engine's
 * working shapes — the continuous-arrival counterpart of
 * [[Transcripts.fromEvents]]. A 100 TB training-data pipeline ingests
 * transcripts continuously; the batch derivation's window function is
 * re-expressed here as keyed state (`flatMapGroupsWithState`) and its
 * aggregations as watermarked windowed aggregates, exactly the Spark
 * surfaces built for this (no reference analog — the reference is a
 * batch system; this is part of the Spark-first re-architecture).
 *
 * Ordering contract: within a micro-batch, a conversation's events are
 * sorted by (ts, event_id) before indexing, so any in-batch arrival
 * order is fine; ACROSS micro-batches a conversation's events must
 * arrive in (ts, event_id) order for the assigned indexes to equal the
 * batch derivation's global row_number (StreamingSpec proves equality
 * under that contract). An out-of-order producer needs an upstream
 * watermarked sort or a batch backfill — the standard streaming
 * trade-off, stated rather than hidden.
 */
object EventStream {

  val eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Event].schema

  /** File-based streaming source over a directory of events parquet
   * (streaming scans don't infer schemas; new files are picked up per
   * micro-batch). */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Incremental transcript derivation: per-conversation keyed state
   * assigns dense turn indexes as events arrive; each turn is emitted
   * exactly once (append), already in the batch transcript shape. */
  def transcripts(events: Dataset[Event]): DataFrame = {
    val indexed = events
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[Event], state: GroupState[ConvState]) =>
        val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val start = state.getOption.map(_.nextIdx).getOrElse(0)
        state.update(ConvState(start + batch.size))
        batch.iterator.zipWithIndex.map { case (e, i) =>
          IndexedEvent(uid, start + i, e.event_type, e.props, e.ts)
        }
    }(org.apache.spark.sql.Encoders.product[ConvState],
      org.apache.spark.sql.Encoders.product[IndexedEvent])
    Transcripts.turnShape(indexed.toDF())
  }

  /** Watermarked per-conversation activity: events and error count per
   * (user, tumbling window). Append-capable (windows finalize once the
   * watermark passes); the batch equivalent is the same groupBy over a
   * static frame (StreamingSpec asserts equality via Complete mode). */
  def conversationActivity(events: DataFrame,
                           windowLen: String = "1 minute",
                           lateness: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), window(col("ts"), windowLen).as("win"))
      .agg(count(lit(1)).as("events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
      .select(col("user_id"), col("win.start").as("win_start"),
        col("events"), col("errors"))
}
