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
 *
 * State retention contract: by default per-conversation state (one Int)
 * never expires — on a boundless ingest whose conversation key space
 * grows forever the state store grows with it. `idleTimeout` bounds it:
 * a conversation idle longer than the timeout is evicted, and — the
 * retention trade-off, stated like the ordering one — if it then
 * RESUMES, its turn indexing restarts at 0, so choose a timeout above
 * the maximum believable conversation gap (or leave None and compact
 * via batch backfill). Caveat for `idleTimeout` queries: Spark's
 * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is
 * unconditionally true under ProcessingTimeTimeout, so the query
 * schedules a (possibly empty) micro-batch EVERY trigger to service
 * timeouts — set a real trigger interval
 * (`.trigger(Trigger.ProcessingTime(...))`); with the default
 * zero-interval trigger the query busy-loops and
 * `processAllAvailable()` never observes an idle stream. Each group's
 * micro-batch slice is buffered in memory for the sort: bounded by
 * events-per-conversation-per-trigger, not by history.
 */
object EventStream {

  val eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Event].schema

  /** File-based streaming source over a directory of events parquet
   * (streaming scans don't infer schemas; new files are picked up per
   * micro-batch). */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** The keyed-state turn indexer both derivations below share: per-
   * conversation state (the next dense index) assigns turn_idx as events
   * arrive; each turn is emitted exactly once (append). With an
   * `idleTimeout`, state for conversations idle past it is evicted (see
   * the retention contract in the class doc). */
  private[streaming] def indexed(events: Dataset[Event],
                                 idleTimeout: Option[String]): Dataset[IndexedEvent] =
    events
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState(
      OutputMode.Append,
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[Event], state: GroupState[ConvState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val start = state.getOption.map(_.nextIdx).getOrElse(0)
          state.update(ConvState(start + batch.size))
          // must be re-armed every micro-batch the group appears in
          idleTimeout.foreach(state.setTimeoutDuration)
          batch.iterator.zipWithIndex.map { case (e, i) =>
            IndexedEvent(uid, start + i, e.event_type, e.props, e.ts)
          }
        }
    }(org.apache.spark.sql.Encoders.product[ConvState],
      org.apache.spark.sql.Encoders.product[IndexedEvent])

  /** Incremental transcript derivation: the indexer above projected into
   * the batch transcript shape ([[Transcripts.turnShape]], shared
   * verbatim with the batch path). */
  def transcripts(events: Dataset[Event],
                  idleTimeout: Option[String] = None): DataFrame =
    Transcripts.turnShape(indexed(events, idleTimeout).toDF())

  /** Incremental ADJ-edge derivation — the graph itself, not just the
   * transcript table, maintained as events arrive: every indexed turn
   * i >= 1 IS the (i-1, i) turn-adjacency edge of its conversation,
   * emitted exactly once, so edge emission is a stateless projection of
   * the same keyed indexer (no second state machine to drift from it).
   * Edges are in (conv_id, turn) space: the dense vid of the batch
   * derivation is a global property (a prefix sum over ALL conversations,
   * [[graft.graph.LinkGraph.convOffsets]]) that no incremental operator
   * can know — map to vids by joining the vertex table, which is what
   * StreamingSpec does to prove row-for-row equality with
   * [[graft.graph.LinkGraph.directedEdges]]' ADJ set. TOOL-star edges
   * (min-vid hub per tool) have UPDATE semantics (a later event can
   * re-root a star) and stay a batch/backfill derivation by design. */
  def adjEdges(events: Dataset[Event],
               idleTimeout: Option[String] = None): DataFrame =
    indexed(events, idleTimeout).toDF()
      .filter(col("turn_idx") >= 1)
      .select(
        concat(lit("conv-"), lpad(col("user_id").cast("string"), 20, "0")).as("conv_id"),
        (col("turn_idx") - 1).cast("int").as("src_turn"),
        col("turn_idx").cast("int").as("dst_turn"),
        lit("adj").as("kind"))

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
