package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Transcript table construction (the engine's primary input shape, per
 * BASELINE.json input_hint):
 *   transcripts(conv_id: string, turn_idx: int, role: string,
 *               text: string, tool: string, ts: timestamp)
 *
 * Two deterministic producers:
 *  - [[fromEvents]]: derive transcripts from the driver-provided `events`
 *    parquet (event stream grouped into per-user conversations). Fully
 *    expressible in ANSI SQL so the DuckDB oracle sees identical rows.
 *  - [[synthetic]]: a seeded pure-function generator built on
 *    `spark.range` (no driver-side loops, scales to billions of turns)
 *    used by unit tests and the local[8]/local[32] scaling benchmark.
 *
 * Reference input format for comparison: one adjacency line per vertex
 * (/root/reference/README.md:75-77); we instead start from conversation
 * transcripts and derive the graph (see LinkGraph).
 */
object Transcripts {

  /** Conversation = one user's event stream ordered by (ts, event_id).
   * turn ordering is stable and dense (row_number), mirroring the
   * reference's requirement of consecutively numbered ids within a range
   * (/root/reference/README.md:80).
   */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    turnShape(events.withColumn("turn_idx", (row_number().over(w) - lit(1)).cast("int")))
  }

  /** The event->turn projection, shared verbatim between the batch
   * derivation above and the streaming ingest
   * ([[graft.streaming.EventStream]]) so both produce identical transcript
   * rows from identical (event, turn_idx) inputs. Input needs columns
   * (user_id, turn_idx, event_type, props, ts). */
  def turnShape(withTurnIdx: DataFrame): DataFrame =
    withTurnIdx.select(
      // width 20 > max BIGINT digits (19): lpad can never truncate, and
      // zero-padding keeps lexicographic conv_id order == numeric user_id
      // order (lpad TRUNCATES beyond its width — a 6-wide pad silently
      // collided user_ids >= 10^6 into one conversation).
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 20, "0")).as("conv_id"),
      col("turn_idx"),
      when(col("event_type").isin("click", "view"), lit("user"))
        .when(col("event_type") === "error", lit("tool"))
        .otherwise(lit("assistant")).as("role"),
      concat(col("event_type"), lit(" "), col("props")).as("text"),
      when(col("event_type").isin("error", "purchase", "signup"), col("event_type"))
        .otherwise(lit(null).cast("string")).as("tool"),
      col("ts")
    )

  /** Equivalent ANSI SQL (DuckDB-compatible) for [[fromEvents]], used as a
   * CTE prefix by the oracle queries. `ts` is surfaced as epoch
   * microseconds to avoid timestamp tz-encoding mismatches between engines.
   */
  def fromEventsSql: String =
    """transcripts AS (
      |  SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 20, '0')) AS conv_id,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |         CASE WHEN event_type IN ('click','view') THEN 'user'
      |              WHEN event_type = 'error' THEN 'tool'
      |              ELSE 'assistant' END AS role,
      |         concat(event_type, ' ', props) AS text,
      |         CASE WHEN event_type IN ('error','purchase','signup') THEN event_type
      |              ELSE NULL END AS tool,
      |         ts
      |  FROM events
      |)""".stripMargin

  /** Seeded deterministic synthetic transcripts: row i of `numConvs *
   * turnsPerConv` is a pure function of (seed, i). Conversation lengths are
   * skewed (a few "hub" conversations are 8x longer) and one hub tool
   * (`bash`) dominates, inducing the high-degree vertices the north rule
   * requires us to handle (salting / partial aggregation paths).
   *
   * Built on spark.range => embarrassingly parallel, no global sort, no
   * driver materialization: the generator itself would run at 10^12 turns.
   */
  def synthetic(spark: SparkSession, numConvs: Long, turnsPerConv: Int, seed: Long = 42L): DataFrame = {
    val hubEvery = 97L // every 97th conversation is a long "hub" conversation
    val base = spark.range(0, numConvs)
      .withColumn("len",
        when(col("id") % hubEvery === 0, lit(turnsPerConv * 8)).otherwise(lit(turnsPerConv)))
    val turns = base.select(col("id").as("conv"), explode(sequence(lit(0), col("len") - 1)).as("turn_idx"))
    val h = abs(hash(col("conv"), col("turn_idx"), lit(seed))) // deterministic per (conv,turn)
    turns.select(
      concat(lit("conv-"), lpad(col("conv").cast("string"), 20, "0")).as("conv_id"),
      col("turn_idx").cast("int").as("turn_idx"),
      element_at(array(lit("user"), lit("assistant"), lit("tool")), (col("turn_idx") % 3 + 1).cast("int")).as("role"),
      concat(lit("t-"), col("conv"), lit("-"), col("turn_idx"), lit("-"), h).as("text"),
      when(h % 5 === 0, lit("bash")) // hub tool: ~20% of tool turns
        .when(h % 5 === 1, element_at(array(lit("read"), lit("edit"), lit("grep"), lit("web")), (h % 4 + 1).cast("int")))
        .otherwise(lit(null).cast("string")).as("tool"),
      timestamp_micros(lit(1700000000000000L) + col("conv") * 1000000L + col("turn_idx") * 1000L).as("ts")
    )
  }
}
