package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Transcript table -> link graph derivation.
 *
 * Dense vertex ids: the reference requires consecutively numbered int ids
 * for its range partitioner (/root/reference/README.md:80,
 * comm/CommRouteTable.java:96-123). We mirror that with a two-level scheme
 * that needs NO global sort over turns:
 *   vid(turn) = offset(conv) + turn_idx
 * where offset(conv) is the exclusive cumulative turn count over the
 * (much smaller) per-conversation table ordered by conv_id. At 10^12 turns
 * the only global window runs over ~10^9 conversation rows; the per-turn
 * work is a broadcast-joinable map. Requires turn_idx dense 0..len-1
 * within each conversation (guaranteed by Transcripts producers).
 *
 * Edge derivation (BASELINE.json north_star: "edges induced by
 * conv_id/turn adjacency and shared tool/role links"):
 *  - ADJ:  (vid, vid+1) for consecutive turns of a conversation;
 *  - TOOL: (vid, hub(tool)) linking every tool-using turn to the first
 *    (min-vid) turn using that tool — a star per tool. Hub vertices are
 *    intentionally high-degree: the skewed keys that the engine's partial
 *    aggregation / AQE-skew-join paths must absorb.
 *
 * Directed algorithms (PageRank) additionally receive a self-loop for
 * vertices with no out-edges, exactly as the reference does at parse time
 * (/root/reference/src/examples/hybridgraph/examples/pagerank/
 * PageRankUserTool.java:42-46). Undirected algorithms (CC, LPA,
 * TriangleCount) use the symmetrized, de-duplicated, loop-free edge set.
 */
object LinkGraph {

  /** Per-conversation exclusive prefix sum of turn counts in conv_id order,
   * as a bucketed two-phase prefix sum (the RDD zipWithIndex shape):
   *
   *   1. range-partition conversations by conv_id into P ordered buckets;
   *   2. collect the P per-bucket turn totals (P rows, driver-trivial) and
   *      prefix-sum them into per-bucket base offsets, broadcast back;
   *   3. window PARTITIONED BY bucket for the intra-bucket prefix.
   *
   * off(conv) is identical to a global ordered window (prefix sums are
   * associative, so bucket boundaries don't affect the result) but no task
   * ever sees more than ~1/P of the conversations — the previous
   * implementation's unpartitioned window pulled every conversation into
   * ONE task (`WindowExec: No Partition Defined` at the root of every graph
   * derivation; a single-task sort of ~10^9 rows at north-rule scale).
   *
   * The eager localCheckpoint pins the bucket assignment: range boundaries
   * are sampled per execution, and the bucket totals (job 1) MUST see the
   * same boundaries as the window (job 2). Checkpointed blocks cannot be
   * recomputed differently. */
  def convOffsets(transcripts: DataFrame): DataFrame = {
    val spark = transcripts.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val bucketed = transcripts.groupBy(col("conv_id")).agg(count(lit(1)).as("turns"))
      .repartitionByRange(p, col("conv_id"))
      .withColumn("bucket", spark_partition_id())
      .localCheckpoint(true)
    val totals = bucketed.groupBy("bucket").agg(sum(col("turns")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val baseDf = spark.createDataFrame(bases).toDF("bucket", "base")
    val w = Window.partitionBy(col("bucket")).orderBy(col("conv_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(baseDf), "bucket")
      .select(col("conv_id"), col("turns"),
        (col("base") + coalesce(sum(col("turns")).over(w), lit(0L))).as("off"))
  }

  /** vertices(vid, conv_id, turn_idx, role, tool, turns) — dense vid. */
  def vertices(transcripts: DataFrame): DataFrame = {
    val offs = convOffsets(transcripts)
    transcripts.join(offs, "conv_id")
      .select((col("off") + col("turn_idx")).cast("long").as("vid"),
        col("conv_id"), col("turn_idx"), col("role"), col("tool"), col("turns"))
  }

  /** Directed edges (src, dst, kind). ADJ: vid -> vid+1. TOOL: member -> hub. */
  def directedEdges(verts: DataFrame): DataFrame = {
    val adj = verts.filter(col("turn_idx") < col("turns") - 1)
      .select(col("vid").as("src"), (col("vid") + 1).as("dst"), lit("adj").as("kind"))
    val hubs = verts.filter(col("tool").isNotNull)
      .groupBy(col("tool")).agg(min(col("vid")).as("hub"))
    val tool = verts.filter(col("tool").isNotNull)
      .join(hubs, "tool")
      .filter(col("vid") =!= col("hub"))
      .select(col("vid").as("src"), col("hub").as("dst"), lit("tool").as("kind"))
    adj.unionByName(tool)
  }

  /** PageRank input: distinct directed edges + self-loops for vertices with
   * no out-edges (reference dangling-vertex rule). */
  def withSelfLoops(edges: DataFrame, verts: DataFrame): DataFrame = {
    val e = edges.select("src", "dst").distinct()
    val dangling = verts.join(e.select(col("src").as("vid")).distinct(), Seq("vid"), "left_anti")
      .select(col("vid").as("src"), col("vid").as("dst"))
    e.unionByName(dangling)
  }

  /** Undirected simple graph: both directions, no self-loops, distinct. */
  def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges.select("src", "dst").filter(col("src") =!= col("dst"))
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Canonical (src < dst) undirected edge set, for triangle counting. */
  def canonical(edges: DataFrame): DataFrame =
    edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()

  // ---------------------------------------------------------------------
  // ANSI SQL counterparts (DuckDB oracle). Composable CTE fragments that
  // assume a preceding `transcripts` CTE (Transcripts.fromEventsSql).
  // ---------------------------------------------------------------------

  /** CTEs: conv_offsets, vertices. */
  val verticesSql: String =
    """conv_offsets AS (
      |  SELECT conv_id, count(*) AS turns,
      |         coalesce(sum(count(*)) OVER (ORDER BY conv_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM transcripts GROUP BY conv_id
      |),
      |vertices AS (
      |  SELECT CAST(o.off + t.turn_idx AS BIGINT) AS vid, t.conv_id, t.turn_idx, t.role, t.tool, o.turns
      |  FROM transcripts t JOIN conv_offsets o ON t.conv_id = o.conv_id
      |)""".stripMargin

  /** CTE: directed edges (src,dst,kind); requires `vertices`. */
  val directedEdgesSql: String =
    """dedges AS (
      |  SELECT vid AS src, vid + 1 AS dst, 'adj' AS kind FROM vertices WHERE turn_idx < turns - 1
      |  UNION ALL
      |  SELECT v.vid AS src, h.hub AS dst, 'tool' AS kind
      |  FROM vertices v JOIN (SELECT tool, min(vid) AS hub FROM vertices WHERE tool IS NOT NULL GROUP BY tool) h
      |    ON v.tool = h.tool
      |  WHERE v.vid <> h.hub
      |)""".stripMargin

  /** CTE: PR edges with dangling self-loops; requires `dedges`,`vertices`. */
  val prEdgesSql: String =
    """predges AS (
      |  SELECT DISTINCT src, dst FROM dedges
      |  UNION ALL
      |  SELECT vid AS src, vid AS dst FROM vertices
      |  WHERE vid NOT IN (SELECT DISTINCT src FROM dedges)
      |)""".stripMargin

  /** CTE: symmetrized undirected edges; requires `dedges`. */
  val undirectedSql: String =
    """uedges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM dedges WHERE src <> dst
      |    UNION ALL
      |    SELECT dst AS src, src AS dst FROM dedges WHERE src <> dst
      |  )
      |)""".stripMargin

  /** CTE: canonical src<dst edges; requires `dedges`. */
  val canonicalSql: String =
    """cedges AS (
      |  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
      |  FROM dedges WHERE src <> dst
      |)""".stripMargin

  /** Full prefix `WITH events AS (...parquet...), transcripts, vertices,
   * dedges` for oracle queries over a scale-factor directory. The driver
   * runs DuckDB with tables registered by name, so `events` resolves to
   * the parquet table directly. */
  val graphPrefixSql: String =
    "WITH " + Transcripts.fromEventsSql.replaceFirst("transcripts AS", "transcripts AS") +
      ",\n" + verticesSql + ",\n" + directedEdgesSql
}
