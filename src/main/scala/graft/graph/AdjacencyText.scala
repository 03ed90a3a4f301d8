package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Reader for the reference's documented text input formats
 * (/root/reference/README.md:75-77; parser io/EdgeParser.java:134-200),
 * so existing HybridGraph datasets load directly:
 *
 *   unweighted:  srcId \t dst1:dst2:...
 *   weighted:    srcId \t dst1:w1:dst2:w2:...   (EdgeParser.parseEdgeIdWeightArray)
 *
 * Vertices with no out-edges get a self-loop, exactly like the reference's
 * parse rule (PageRankUserTool.java:42-46); the weighted variant gives the
 * self-loop weight 0.1, following the evident intent of the reference's
 * dangling-vertex branch (SPUserToolDeterm.parseGraphData:45-52 — its
 * executed first branch leaves weights null, a latent bug; the 0.1
 * convention is applied identically in engine and oracle). All pure
 * column expressions — the scan stays in whole-stage codegen and the text
 * file splits parallelize like any Spark text source.
 */
object AdjacencyText {

  /** (src: long, dst: long) directed edges, dangling self-loops included. */
  def edges(spark: SparkSession, path: String): DataFrame = {
    val lines = parsed(spark, path)
    lines.select(col("src"),
        explode(when(size(col("parts")) > 0, col("parts")).otherwise(array(col("src").cast("string")))).as("d"))
      .select(col("src"), col("d").cast("long").as("dst"))
  }

  /** (src, dst, weight) for the id:w:id:w variant. A line with fewer than
   * 2 fields after the tab has no complete (dst, weight) pair — it is
   * treated like a dangling vertex (self-loop, weight 0.1) instead of
   * crashing the job (sequence(0, -1) would yield index 0 and element_at
   * throws on it). A trailing unpaired field is ignored. */
  def weightedEdges(spark: SparkSession, path: String): DataFrame = {
    val lines = parsed(spark, path)
    val pairs = lines.select(col("src"),
      when(size(col("parts")) >= 2,
        transform(sequence(lit(0), (expr("size(parts) div 2") - 1).cast("int")),
          i => struct(
            element_at(col("parts"), i * 2 + 1).cast("long").as("dst"),
            element_at(col("parts"), i * 2 + 2).cast("double").as("weight"))))
        .otherwise(array(struct(col("src").as("dst"), lit(0.1).as("weight")))).as("es"))
    pairs.select(col("src"), explode(col("es")).as("e"))
      .select(col("src"), col("e.dst"), col("e.weight"))
  }

  /** Bipartite filter: drop same-parity endpoints
   * (EdgeParser.java:51-83 keeps only edges crossing odd/even sides). */
  def bipartite(edges: DataFrame): DataFrame =
    edges.filter(col("src") % 2 =!= col("dst") % 2)

  /** DuckDB CTEs parsing the same weighted text file: `vertices`(vid) and
   * `wedges`(src, dst, weight) — the mirror of [[weightedEdges]] so the
   * reference text format is correctness-gated end-to-end, not just
   * spec-tested. */
  def weightedOracleCtes(path: String): String =
    s"""raw AS MATERIALIZED (
       |  SELECT * FROM read_csv('$path', delim='\\t', header=false,
       |    columns={'src':'BIGINT','rest':'VARCHAR'}, null_padding=true, auto_detect=false, quote='')
       |),
       |vertices AS MATERIALIZED (SELECT DISTINCT src AS vid FROM raw),
       |parsedw AS MATERIALIZED (
       |  SELECT src, string_split(rest, ':') AS parts FROM raw
       |  WHERE rest IS NOT NULL AND len(string_split(rest, ':')) >= 2
       |),
       |wedges AS MATERIALIZED (
       |  SELECT src, CAST(parts[2*i-1] AS BIGINT) AS dst, CAST(parts[2*i] AS DOUBLE) AS weight
       |  FROM (SELECT src, parts, unnest(range(1, len(parts)//2 + 1)) AS i FROM parsedw)
       |  UNION ALL
       |  SELECT src, src AS dst, 0.1 AS weight FROM raw
       |  WHERE rest IS NULL OR len(string_split(rest, ':')) < 2
       |)""".stripMargin

  /** DuckDB CTEs parsing the same unweighted text file: `vertices`(vid)
   * over src ∪ dst and `uedges`(src, dst) with dangling self-loops — the
   * mirror of [[edges]], so the reference's PRIMARY input format
   * (io/EdgeParser.java:134-157) is correctness-gated end-to-end. */
  def unweightedOracleCtes(path: String): String =
    s"""rawu AS MATERIALIZED (
       |  SELECT * FROM read_csv('$path', delim='\\t', header=false,
       |    columns={'src':'BIGINT','rest':'VARCHAR'}, null_padding=true, auto_detect=false, quote='')
       |),
       |uedges AS MATERIALIZED (
       |  SELECT src, CAST(unnest(string_split(rest, ':')) AS BIGINT) AS dst FROM rawu
       |  WHERE rest IS NOT NULL AND len(trim(rest)) > 0
       |  UNION ALL
       |  SELECT src, src AS dst FROM rawu WHERE rest IS NULL OR len(trim(rest)) = 0
       |),
       |vertices AS MATERIALIZED (
       |  SELECT DISTINCT vid FROM (SELECT src AS vid FROM uedges UNION ALL SELECT dst AS vid FROM uedges)
       |)""".stripMargin

  private def parsed(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        split(col("value"), "\t").getItem(0).cast("long").as("src"),
        when(size(split(col("value"), "\t")) > 1 && length(trim(split(col("value"), "\t").getItem(1))) > 0,
          split(trim(split(col("value"), "\t").getItem(1)), ":"))
          .otherwise(array().cast("array<string>")).as("parts"))
}
