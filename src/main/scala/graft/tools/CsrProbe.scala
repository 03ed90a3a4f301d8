package graft.tools

import org.apache.spark.sql.functions._
import graft.graph.{LinkGraph, Transcripts}
import graft.Bench

/** Dev probe for the packed-CSR question (north star names a
 * `Dataset[VertexBlock]` CSR layout; SURVEY §7.2 judged it unnecessary on
 * Spark): time one message-generation + combine round over
 *   (a) the relational edge list (senders ⋈ edges on src, the kernel's
 *       shape), vs
 *   (b) a CSR-style packed adjacency (one row per vertex with a dst array,
 *       gather = senders ⋈ adj then explode).
 * Usage: runMain graft.tools.CsrProbe [convs] [rounds]
 */
object CsrProbe {
  def main(args: Array[String]): Unit = {
    val convs = if (args.nonEmpty) args(0).toLong else 600000L
    val rounds = if (args.length > 1) args(1).toInt else 5
    val s = Bench.session(16, 32, aqe = false)
    val t = Transcripts.synthetic(s, convs, 12, seed = 42L)
    val v = LinkGraph.vertices(t).select("vid", "turns", "turn_idx", "tool", "conv_id").cache()
    val e = LinkGraph.withSelfLoops(LinkGraph.directedEdges(v), v)
      .repartition(32, col("src")).persist()
    println("[csr] edges=" + e.count())
    val adj = e.groupBy(col("src")).agg(collect_list(col("dst")).as("dsts"))
      .repartition(32, col("src")).persist()
    println("[csr] adjRows=" + adj.count())
    val state = v.select(col("vid"), (col("vid") % 1000).cast("double").as("value"))
      .repartition(32, col("vid")).localCheckpoint(true)
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to rounds) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[csr] $tag#$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val senders = state.withColumn("_graft_src", col("vid"))
    time("relational") {
      senders.join(e.hint("shuffle_hash"), col("_graft_src") === col("src"))
        .select(col("dst").as("mvid"), col("value").as("msg"))
        .groupBy("mvid").agg(sum("msg")).count()
    }
    time("csr-gather") {
      senders.join(adj.hint("shuffle_hash"), col("_graft_src") === col("src"))
        .select(explode(col("dsts")).as("mvid"), col("value").as("msg"))
        .groupBy("mvid").agg(sum("msg")).count()
    }
    s.stop()
  }
}
