package graft.tools
import org.apache.spark.sql.SparkSession
import graft.graph.{AdjacencyText, LinkGraph}
import graft.pregel.{Pregel, PregelConfig}
import graft.algos.PageRank
/** Scratch driver: load a reference-format text graph and run PageRank. */
object AdjDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = AdjacencyText.edges(spark, args(0))
    println("[demo] edges: " + e.collect().map(r => s"${r.getLong(0)}->${r.getLong(1)}").sorted.mkString(" "))
    val w = AdjacencyText.weightedEdges(spark, args(1))
    println("[demo] weighted: " + w.collect().map(r => s"${r.getLong(0)}->${r.getLong(1)}@${r.getDouble(2)}").sorted.mkString(" "))
    val verts = e.select("src").union(e.select("dst")).distinct().toDF("vid")
    val pr = PageRank.scores(new Pregel(spark, PregelConfig(4)), verts, e, verts.count(), 5)
    println("[demo] pagerank: " + pr.collect().map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(" "))
    spark.stop()
  }
}
