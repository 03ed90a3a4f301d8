package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("dedup_minhash", "text_tokens", "ann_lsh", "triangles", "degrees")) {
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val schemas = "ReadSchema: [^\n]+".r.findAllIn(plan).toSeq.distinct
      val codegen = "WholeStageCodegen".r.findAllIn(plan).size
      println(s"== $q codegenSpans=$codegen")
      schemas.foreach(s => println("   " + s.take(150)))
    }
    spark.stop()
  }
}
