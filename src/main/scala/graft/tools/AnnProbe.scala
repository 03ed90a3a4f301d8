package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Bench
import graft.pipeline.Similarity

/** Dev probe: annIvf stage timing (mirrors Similarity.annIvf internals). */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = Bench.session(32, 32)
    val k = 3; val kCells = 16; val probes = 2
    for (rep <- 1 to 2) {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      def cosCells(cents: Seq[(Long, Seq[Double])]): Column =
        zip_with(typedlit(cents.map(_._2)), typedlit(cents.map(_._1)),
          (cv, id) => struct(Similarity.cosExpr(col("embedding"), cv).as("cos"), id.as("cell")))
      def assignCol(cents: Seq[(Long, Seq[Double])]): Column =
        (-array_max(transform(cosCells(cents),
          x => struct(x.getField("cos").as("cos"), (-x.getField("cell")).as("negCell"))))
          .getField("negCell")).cast("long")
      val t0 = System.nanoTime()
      val seeds: Seq[(Long, Seq[Double])] = emb.orderBy("vec_id").limit(kCells)
        .select(col("embedding").cast("array<double>")).collect()
        .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](0).toIndexedSeq) }.toIndexedSeq
      val t1 = System.nanoTime()
      val assign0 = emb.select(col("vec_id"), assignCol(seeds).as("cell"))
      val cent: Seq[(Long, Seq[Double])] = assign0.join(emb, "vec_id")
        .select(col("cell"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos")).agg(round(avg(col("v")), 6).as("cv"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          x => x.getField("cv")).as("cemb"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq)).sortBy(_._1).toIndexedSeq
      val t2 = System.nanoTime()
      val assign = emb.select(col("vec_id").as("b"), assignCol(cent).as("cell"))
      val probeArr = array_sort(transform(cosCells(cent),
        x => struct((-x.getField("cos")).as("negCos"), x.getField("cell").as("cell"))))
      val probe = emb.select(col("vec_id").as("a"),
          explode(slice(probeArr, 1, probes)).as("pc"))
        .select(col("a"), col("pc.cell").as("cell"))
      val cands = probe.join(assign, "cell")
        .filter(col("a") =!= col("b")).select("a", "b").distinct()
      val nc = cands.count()
      val t3 = System.nanoTime()
      val w = Window.partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
      val res = cands
        .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
        .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
        .select(col("a"), col("b"), Similarity.cosExpr(col("ea"), col("eb")).as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
      val n = res.count()
      val t4 = System.nanoTime()
      println(f"[ann] rep=$rep seeds=${(t1-t0)/1e9}%5.2f lloyd=${(t2-t1)/1e9}%5.2f cands=${(t3-t2)/1e9}%5.2f($nc) verify=${(t4-t3)/1e9}%5.2f rows=$n")
    }
    s.stop()
  }
}
