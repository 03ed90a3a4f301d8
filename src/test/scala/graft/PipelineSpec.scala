package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Training-data pipeline operators over the driver testdata (sf0.001). */
class PipelineSpec extends SparkTestBase {
  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("exact dedup: every doc belongs to exactly one group; canonical is group min") {
    val e = Dedup.exact(docs)
    assert(e.count() == docs.count())
    val bad = e.groupBy("dup_group")
      .agg(min("doc_id").as("m"), sum(when(col("is_canonical"), 1).otherwise(0)).as("c"))
      .filter(col("c") =!= 1)
    assert(bad.isEmpty)
  }

  test("minhash LSH candidates are a superset of high-jaccard pairs it reports") {
    val out = Dedup.minhashLsh(docs, 16, 4, 0.2).collect()
    assert(out.forall(r => r.getDouble(2) >= 0.2 && r.getLong(0) < r.getLong(1)))
  }

  test("simhash: near-identical docs collide, hamming is symmetric-free (a<b)") {
    val pairs = Dedup.simhashPairs(docs, 16, 3).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1) && r.getLong(2) <= 3))
    val sh = Dedup.simhash(docs, 16).collect()
    assert(sh.forall(r => r.getLong(1) >= 0 && r.getLong(1) < (1L << 16)))
  }

  test("ann_topk: k neighbors per vector, ranked by rounded cosine") {
    val k = 3
    val out = Similarity.annTopK(emb, k)
    val n = emb.count()
    assert(out.count() == n * k)
    val perVec = out.groupBy("vec_id").agg(count(lit(1)).as("c"), max("rank").as("mr"))
    assert(perVec.filter(col("c") =!= k || col("mr") =!= k).isEmpty)
    // rank 1 neighbor has max rounded cosine
    val r1 = out.filter(col("rank") === 1).select("vec_id", "cos")
    val mx = out.groupBy("vec_id").agg(max("cos").as("mc"))
    assert(r1.join(mx, "vec_id").filter(col("cos") =!= col("mc")).isEmpty)
  }

  test("ann_lsh buckets: every reported neighbor shares the sign bucket") {
    val withB = emb.withColumn("bkt", Similarity.bucketExpr(col("embedding"), 8))
      .select(col("vec_id"), col("bkt"))
    val out = Similarity.annLsh(emb, 3, 8)
    val joined = out
      .join(withB.withColumnRenamed("vec_id", "vec_id").withColumnRenamed("bkt", "ba"), "vec_id")
      .join(withB.withColumnRenamed("vec_id", "neighbor").withColumnRenamed("bkt", "bb"), "neighbor")
    assert(joined.filter(col("ba") =!= col("bb")).isEmpty)
  }

  test("language id is deterministic and defaults to 'und' on no hits") {
    val out = TextAnalysis.langId(docs)
    assert(out.count() == docs.count())
    import spark.implicits._
    val empty = Seq((99L, "zzz qqq xxx")).toDF("doc_id", "text")
    assert(TextAnalysis.langId(empty).head().getString(1) == "und")
  }

  test("quality metrics are bounded ratios") {
    val q = TextAnalysis.quality(docs)
    assert(q.filter(col("alpha_ratio") < 0 || col("alpha_ratio") > 1).isEmpty)
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).isEmpty)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).isEmpty)
  }

  test("multimodal decode plumbing: mapPartitions batch transform with stubbed codec") {
    val out = Multimodal.decodeFeatures(docs)
    assert(out.count() == docs.count())
    val row = out.orderBy("doc_id").head()
    assert(row.getInt(2) >= 16 && row.getInt(3) >= 16) // fake dims
    assert(row.getSeq[Float](4).length == 8) // feature vector shape
    // deterministic: same input -> same features
    val again = Multimodal.decodeFeatures(docs).orderBy("doc_id").head()
    assert(row == again)
    // video assets sample >1 frame
    assert(out.filter(col("kind") === "video" && col("frames_sampled") <= 1).isEmpty)
  }
}
