package graft

/** Physical-plan shape gates: green results are not enough — the 100 TB
 * story dies if a "bucketed" operator silently plans a cross join. These
 * specs fail on any O(n^2) join node in the ops that were rebuilt to be
 * bucket-local (dedup_embedding/dedup_simhash were BroadcastNestedLoopJoin
 * all-pairs in round 1). ann_topk is the intentional brute-force baseline
 * and is exempt. */
class PlanShapeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val forbidden = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  for (q <- Seq("dedup_embedding", "dedup_simhash", "dedup_minhash",
    "dedup_ngram", "ann_lsh", "ann_ivf", "triangles",
    "clustering_coeff", "sample_stratified", "vocab_topk", "skipgram_pairs",
    "edge_features", "betweenness")) {
    test(s"$q plans no all-pairs join") {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      for (bad <- forbidden)
        assert(!plan.contains(bad), s"$q plan contains $bad")
    }
  }

  test("graph derivation (prEdges) plans no all-pairs join") {
    val g = SparkEntry.graphOf(spark, dir)
    val plan = g.prEdges.queryExecution.executedPlan.toString
    for (bad <- forbidden) assert(!plan.contains(bad))
  }
}
