package graft.pregel

import graft.RefOracle
import graft.algos._

/** Delta/active-set superstep invariants (reference C2 VBlock-skip
 * analog): a run with aggressive delta updates (threshold 1.0, overlay
 * cap 2 to force mid-run compaction) must equal the full-update run
 * row-for-row, and must actually take delta supersteps. */
class DeltaSpec extends graft.SparkTestBase {

  private def cfgOf(threshold: Double) = PregelConfig(
    numPartitions = 4, deltaThreshold = threshold, maxOverlays = 2)

  private def graph(seed: Long) = {
    val (vids, directed) = RefOracle.randomGraph(60, 110, seed)
    (vids, (directed ++ directed.map(_.swap)).distinct)
  }

  test("CC: delta == full, and delta supersteps occur") {
    val (vids, sym) = graph(31L)
    val verts = vertDF(vids.size.toLong)
    def run(th: Double) =
      new Pregel(spark, cfgOf(th)).run(new ConnectedComponents(40), verts, edgeDF(sym))
    val (fullState, _) = run(0.0)
    val (deltaState, dm) = run(1.0)
    val a = fullState.select("vid", "label").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = deltaState.select("vid", "label").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "delta CC must equal full CC")
    assert(dm.exists(_.delta), "expected at least one delta superstep")
    assert(b == RefOracle.cc(vids, sym), "CC result must match the oracle")
  }

  test("SSSP: delta == full across compactions") {
    val (vids, sym) = graph(77L)
    val verts = vertDF(vids.size.toLong)
    def run(th: Double) = {
      val (st, m) = new Pregel(spark, cfgOf(th)).run(new SSSP(0L, 40),
        verts, edgeDF(sym).select(
          org.apache.spark.sql.functions.col("src"),
          org.apache.spark.sql.functions.col("dst"),
          SSSP.weightCol))
      (st.select("vid", "dist").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap, m)
    }
    val (full, _) = run(0.0)
    val (delta, dm) = run(1.0)
    assert(full == delta, "delta SSSP must equal full SSSP")
    assert(dm.count(_.delta) >= 2, "expected several delta supersteps")
  }

  test("SA: delta == full (popularity adoption with respond tracking)") {
    val (vids, directed0) = RefOracle.randomGraph(60, 120, 5L)
    val srcs = directed0.map(_._1).toSet
    val withLoops = directed0 ++ vids.filterNot(srcs).map(v => (v, v))
    val verts = vertDF(vids.size.toLong)
    def run(th: Double) =
      new Pregel(spark, cfgOf(th)).run(new SA(2L, 15), verts, edgeDF(withLoops))
    val full = run(0.0)._1.select("vid", "aid", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val (ds, dm) = run(1.0)
    val delta = ds.select("vid", "aid", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(full.sameElements(delta), "delta SA must equal full SA")
    assert(dm.exists(_.delta), "expected delta supersteps in SA")
  }

  test("MIS: active-set (status==0 OR messaged) delta == full") {
    val (vids, sym) = graph(13L)
    val verts = vertDF(vids.size.toLong)
    def run(th: Double) =
      new Pregel(spark, cfgOf(th)).run(new MIS(20), verts, edgeDF(sym))
    val full = run(0.0)._1.select("vid", "status").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (ds, dm) = run(1.0)
    val delta = ds.select("vid", "status").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == delta, "delta MIS must equal full MIS")
    assert(dm.exists(_.delta), "expected delta supersteps in MIS")
    // MIS output is a valid maximal independent set
    val inSet = delta.collect { case (v, 1L) => v }.toSet
    for ((u, v) <- sym) assert(!(inSet(u) && inSet(v)), s"adjacent $u,$v both in S")
  }
}
