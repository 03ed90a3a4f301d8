package graft

import org.apache.spark.sql.functions._
import graft.pregel.{Pregel, PregelConfig}
import graft.algos.MM

/** Bipartite maximal matching invariants (reference MMBipartiteBSP with
 * its own deterministic maxSelectVert choice). */
class MMSpec extends SparkTestBase {

  private def run(edges: Seq[(Long, Long)], n: Long, iters: Int = 40) = {
    val sym = (edges ++ edges.map(_.swap)).distinct
      .filter { case (a, b) => a % 2 != b % 2 } // bipartite rule
    val out = MM.matching(new Pregel(spark, PregelConfig(numPartitions = 4)),
      vertDF(n), edgeDF(sym), iters)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    (out, sym.toSet)
  }

  test("matching is a valid symmetric parity-crossing matching") {
    val (vids, directed) = RefOracle.randomGraph(40, 120, 17L)
    val (m, edges) = run(directed, vids.size.toLong)
    for ((v, (matched, p)) <- m if matched) {
      assert(p >= 0 && m(p)._1 && m(p)._2 == v, s"partner of $v not symmetric")
      assert(v % 2 != p % 2, s"same-parity match $v-$p")
      assert(edges.contains((v, p)), s"matched non-edge $v-$p")
    }
  }

  test("matching is maximal at convergence: no unmatched edge remains") {
    val (vids, directed) = RefOracle.randomGraph(40, 150, 29L)
    val (m, edges) = run(directed, vids.size.toLong)
    val unmatchedEdge = edges.find { case (a, b) => !m(a)._1 && !m(b)._1 }
    assert(unmatchedEdge.isEmpty, s"unmatched adjacent pair: $unmatchedEdge")
  }

  test("path graph: deterministic max-select matching") {
    // path 1-2-3-4 (parity alternates): phase 1 invites from 1 and 3;
    // 2 accepts max(1)=1... wait, 2's inviters are {1, 3} -> accepts 3;
    // 4's inviter is {3} -> accepts 3; 3 confirms max(2, 4) = 4.
    // Phase 2: 1 invites 2 (unmatched) -> match. Result: (3,4), (1,2).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val (m, _) = run(edges, 5)
    assert(m(3) == (true, 4L) && m(4) == (true, 3L), s"$m")
    assert(m(1) == (true, 2L) && m(2) == (true, 1L), s"$m")
    assert(!m(0)._1) // isolated vertex 0 stays unmatched
  }
}
