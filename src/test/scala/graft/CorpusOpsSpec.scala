package graft

import org.apache.spark.sql.functions._
import graft.algos.{RandomWalks, ClusteringCoefficient}
import graft.graph.LinkGraph
import graft.pipeline.Sampling

/** Round-5 corpus/graph additions: deterministic random walks, local
 * clustering coefficient, stratified quota sampling, vocabulary top-K. */
class CorpusOpsSpec extends SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private def docsDF(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  // diamond + tail: 0-1,0-2,1-3,2-3,3-4 (directed), vertex 5 dangling
  private val dedges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))

  test("walks: every transition follows a pr-edge; seeds are step 0") {
    val verts = vertDF(6)
    val pre = LinkGraph.withSelfLoops(edgeDF(dedges), verts)
    val w = RandomWalks.walks(verts, pre, steps = 5, numPartitions = 4)
    assert(w.count() === 6 * 6) // |V| * (steps+1)
    assert(w.filter(col("step") === 0 && col("vid") =!= col("walk_id")).count() === 0)
    // consecutive (cur, next) pairs must all be pr-edges
    val cur = w.select(col("walk_id"), col("step"), col("vid").as("cur"))
    val nxt = w.select(col("walk_id"), (col("step") - 1).as("step"), col("vid").as("nxt"))
    val trans = cur.join(nxt, Seq("walk_id", "step"))
    val bad = trans.join(pre, trans("cur") === pre("src") && trans("nxt") === pre("dst"),
      "left_anti")
    assert(bad.count() === 0)
    // dangling vertex 5 got a self-loop: its walk never leaves it
    assert(w.filter(col("walk_id") === 5L && col("vid") =!= 5L).count() === 0)
  }

  test("walks: result is invariant to the partition count") {
    val verts = vertDF(6)
    val pre = LinkGraph.withSelfLoops(edgeDF(dedges), verts)
    def run(p: Int) = RandomWalks.walks(verts, pre, steps = 4, numPartitions = p)
      .orderBy("walk_id", "step").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(2) === run(7))
  }

  test("walks: not all walks collapse to one path") {
    val verts = vertDF(6)
    val pre = LinkGraph.withSelfLoops(edgeDF(dedges), verts)
    val w = RandomWalks.walks(verts, pre, steps = 5, numPartitions = 4)
    // step-1 positions across walks are not a single vertex
    assert(w.filter(col("step") === 1).select("vid").distinct().count() > 1)
  }

  test("walks: transitions are not the degenerate min-neighbor choice") {
    // star out of 0 to 1..9: every step from 0 chooses among 1..9; a
    // monotone hash would always pick vertex 1 (the round-5 first-cut bug)
    val star = (1L until 10L).flatMap(i => Seq((0L, i), (i, 0L)))
    val verts = vertDF(10)
    val pre = LinkGraph.withSelfLoops(edgeDF(star), verts)
    val w = RandomWalks.walks(verts, pre, steps = 8, numPartitions = 4)
    // positions visited by walk 0 at odd steps (at a leaf) exclude 0 and
    // must not all equal leaf 1
    val leaves = w.filter(col("walk_id") === 0L && col("step") % 2 === 1)
      .select("vid").distinct().collect().map(_.getLong(0)).toSet
    assert(leaves.size > 1, s"degenerate min-neighbor walk: $leaves")
  }

  test("biased walks: transitions follow edges; partition-count invariant") {
    val verts = vertDF(6)
    val pre = LinkGraph.withSelfLoops(edgeDF(dedges), verts)
    def run(p: Int) = RandomWalks.biasedWalks(verts, pre, steps = 4,
      wRet = 1, wIn = 4, wOut = 2, numPartitions = p)
    val w = run(4)
    assert(w.count() === 6 * 5)
    val cur = w.select(col("walk_id"), col("step"), col("vid").as("cur"))
    val nxt = w.select(col("walk_id"), (col("step") - 1).as("step"), col("vid").as("nxt"))
    val bad = cur.join(nxt, Seq("walk_id", "step"))
      .join(pre, col("cur") === pre("src") && col("nxt") === pre("dst"), "left_anti")
    assert(bad.count() === 0)
    def rows(p: Int) = run(p).orderBy("walk_id", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(2) === rows(7))
  }

  test("biased walks: a large return weight makes walks backtrack more") {
    // undirected 8-cycle: every inner position has exactly {prev, next}
    // as candidates, so the return weight directly controls backtracking
    val cyc = (0L until 8L).map(i => (i, (i + 1) % 8))
    val verts = vertDF(8)
    val pre = LinkGraph.withSelfLoops(LinkGraph.symmetrize(edgeDF(cyc)), verts)
    def backtracks(wRet: Int): Long = {
      val w = RandomWalks.biasedWalks(verts, pre, steps = 4,
        wRet = wRet, wIn = 1, wOut = 1, numPartitions = 4)
      // position at step t+2 equals position at step t => one backtrack
      val a = w.select(col("walk_id"), col("step"), col("vid").as("a"))
      val b = w.select(col("walk_id"), (col("step") - 2).as("step"), col("vid").as("b"))
      a.join(b, Seq("walk_id", "step")).filter(col("a") === col("b")).count()
    }
    assert(backtracks(60) > backtracks(1))
  }

  test("skip-gram pairs: exact pairs for a hand-built corpus") {
    import spark.implicits._
    // one walk 0 visiting 5,6,7,8 and one walk 1 visiting 9,9
    val corpus = Seq(
      (0L, 0L, 5L), (0L, 1L, 6L), (0L, 2L, 7L), (0L, 3L, 8L),
      (1L, 0L, 9L), (1L, 1L, 9L)).toDF("walk_id", "step", "vid")
    val got = RandomWalks.skipGramPairs(corpus, window = 2)
      .select("walk_id", "step", "off", "center", "context")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val expect = Set(
      // walk 0 forward (+1, +2)
      (0L, 0L, 1L, 5L, 6L), (0L, 1L, 1L, 6L, 7L), (0L, 2L, 1L, 7L, 8L),
      (0L, 0L, 2L, 5L, 7L), (0L, 1L, 2L, 6L, 8L),
      // walk 0 backward (-1, -2)
      (0L, 1L, -1L, 6L, 5L), (0L, 2L, -1L, 7L, 6L), (0L, 3L, -1L, 8L, 7L),
      (0L, 2L, -2L, 7L, 5L), (0L, 3L, -2L, 8L, 6L),
      // walk 1 (length 2): only the +-1 pair
      (1L, 0L, 1L, 9L, 9L), (1L, 1L, -1L, 9L, 9L))
    assert(got === expect)
  }

  test("skip-gram pairs: symmetric — every (c, x, +k) has its (x, c, -k) mirror") {
    val verts = vertDF(6)
    val pre = LinkGraph.withSelfLoops(edgeDF(dedges), verts)
    val corpus = RandomWalks.walks(verts, pre, steps = 5, numPartitions = 4)
    val sg = RandomWalks.skipGramPairs(corpus, window = 2)
    val fwd = sg.filter(col("off") > 0)
      .select(col("walk_id"), (col("step") + col("off")).as("step"),
        (-col("off")).as("off"), col("context").as("center"), col("center").as("context"))
    val bwd = sg.filter(col("off") < 0)
    assert(fwd.count() === bwd.count())
    assert(fwd.exceptAll(bwd).count() === 0)
  }

  test("edge features: common neighbors, jaccard, adamic-adar by hand") {
    // triangle {0,1,2} + pendant 3 on 0
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L))
    val und = LinkGraph.symmetrize(edgeDF(e))
    val can = LinkGraph.canonical(edgeDF(e))
    val got = graft.algos.LinkFeatures.edgeFeatures(can, und)
      .orderBy("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    val lg2 = math.round(1e6 / math.log(2.0)) / 1e6 // 1.442695
    val lg3 = math.round(1e6 / math.log(3.0)) / 1e6 // 0.910239
    assert(got === Seq(
      (0L, 1L, 1L, 0.25, lg2),
      (0L, 2L, 1L, 0.25, lg2),
      (0L, 3L, 0L, 0.0, 0.0),
      (1L, 2L, 1L, 0.333333, lg3)))
  }

  test("betweenness: path graph matches the closed form") {
    // path 0-1-2-3-4, seed 0, depth 4: delta(v) = #descendants on the path
    val und = LinkGraph.symmetrize(edgeDF(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))))
    val got = graft.algos.Betweenness.truncated(vertDF(5), und, Seq(0L), 4, 4)
      .orderBy("vid").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((0L, 0.0), (1L, 3.0), (2L, 2.0), (3L, 1.0), (4L, 0.0)))
  }

  test("betweenness: diamond splits the dependency between the two middles") {
    // 0-1, 0-2, 1-3, 2-3: two shortest paths 0->3, each middle carries 1/2
    val und = LinkGraph.symmetrize(edgeDF(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))))
    val got = graft.algos.Betweenness.truncated(vertDF(4), und, Seq(0L), 2, 4)
      .orderBy("vid").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((0L, 0.0), (1L, 0.5), (2L, 0.5), (3L, 0.0)))
  }

  test("clustering coefficient: triangle 1.0, 4-cycle 0.0, pendant 0.0") {
    // triangle {0,1,2}; 4-cycle {3,4,5,6}; pendant 7 hanging off 0
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (5L, 6L), (3L, 6L), (0L, 7L))
    val d = edgeDF(e)
    val undirected = LinkGraph.symmetrize(d)
    val canonical = LinkGraph.canonical(d)
    val got = ClusteringCoefficient.local(canonical, undirected, vertDF(8))
      .orderBy("vid").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // vertex 0 has deg 3 (1,2,7) and one triangle: 2*1/(3*2) = 1/3
    assert(got(0L) === 0.333333)
    assert(got(1L) === 1.0 && got(2L) === 1.0)
    for (v <- 3L to 6L) assert(got(v) === 0.0)
    assert(got(7L) === 0.0) // deg 1
  }

  test("stratified sample: salted two-level == naive one-level window") {
    val docs = docsDF((0L until 97L).map(i =>
      (i, s"text $i", s"s${i % 5}")) :+ (97L, "only", "solo"))
    val q = 4
    val got = Sampling.stratified(docs, q, salts = 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val naive = docs.select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= q)
    assert(got.orderBy("doc_id").collect().toSeq ===
      naive.orderBy("doc_id").collect().toSeq)
    // quota respected; undersized strata return all their rows
    val per = got.groupBy("source").agg(count(lit(1)).as("n"), max("rk").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(per.forall { case (_, (n, mx)) => n <= q && mx === n })
    assert(per("solo") === ((1L, 1L)))
  }

  test("vocab top-k: counts, tie-break, and k cut") {
    val docs = docsDF(Seq(
      (1L, "a b b c", "s"), (2L, "b c c a", "s"), (3L, "zz a", "s")))
    // counts: a=3, b=3, c=3, zz=1
    val got = Sampling.vocabTopK(docs, 3).orderBy("rnk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "a", 3L), (2L, "b", 3L), (3L, "c", 3L)))
  }
}
