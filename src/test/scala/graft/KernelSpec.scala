package graft

import java.nio.file.Files
import graft.pregel._
import graft.algos._

/** Superstep-kernel behaviors: checkpoint/resume, hybrid cost-model
 * switching discipline (SURVEY.md §5 item 5), metrics. */
class KernelSpec extends SparkTestBase {

  test("checkpoint + resume mid-iteration reproduces the uninterrupted run") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val (vids, directed) = RefOracle.randomGraph(30, 55, 11L)
    val sym = (directed ++ directed.map(_.swap)).distinct
    val verts = vertDF(vids.size.toLong)

    // uninterrupted
    val full = ConnectedComponents.labels(
      new Pregel(spark, PregelConfig(numPartitions = 4)), verts, edgeDF(sym), 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // phase 1: run only 3 supersteps, checkpointing every 2 (so step 2 + final step 3 are snapshotted)
    val cfg1 = PregelConfig(numPartitions = 4, checkpointDir = Some(dir), checkpointEvery = 2)
    val (_, m1) = new Pregel(spark, cfg1).run(new ConnectedComponents(3), verts, edgeDF(sym))
    assert(m1.exists(_.checkpointed), "phase 1 must checkpoint")

    // phase 2: resume from the snapshot and run to convergence
    val cfg2 = cfg1.copy(resume = true)
    val (state2, m2) = new Pregel(spark, cfg2).run(new ConnectedComponents(50), verts, edgeDF(sym))
    assert(m2.head.superstep == 4, s"resume must continue at superstep 4, got ${m2.head.superstep}")
    val resumed = state2.select("vid", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == full, "resumed run must equal uninterrupted run")
  }

  test("injected mid-run failure resumes from the last dynamic checkpoint, overlays in flight") {
    val dir = Files.createTempDirectory("graft-fail").toString
    // path graph: CC converges over ~29 supersteps with a 1-2 vertex
    // frontier, so the steps between checkpoint boundaries run in DELTA
    // mode (overlays over the base state) — the failure lands mid-overlay
    val sym = (0L until 29L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val verts = vertDF(30)

    // uninterrupted truth + proof that delta overlays are in flight at the
    // failure point (deterministic: same graph, same config)
    val probeCfg = PregelConfig(numPartitions = 4, checkpointDir = Some(dir + "-probe"),
      checkpointEvery = 3)
    val (fullState, probeMetrics) =
      new Pregel(spark, probeCfg).run(new ConnectedComponents(40), verts, edgeDF(sym))
    val full = fullState.select("vid", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probeMetrics.exists(m => m.superstep == 28 && m.delta),
      s"superstep 28 must be a delta overlay (in flight at the step-29 crash): " +
        probeMetrics.map(m => s"${m.superstep}${if (m.delta) "d" else ""}").mkString(","))

    // phase 1: crash at superstep 29 (reference BSPJob.setFailedIteration)
    val cfg = PregelConfig(numPartitions = 4, checkpointDir = Some(dir),
      checkpointEvery = 3, failAtSuperstep = Some(29))
    val ex = intercept[RuntimeException] {
      new Pregel(spark, cfg).run(new ConnectedComponents(40), verts, edgeDF(sym))
    }
    assert(ex.getMessage.contains("superstep 29"))

    // phase 2: resume and run to convergence
    val (state2, m2) = new Pregel(spark, cfg.copy(resume = true, failAtSuperstep = None))
      .run(new ConnectedComponents(40), verts, edgeDF(sym))
    assert(m2.head.superstep > 1 && m2.head.superstep <= 29,
      s"must resume from the snapshot, not restart: first=${m2.head.superstep}")
    val resumed = state2.select("vid", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == full, "resumed run must equal the uninterrupted run")

    // the final archive's metrics lineage is continuous from superstep 1
    // (pre-failure history rides the snapshot metadata across the resume)
    val meta = new Checkpoint(spark, dir, "cc").latest()
    assert(meta.isDefined)
    val lineage = meta.get._4.map(_.superstep)
    assert(lineage.nonEmpty && lineage.head == 1 &&
      lineage == (1 to lineage.max).toSeq,
      s"metrics lineage must be continuous from superstep 1, got $lineage")
  }

  test("checkpoint metadata carries per-partition lineage and metrics") {
    val dir = Files.createTempDirectory("graft-ckpt2").toString
    val verts = vertDF(10)
    val sym = (0L until 9L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val cfg = PregelConfig(numPartitions = 4, checkpointDir = Some(dir), checkpointEvery = 100)
    new Pregel(spark, cfg).run(new ConnectedComponents(5), verts, edgeDF(sym))
    val metaFiles = Files.walk(java.nio.file.Paths.get(dir)).iterator()
    var meta = ""
    metaFiles.forEachRemaining(p => if (p.getFileName.toString == "meta.json") meta = Files.readString(p))
    assert(meta.contains("\"partitions\":[{\"pid\":"), s"per-partition lineage missing: $meta")
    assert(meta.contains("\"metrics\":[{\"superstep\":1"), "metrics history missing")
    assert(meta.contains("\"style\":"), "exchange style missing from metrics")
  }

  test("SnapshotStore seam: parquet impl round-trips through the interface") {
    val dir = Files.createTempDirectory("graft-snap").toString
    val store: SnapshotStore = new ParquetSnapshotStore(spark)
    val ident = s"$dir/algo/step=3/state"
    assert(!store.complete(ident))
    store.write(vertDF(7), ident)
    assert(store.complete(ident))
    assert(store.read(ident).collect().map(_.getLong(0)).sorted.sameElements(0L until 7L))
  }

  test("cost model: dead-band keeps style, switch locks for w supersteps, cap forces push") {
    val cm = new CostModel(Hybrid, numExecutors = 4, broadcastCapBytes = 1000)
    // superstep <= 2: never switches (starts Pull)
    assert(cm.choose(1, 10, 10, 10, 1.0) == Pull)
    assert(cm.choose(2, 10, 10, 10, 1.0) == Pull)
    // big respond relation: exceeds broadcast cap -> Push regardless
    assert(cm.choose(3, 1000, 10, 10, 1.0) == Push)
    // small respond, huge message volume -> push still cheaper? q<0 keeps push;
    // tiny messages and tiny respond -> |q| inside dead-band keeps current (Push)
    assert(cm.choose(4, 10, 10, 10, 1.0) == Push)
    // strongly pull-favored (huge est msgs, small respond) but switch-locked until step 5+2
    val s5 = cm.choose(5, 9, 100000000L, 10, 1.0)
    assert(s5 == Pull, s"expected switch to Pull at step 5, got $s5")
    // immediately try to force back: locked
    val s6 = cm.choose(6, 8, 0, 10, 1.0)
    assert(s6 == Pull, "switch interval must lock the style")
  }

  test("mini-superstep estimator (C17): per-step miniQ decision, no lock, pull-biased") {
    val cm = new CostModel(MiniHybrid, numExecutors = 4, broadcastCapBytes = 16L << 20)
    // tiny flow -> pull (and the pull bias holds even when push is mildly cheaper)
    assert(cm.choose(1, 10, 10, 10, 1.0) == Pull)
    // big respond relation, few messages: broadcasting to every executor
    // costs far more than shuffling -> push clears the pull-biased margin
    assert(cm.choose(2, 50000, 10, 20, 1.0) == Push)
    // flips straight back: mini mode has NO switch lock (per-superstep decision)
    assert(cm.choose(3, 10, 10, 10, 1.0) == Pull)
    // respond relation over the broadcast cap -> push regardless
    val cm2 = new CostModel(MiniHybrid, numExecutors = 4, broadcastCapBytes = 1000)
    assert(cm2.choose(4, 200000, 10, 10, 1.0) == Push)
  }

  test("mini-superstep mode produces identical results (style parity)") {
    val (vids, directed) = RefOracle.randomGraph(20, 40, 9L)
    val sym = (directed ++ directed.map(_.swap)).distinct
    val verts = vertDF(vids.size.toLong)
    def cc(mode: ExchangeMode) = ConnectedComponents.labels(
      new Pregel(spark, PregelConfig(4, mode = mode)), verts, edgeDF(sym), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(MiniHybrid) == cc(Hybrid))
  }

  test("dynamic checkpoint policy: first boundary archives, cheap steps skip, recompute debt re-arms") {
    val p = new CheckpointPolicy
    // no history yet -> archive (averageCheckpointTime()==0 <= accumulated)
    p.recordStep(100)
    assert(p.required, "first eligible boundary must archive")
    p.recordCheckpoint(1000) // expensive snapshot; accumulator resets
    p.recordStep(100)
    assert(!p.required, "100ms recompute debt < 1000ms avg snapshot cost -> skip")
    (1 to 9).foreach(_ => p.recordStep(100))
    assert(p.required, "1000ms accumulated recompute >= avg snapshot cost -> archive")
    p.recordCheckpoint(500) // avg cost now 750ms
    p.recordStep(600)
    assert(!p.required)
    p.recordStep(200)
    assert(p.required)
  }

  test("fused supersteps produce identical PageRank results") {
    val (vids, directed) = RefOracle.randomGraph(30, 60, 21L)
    val srcs = directed.map(_._1).toSet
    val withLoops = directed ++ vids.filterNot(srcs).map(v => (v, v))
    val verts = vertDF(vids.size.toLong)
    def pr(fuse: Int) = PageRank.scores(
      new Pregel(spark, PregelConfig(numPartitions = 4, fusedSupersteps = fuse,
        fuseMinEdges = 0L)), // floor off: the test must exercise real fusing
      verts, edgeDF(withLoops), vids.size.toLong, 9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = pr(1); val b = pr(4)
    for (v <- vids) assert(math.abs(a(v) - b(v)) < 1e-9, s"v=$v ${a(v)} vs ${b(v)}")
  }

  test("push and pull exchanges produce identical supersteps (style parity)") {
    val (vids, directed) = RefOracle.randomGraph(20, 40, 3L)
    val sym = (directed ++ directed.map(_.swap)).distinct
    val verts = vertDF(vids.size.toLong)
    val a = LabelPropagation.labels(new Pregel(spark, PregelConfig(4, mode = ForcePush)), verts, edgeDF(sym), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = LabelPropagation.labels(new Pregel(spark, PregelConfig(4, mode = ForcePull)), verts, edgeDF(sym), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
