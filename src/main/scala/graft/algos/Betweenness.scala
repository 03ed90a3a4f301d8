package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-source TRUNCATED betweenness centrality (Brandes 2001, restricted to
 * a fixed seed set and a fixed BFS depth so the unrolled computation is
 * exactly mirrorable in ANSI SQL). No reference analog (HybridGraph's
 * library stops at PR/SSSP/CC/LPA/MIS/MM/SA,
 * /root/reference/src/examples/hybridgraph/examples/driver/
 * ExampleDriver.java:26-62); sampled-source betweenness is the standard
 * scalable estimator (Brandes–Pich 2007) a graph-analytics engine ships.
 *
 * Forward pass: per-seed BFS levels with shortest-path counts —
 * frontier_l(seed, vid, sigma), sigma = Σ sigma(parents at l−1), new
 * vertices only (anti-join against the seen set). Backward pass:
 * dependency accumulation delta_l(u) = Σ_{w ∈ succ(u) at l+1}
 * sigma(u)/sigma(w) · (1 + delta(w)); betweenness(v) = Σ_seeds Σ_{l≥1}
 * delta_l(v).
 *
 * Scale design: state is keyed by (seed, vid) so all seeds run in the
 * SAME per-level jobs — depth joins, not per-seed jobs. Each level is
 * one equi-join of the frontier against the pre-partitioned adjacency +
 * one anti-join against the seen set + one partial-aggregated combine;
 * every frontier/delta is eagerly localCheckpointed so lineage stays one
 * level deep (the same discipline as the Pregel superstep barrier and
 * [[RandomWalks]]). Per-level shuffle volume is O(|frontier| + new
 * vertices), never O(edges); seeds and levels are O(1) knobs.
 */
object Betweenness {

  /** @param vertices   (vid) universe — output has one row per vertex
   * @param undirected  symmetrized distinct edge set
   * @param seeds       BFS sources (the sampled-source estimator's sample)
   * @param levels      BFS truncation depth (paths longer than this are
   *                    not counted — both engines apply the same cut) */
  def truncated(vertices: DataFrame, undirected: DataFrame, seeds: Seq[Long],
                levels: Int, numPartitions: Int): DataFrame = {
    require(levels >= 2, "truncated betweenness needs >= 2 BFS levels")
    val adj = org.apache.spark.sql.graftx.PartitionedCheckpoint.localCheckpointHashed(
      undirected.select(col("src"), col("dst")).repartition(numPartitions, col("src")),
      Seq("src"), numPartitions) // stamped: keeps the per-level frontier
      // joins from re-exchanging the adjacency (AQE drops the layout)
    val f0 = vertices.filter(col("vid").isin(seeds: _*))
      .select(col("vid").as("seed"), col("vid"), lit(1L).as("sigma"))
      .localCheckpoint(true)

    // forward: BFS levels with path counts
    val frontiers = scala.collection.mutable.ArrayBuffer(f0)
    val seens = scala.collection.mutable.ArrayBuffer(
      f0.select("seed", "vid").localCheckpoint(true))
    for (_ <- 1 to levels) {
      val prev = frontiers.last
      val seen = seens.last
      val cand = prev.join(adj, prev("vid") === adj("src"))
        .select(col("seed"), adj("dst").as("cvid"), col("sigma"))
      val f = cand
        .join(seen, cand("seed") === seen("seed") && cand("cvid") === seen("vid"), "left_anti")
        .groupBy(col("seed"), col("cvid"))
        .agg(sum("sigma").as("sigma"))
        .select(col("seed"), col("cvid").as("vid"), col("sigma"))
        .localCheckpoint(true)
      frontiers += f
      seens += seen.unionByName(f.select("seed", "vid")).localCheckpoint(true)
    }

    // backward: dependency accumulation, deepest level first
    var delta = frontiers(levels)
      .select(col("seed"), col("vid"), col("sigma"), lit(0.0).as("delta"))
    val deltas = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (l <- (levels - 1) to 1 by -1) {
      val u = frontiers(l)
      val succ = delta.select(col("seed").as("wseed"), col("vid").as("wvid"),
        col("sigma").as("wsigma"), col("delta").as("wdelta"))
      val contrib = u.join(adj, u("vid") === adj("src"))
        .join(succ, u("seed") === col("wseed") && adj("dst") === col("wvid"))
        .groupBy(col("seed"), col("vid"))
        .agg(sum(col("sigma").cast("double") / col("wsigma") * (lit(1.0) + col("wdelta")))
          .as("contrib"))
      delta = u.join(contrib, Seq("seed", "vid"), "left_outer")
        .select(col("seed"), col("vid"), col("sigma"),
          coalesce(col("contrib"), lit(0.0)).as("delta"))
        .localCheckpoint(true)
      deltas += delta
    }

    val res =
      if (deltas.isEmpty)
        vertices.select(col("vid"), lit(0.0).as("betweenness"))
      else {
        // deltas are eagerly checkpointed (lineage-free), so the result no
        // longer depends on the forward-pass relations: materialize it and
        // release EVERY intermediate checkpoint — the per-level frontiers,
        // the seen-set chain and all but the last delta otherwise stay
        // pinned in the block manager for the life of the shared session
        // (ADVICE r5; the same leak class the kernel closed in r4).
        val bc = deltas.reduce(_.unionByName(_))
          .groupBy("vid").agg(sum("delta").as("b"))
        vertices.select("vid").join(bc, Seq("vid"), "left_outer")
          .select(col("vid"), round(coalesce(col("b"), lit(0.0)), 6).as("betweenness"))
          .localCheckpoint(true)
      }
    frontiers.foreach(graft.pregel.Pregel.unpersistCheckpointed)
    seens.foreach(graft.pregel.Pregel.unpersistCheckpointed)
    deltas.foreach(graft.pregel.Pregel.unpersistCheckpointed)
    graft.pregel.Pregel.unpersistCheckpointed(adj)
    res
  }

  /** Unrolled oracle chain + final SELECT; requires `vertices`,`uedges`
   * CTEs. The same fixed-depth Brandes forward/backward passes. */
  def oracleSql(seeds: Seq[Long], levels: Int): String = {
    val seedList = seeds.mkString(", ")
    val sb = new StringBuilder
    sb.append(
      s"""f0 AS (SELECT vid AS seed, vid, CAST(1 AS BIGINT) AS sigma FROM vertices WHERE vid IN ($seedList)),
         |seen0 AS (SELECT seed, vid FROM f0)""".stripMargin)
    for (l <- 1 to levels) {
      sb.append(s""",
        |f$l AS (
        |  SELECT seed, vid, CAST(sum(sigma) AS BIGINT) AS sigma FROM (
        |    SELECT p.seed, e.dst AS vid, p.sigma
        |    FROM f${l - 1} p JOIN uedges e ON e.src = p.vid
        |    LEFT JOIN seen${l - 1} s ON s.seed = p.seed AND s.vid = e.dst
        |    WHERE s.vid IS NULL)
        |  GROUP BY seed, vid
        |),
        |seen$l AS (SELECT seed, vid FROM seen${l - 1} UNION ALL SELECT seed, vid FROM f$l)""".stripMargin)
    }
    sb.append(s""",
      |d$levels AS (SELECT seed, vid, sigma, CAST(0 AS DOUBLE) AS delta FROM f$levels)""".stripMargin)
    for (l <- (levels - 1) to 1 by -1) {
      sb.append(s""",
        |d$l AS (
        |  SELECT u.seed, u.vid, u.sigma, coalesce(c.contrib, 0) AS delta
        |  FROM f$l u LEFT JOIN (
        |    SELECT u2.seed, u2.vid, sum(CAST(u2.sigma AS DOUBLE) / w.sigma * (1 + w.delta)) AS contrib
        |    FROM f$l u2
        |    JOIN uedges e ON e.src = u2.vid
        |    JOIN d${l + 1} w ON w.seed = u2.seed AND w.vid = e.dst
        |    GROUP BY u2.seed, u2.vid) c ON c.seed = u.seed AND c.vid = u.vid
        |)""".stripMargin)
    }
    val union = (1 until levels).map(l => s"SELECT vid, delta FROM d$l").mkString(" UNION ALL ")
    sb.append(s""",
      |bcs AS (SELECT vid, sum(delta) AS b FROM ($union) GROUP BY vid)
      |SELECT v.vid, round(coalesce(b.b, 0), 6) AS betweenness
      |FROM vertices v LEFT JOIN bcs b ON b.vid = v.vid
      |ORDER BY v.vid""".stripMargin)
    sb.toString
  }
}
