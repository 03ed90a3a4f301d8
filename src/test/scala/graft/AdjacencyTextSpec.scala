package graft

import java.nio.file.{Files, Paths}
import graft.graph.AdjacencyText

/** Parity with the reference's documented text input formats
 * (README.md:75-77, EdgeParser.java:134-200), including the dangling
 * self-loop and bipartite-filter rules. */
class AdjacencyTextSpec extends SparkTestBase {

  private def write(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-adj")
    Files.writeString(dir.resolve("part-0.txt"), lines.mkString("\n"))
    dir.toString
  }

  test("unweighted adjacency: src \\t dst:dst..., sink gets a self-loop") {
    val p = write("0\t1:2", "1\t2", "2\t0", "3\t")
    val e = AdjacencyText.edges(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 3L)))
  }

  test("weighted adjacency: src \\t dst:w:dst:w, sink self-loop weight 0.1") {
    val p = write("0\t1:2.5:2:0.5", "1\t2:1.0", "2\t")
    val e = AdjacencyText.weightedEdges(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e == Set((0L, 1L, 2.5), (0L, 2L, 0.5), (1L, 2L, 1.0), (2L, 2L, 0.1)))
  }

  test("bipartite filter keeps only odd-even crossing edges") {
    val p = write("0\t1:2:3", "1\t3:4")
    val e = AdjacencyText.bipartite(AdjacencyText.edges(spark, p))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((0L, 1L), (0L, 3L), (1L, 4L)))
  }

  test("reference-format graph runs through the kernel end-to-end") {
    import graft.pregel.{Pregel, PregelConfig}
    import graft.algos.ConnectedComponents
    val p = write("0\t1", "1\t0", "2\t3", "3\t2", "4\t")
    val e = AdjacencyText.edges(spark, p).filter("src != dst")
    val sym = graph.LinkGraph.symmetrize(e)
    val cc = ConnectedComponents.labels(
      new Pregel(spark, PregelConfig(numPartitions = 4)), vertDF(5), sym, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  test("driver contract smoke: entry() yields rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
