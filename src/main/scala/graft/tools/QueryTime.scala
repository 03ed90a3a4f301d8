package graft.tools

import graft.{Bench, SparkEntry}

/** Dev probe: time named SparkEntry queries on a testdata dir.
 * Usage: runMain graft.tools.QueryTime <sfDir> <q1,q2,...> [repeats] */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = Bench.session(cpus, cpus)
    for (r <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(s, dir).count()
      println(f"[qtime] rep=$r $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    s.stop()
  }
}
