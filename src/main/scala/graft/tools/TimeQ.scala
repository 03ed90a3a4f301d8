package graft.tools
import graft.{Bench, SparkEntry}
object TimeQ {
  def main(args: Array[String]): Unit = {
    val s = Bench.session(32, 32)
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(s, args(0)).count()
      println(f"[timeq] $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    s.stop()
  }
}
