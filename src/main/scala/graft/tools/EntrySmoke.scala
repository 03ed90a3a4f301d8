package graft.tools
import graft.{Bench, SparkEntry}
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = Bench.session(8, 32)
    println("[entry] rows=" + SparkEntry.entry(s).count())
    s.stop()
  }
}
