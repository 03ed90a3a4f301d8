package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration: does a plain shuffle+agg scale with cores on this box?
 * Separates engine-structure overhead from hardware/memory saturation. */
object ShuffleCal {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 50000000L
    def run2(cores: Int): Double = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      // warmup
      s.range(rows / 10).groupBy((col("id") % 1000000).as("k")).agg(sum("id")).agg(count(lit(1))).head()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        s.range(rows).groupBy((col("id") % (rows / 2)).as("k")).agg(sum("id")).agg(count(lit(1))).head()
        (System.nanoTime() - t0) / 1e9
      }
      s.stop()
      times.sorted.apply(1) // median of 3
    }
    val t8 = run2(args.length > 1 match {case true => args(1).toInt; case false => 8})
    val t32 = run2(args.length > 2 match {case true => args(2).toInt; case false => 32})
    println(f"[cal] rows=$rows t8=$t8%.2f t32=$t32%.2f speedup=${t8 / t32}%.2f eff=${t8 / t32 / 4}%.2f")
  }
}
