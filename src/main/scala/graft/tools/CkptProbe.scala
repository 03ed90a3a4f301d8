package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.LogicalRDD
import graft.Bench

/** Dev probe: does localCheckpoint preserve partitioning in this build? */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    for (aqe <- Seq(false, true)) {
      val s = Bench.session(8, 8, aqe = aqe)
      import s.implicits._
      val base = s.range(100000).select(col("id").as("vid"), (col("id") * 2).as("x"))
      val rp = base.repartition(5, col("vid"))
      println(s"[ckpt] aqe=$aqe rp.executedPlan.outputPartitioning = " + rp.queryExecution.executedPlan.outputPartitioning)
      val ck = rp.localCheckpoint(true)
      ck.queryExecution.analyzed match {
        case lr: LogicalRDD => println(s"[ckpt] aqe=$aqe one-arg LogicalRDD.outputPartitioning = " + lr.outputPartitioning)
        case other => println(s"[ckpt] aqe=$aqe not a LogicalRDD: ${other.getClass}")
      }
      // with observe, as the kernel uses it
      val obs = org.apache.spark.sql.Observation()
      val ck2 = rp.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
      ck2.queryExecution.analyzed match {
        case lr: LogicalRDD => println(s"[ckpt] aqe=$aqe observe+ckpt LogicalRDD.outputPartitioning = " + lr.outputPartitioning)
        case other => println(s"[ckpt] aqe=$aqe not a LogicalRDD: ${other.getClass}")
      }
      s.stop()
    }
  }
}
