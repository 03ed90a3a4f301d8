package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench

/** Dev probe: does a lazy localCheckpoint's LogicalRDD still report the
 * hash(vid) outputPartitioning, i.e. is the kernel's state⋈inbox join
 * exchange-free? Prints the join plan — look for Exchange above the
 * ExistingRDD scan. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val s = Bench.session(8, 32, aqe = false)

    // kernel-init shape: vertices ⋈ deg (left outer USING) + withColumn +
    // select + repartition + lazy localCheckpoint — what partitioning does
    // the LogicalRDD report?
    locally {
      val vertices = s.range(100000).select(col("id").as("vid"))
      val edges = s.range(300000).select((col("id") % 90000).as("src"), (col("id") % 70000).as("dst"))
      val deg = edges.groupBy(col("src").as("vid")).agg(count(lit(1)).as("outdeg"))
      val vwd = vertices.join(deg, Seq("vid"), "left_outer")
        .withColumn("outdeg", coalesce(col("outdeg"), lit(0L)))
      val init = vwd.select(col("vid"), col("outdeg"), col("vid").as("label"), lit(false).as("respond"))
        .repartition(32, col("vid")).localCheckpoint(false)
      println("[part] kernel-init shape:")
      init.join(init.groupBy("vid").agg(count(lit(1)).as("c")).withColumnRenamed("vid", "_mvid"),
        col("vid") === col("_mvid"), "left_outer").explain("formatted")
    }
    val df = s.range(1000000)
      .select(col("id").as("vid"), lit(1.0).as("x"), lit(true).as("respond"))
      .repartition(32, col("vid")).localCheckpoint(false)
    df.count() // materialize
    val agg = df.filter(col("respond")).select(col("vid"), col("x"))
      .groupBy("vid").agg(sum("x").as("m"))
    val joined = df.join(agg.withColumnRenamed("vid", "_mvid"),
      col("vid") === col("_mvid"), "left_outer")
    joined.explain("formatted")
    // and the post-checkpoint re-join (the next superstep's shape)
    val st2 = joined.select(col("vid"), coalesce(col("m"), col("x")).as("x"), col("respond"))
      .localCheckpoint(false)
    st2.count()
    val agg2 = st2.filter(col("respond")).groupBy("vid").agg(sum("x").as("m"))
    st2.join(agg2.withColumnRenamed("vid", "_mvid"), col("vid") === col("_mvid"), "left_outer")
      .explain("formatted")
    s.stop()
  }
}
