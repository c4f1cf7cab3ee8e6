package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does `repartition(p, key).localCheckpoint()` preserve
  * hash partitioning through the LogicalRDD, and do the propagation-round
  * joins then plan exchange-free? (dev-only) */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val h = spark.range(100000).select(col("id").as("gid"),
        (col("id") % 7).cast("double").as("h"))
      .repartition(8, col("gid")).localCheckpoint()
    val edges = spark.range(300000).select(
        (col("id") % 90000).as("src"), ((col("id") * 31) % 90000).as("dst"),
        (col("id") % 3).cast("int").as("tag"))
      .repartition(8, col("src")).localCheckpoint()

    val aggs = (0 until 3).flatMap { tg => Seq(
      sum(when(col("tag") === tg, col("h"))).as(s"s_$tg"),
      count(when(col("tag") === tg, lit(1))).as(s"c_$tg")) }
    val msgs = edges.join(h.select(col("gid").as("src"), col("h")), Seq("src"))
      .groupBy(col("dst").as("gid"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("gid"),
        (0 until 3).map(tg => when(col(s"c_$tg") > 0, col(s"s_$tg") / col(s"c_$tg"))
          .otherwise(lit(0.0))).reduce(_ + _).as("msg_sum"))
    val next = h.join(msgs, Seq("gid"), "left")
      .select(col("gid"), (col("h") + col("msg_sum")).as("h"))
    next.write.format("noop").mode("overwrite").save()
    println("=== round plan (executed, AQE-final) ===")
    println(next.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan"))
      .mkString("\n"))
    println("h outputPartitioning: " + h.queryExecution.executedPlan.outputPartitioning)
    spark.stop()
  }
}
