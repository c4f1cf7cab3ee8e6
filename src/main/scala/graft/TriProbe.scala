package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B harness for the triangle enumeration (TRI_AB_r7.md): times the
  * pre-r7 UNPACKED wedge pipeline (5-long wedge rows, 2-column closure
  * key, inner closure join — inlined here verbatim) against the shipped
  * packed-key [[graft.graph.Analytics.triangles]], on the same memoised
  * co-purchase pairs, and cross-checks their outputs are identical. Not
  * part of the driver contract. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = spark.sessionState.conf.numShufflePartitions

    def pin(df: DataFrame): DataFrame =
      df.coalesce(parts).localCheckpoint(eager = true)

    // the pre-r7 enumeration, verbatim (degree orientation, unpacked)
    def legacy(e0: DataFrame): DataFrame = {
      val deg = pin(e0.select(col("a").as("id"))
        .union(e0.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg")))
      val lt = col("da") < col("db") || (col("da") === col("db"))
      val oriented = pin(e0
        .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
        .select(
          when(lt, col("a")).otherwise(col("b")).as("u"),
          when(lt, col("b")).otherwise(col("a")).as("v"),
          when(lt, col("db")).otherwise(col("da")).as("dv")))
      val o2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
      oriented.join(broadcast(o2), Seq("u"))
        .filter(col("dv") < col("dw") ||
          (col("dv") === col("dw") && col("v") < col("w")))
        .select(col("u"), col("v"), col("w"))
        .join(broadcast(oriented.select(col("u").as("v"), col("v").as("w"))),
          Seq("v", "w"))
        .select(col("u"), col("v"), col("w"))
    }

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TRIAB $label $s%.2f s"); s
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val e0 = pin(SparkEntry.partPairs(spark, sfDir)
      .select(col("src").as("a"), col("dst").as("b")))
    println(s"TRIAB edges=${e0.count()}")

    // parity once, then timed reps of each variant
    val l = legacy(e0).groupBy().agg(
      count(lit(1)).as("n"), sum(expr("u + v + w")).as("s")).head()
    val p = graft.graph.Analytics
      .triangles(e0, "a", "b", assumeCanonical = true)
      .groupBy().agg(
        count(lit(1)).as("n"), sum(expr("u + v + w")).as("s")).head()
    println(s"TRIAB parity legacy=(${l.getLong(0)},${l.getLong(1)}) " +
      s"packed=(${p.getLong(0)},${p.getLong(1)})")
    require(l == p, "legacy and packed enumerations disagree")

    for (r <- 1 to reps) {
      time(s"legacy rep$r")(sink(legacy(e0)))
      time(s"packed rep$r")(sink(graft.graph.Analytics
        .triangles(e0, "a", "b", assumeCanonical = true)))
    }
    spark.stop()
  }
}
