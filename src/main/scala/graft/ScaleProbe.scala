package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r7.md): scale-confidence run for the bounded-round
  * graph-analytics family. Builds K disjoint id-offset copies of the
  * sf0.1 co-purchase graph (structure-preserving: |V|, |E|, triangle
  * count, and per-round exchange volumes all scale by exactly K) and
  * times each analytic at K = 1, 2, 4 — the O(|V|)-per-round scaling
  * story, measured instead of asserted. K = 4 crosses the 4M-edge
  * measured broadcast gates, so the large-K reps exercise the honest
  * shuffle path a 100 TB graph would take. Not part of the driver
  * contract. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = spark.sessionState.conf.numShufflePartitions

    val base = SparkEntry.partPairs(spark, sfDir)
    val off = 1L << 24 // > max part id at sf0.1; keeps copies disjoint

    def copies(k: Int): DataFrame = {
      val u = (0 until k).map { i =>
        base.select((col("src") + i * off).as("src"),
          (col("dst") + i * off).as("dst"))
      }.reduce(_ unionByName _)
      u.coalesce(parts).localCheckpoint(eager = true)
    }

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SCALE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.graph.Analytics
    for (k <- Seq(1, 2, 4); r <- 1 to reps) {
      val e = copies(k)
      println(s"SCALE k=$k edges=${e.count()}")
      time(s"k=$k rep$r pagerank")(sink(Analytics.pageRankFixed(
        e, iters = 3)))
      time(s"k=$k rep$r triangles")(sink(Analytics.triangleStats(
        e, assumeCanonical = true)))
      time(s"k=$k rep$r kcore")(sink(Analytics.kCoreBounded(
        e, k = 10, rounds = 5, assumeCanonical = true)))
      time(s"k=$k rep$r labelprop")(sink(Analytics.labelPropagation(
        e, rounds = 5, assumeCanonical = true)))
      time(s"k=$k rep$r cc")(sink(Analytics.connectedComponentsBounded(
        e, rounds = 5, assumeCanonical = true)))
    }
    spark.stop()
  }
}
