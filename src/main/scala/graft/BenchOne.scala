package graft

import org.apache.spark.sql.SparkSession

/** Time a subset of SparkEntry queries (dev loop for perf work; the
  * driver-facing harness is [[Bench]]). Usage:
  * {{{ runMain graft.BenchOne q43_recommend_trained q29_propagate_fixed }}}
  * Honours SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like [[Bench]]; runs each
  * named query `SPARK_GRAFT_REPS` times (default 1) through the noop sink
  * and prints per-rep seconds. SPARK_GRAFT_CLEAR=1 clears the session
  * memos before every rep (like [[Bench]]'s per-pass reset), so rep 2+
  * measures the query instead of a memo hit. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val clear = sys.env.contains("SPARK_GRAFT_CLEAR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // single-file-bucket scans (BucketedStore / compactBucketed) report
      // their declared sortBy, dropping the SMJ sort on the store side;
      // multi-file buckets are guarded (bucketsContainSingleFile) either way
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args; r <- 1 to reps) {
      if (clear) graft.functions.Memos.clear(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"BENCHONE $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
