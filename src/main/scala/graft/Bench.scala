package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line: {"metric":"total","value":N,"unit":"sec","queries":{...},...}.
  *
  * Each query is fully evaluated through the noop sink
  * (`df.write.format("noop")`), which executes the whole physical plan and
  * discards rows. A bare `.count()` is NOT used: Catalyst prunes every
  * deterministic projection under count(1), so map-only queries (regex,
  * fingerprints, tokenizers) would be timed as empty parquet scans.
  *
  * Failures are not swallowed: a failed query records its error class in the
  * "errors" map and forces a nonzero exit code, so a broken query can never
  * masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: first query otherwise absorbs several seconds of
    // one-time session cost (JIT, codegen compiler init, parquet footer
    // reads, shuffle machinery) that has nothing to do with that query.
    try {
      spark.range(1L << 20).selectExpr("sum(id * 2) AS s")
        .write.format("noop").mode("overwrite").save()
      SparkEntry.queries("q30_dedup_exact")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } catch {
      // a systematically failing warm-up would silently shift its cost
      // into the first timed query — log it, don't hide it
      case e: Throwable =>
        System.err.println(
          s"[bench] warm-up failed: ${e.getClass.getName}: ${e.getMessage}")
    }
    var failures = Map.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          failures += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failures.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":${failures.size},"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
