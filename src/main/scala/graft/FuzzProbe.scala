package graft

import org.apache.spark.sql.functions._

/** Dev harness (BKT_AB_r8.md pattern): phase split for q89_fuzzy_names —
  * the board's #3 cost (5.4 s at sf0.1). Splits [[graft.ext.Fuzzy
  * .editOnePairs]] into its real slices (variant explode+hash, variant
  * self-join + thresholded-levenshtein verify, pair distinct) with
  * per-phase job/task accounting, and A/Bs candidate-level variations so
  * any production change optimises the measured slice.
  *
  * Usage: `runMain graft.FuzzProbe [reps]` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS). */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
    })
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val n0 = taskNanos.get()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // drain the async listener bus (dev probe only)
      println(f"FUZZPROBE $label $wall%.2f s jobs=${jobs.get() - j0} " +
        f"taskTime=${(taskNanos.get() - n0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      println(s"FUZZPROBE --- rep $rep ---")
      graft.functions.Memos.clear(spark)
      spark.catalog.clearCache()
      val cust = Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey").as("__id"), col("c_name").as("__s"))

      // phase 1: variant explode + hash only
      val variantsPlan = cust
        .select(col("__id"), col("__s"), explode(array_distinct(concat(
          array(col("__s")),
          expr("transform(sequence(1, length(__s))," +
            " i -> concat(substring(__s, 1, i - 1)," +
            " substring(__s, i + 1, length(__s))))")))).as("__vs"))
        .select(col("__id"), col("__s"), xxhash64(col("__vs")).as("__v"))
      time("variants        ")(noop(variantsPlan))

      // phase 2: join + in-stage verify, NO distinct (candidate volume)
      val right = variantsPlan.select(col("__id").as("__id2"),
        col("__s").as("__s2"), col("__v").as("__v2"))
      val verified = variantsPlan.join(right,
          col("__v") === col("__v2") && col("__id") < col("__id2"))
        .select(col("__id").as("id_a"), col("__id2").as("id_b"),
          levenshtein(col("__s"), col("__s2"), 1).cast("long").as("dist"))
      val nCand = time("join+verify     ")(
        verified.count())
      println(s"FUZZPROBE   candidates(all)=$nCand")
      val nSurv = time("join+verify>=0  ")(
        verified.filter(col("dist") >= 0).count())
      println(s"FUZZPROBE   candidates(dist<=1)=$nSurv")

      // phase 3: the full production pipeline (join + verify + distinct)
      time("full editOne    ")(noop(
        graft.ext.Fuzzy.editOnePairs(cust, "__id", "__s")))

      // A/B: pre-aggregated buckets — collect ids per variant key, emit
      // in-bucket pairs, verify after one explode (candidate strings
      // rejoin by id). Tests whether the self-join's double variant
      // exchange is the cost vs the bucket explode.
      val bucketed = variantsPlan
        .groupBy("__v").agg(collect_list(struct(col("__id"), col("__s"))).as("m"))
        .filter(size(col("m")) > 1)
        .select(explode(expr(
          "filter(flatten(transform(m, (a, i) -> transform(slice(m, i + 2, size(m) - i - 1), b -> " +
            "struct(least(a.__id, b.__id) AS id_a, greatest(a.__id, b.__id) AS id_b, " +
            "a.__s AS s_a, b.__s AS s_b)))), p -> p.id_a <> p.id_b)")).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
          levenshtein(col("p.s_a"), col("p.s_b"), 1).cast("long").as("dist"))
        .filter(col("dist") >= 0)
        .distinct()
      time("alt bucket-pairs")(noop(bucketed))
    }
    spark.stop()
  }
}
