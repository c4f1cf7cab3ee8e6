package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: phase timings inside the q44 prefix-filter dedup
  * (mirrors graft.ext.Dedup.nearDupJaccardExact step by step). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DEDUP $l ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.expressions.Window
    val (n, tauNum, tauDen) = (2, 4, 5)
    for (rep <- 1 to 2) {
      val docs = Tables.load(spark, sfDir, "documents")
      val hashed = time("prep ckpt")(
        docs.select(col("doc_id").cast("long").as("doc_id"),
            graft.ext.Dedup.prepUdf(n)(col("text")).as("p"))
          .select(col("doc_id"), col("p._1").as("sh"), col("p._2").as("hs"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint(eager = true))
      val exploded = hashed.select(col("doc_id"),
        size(col("sh")).as("nsh"), explode(col("sh")).as("p"))
      val dfreq = exploded.groupBy("p").agg(count(lit(1)).as("df"))
      val prefLen = (col("nsh") - expr(
        s"(nsh * $tauNum + ${tauDen - 1}) div $tauDen").cast("int") + 1)
      val pref = time("pref ckpt")(exploded.join(dfreq, Seq("p"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("p"))))
        .filter(col("rk") <= prefLen)
        .join(hashed.select(col("doc_id"),
          array_distinct(array_sort(col("hs"))).as("hset")), Seq("doc_id"))
        .select(col("doc_id"), col("nsh"), col("rk"), col("p"), col("hset"))
        .localCheckpoint(eager = true))
      println("DEDUP pref rows=" + pref.count())
      val alpha = expr(
        s"($tauNum * (x.nsh + y.nsh) + ${tauNum + tauDen - 1}) div ${tauNum + tauDen}")
      // mirrors nearDupJaccardExact's in-join positional filter (hash test
      // elided here so the probe reports the raw prefix-join volume)
      val cand = time("cand (no hash test)")(pref.as("x").join(pref.as("y"),
          col("x.p") === col("y.p") && col("x.doc_id") < col("y.doc_id") &&
            col("y.nsh") * tauNum <= col("x.nsh") * tauDen &&
            col("x.nsh") * tauNum <= col("y.nsh") * tauDen &&
            alpha <= lit(1) + least(
              col("x.nsh") - col("x.rk"), col("y.nsh") - col("y.rk")))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().localCheckpoint(eager = true))
      println("DEDUP cand rows=" + cand.count())
      time("verify+sink")(
        graft.ext.Dedup.nearDupJaccardExact(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
