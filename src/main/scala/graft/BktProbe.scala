package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for q55 (dev-only; the BKT_AB_r8.md
  * evidence run). Splits the bucketed-store round trip into its real
  * phases — graph build materialisation, per-table CTAS save, catalog
  * load, and the 2-round propagate action — so the "attack q55" work
  * optimises the measured slice instead of the guessed one.
  *
  * Usage: `runMain graft.BktProbe [reps]` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS). Each rep clears memos and drops the store prefix
  * so save pays first-touch honestly, like a Bench pass. */
object BktProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BKTPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"BKTPROBE --- rep $rep ---")
      graft.functions.Memos.clear(spark)
      spark.catalog.clearCache()
      val prefix = "bktprobe"
      // drop leftovers so save pays the full path
      val wh = new java.io.File(
        spark.sessionState.conf.warehousePath.stripPrefix("file:"))
      Option(wh.list()).getOrElse(Array.empty[String])
        .filter(n => n == s"${prefix}_meta" ||
          n.startsWith(s"${prefix}_n_") || n.startsWith(s"${prefix}_e_"))
        .foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $n")
          scala.reflect.io.Directory(new java.io.File(wh, n)).deleteRecursively()
        }

      val g = time("build-def")(graft.graph.GraphBuilder
        .build(graft.catalog.Catalogs.tpch,
          n => Tables.load(spark, sfDir, n), probeDense = true)
        .withReverseEdges
        .restrictTo(Set("customer", "orders"), hops = 1))
      // force the build lineage once so 'save' measures the CTAS itself,
      // not the dense-id windows (q55 proper pays them inside save)
      time("build-exec")(g.nodes.values.foreach(_.write.format("noop")
        .mode("overwrite").save()))
      time("build-exec-edges")(g.edges.values.foreach(_.write.format("noop")
        .mode("overwrite").save()))
      time("save")(g.saveBucketed(prefix,
        buckets = spark.sessionState.conf.numShufflePartitions))
      val loaded = time("load")(
        graft.graph.HeteroGraph.loadBucketed(spark, prefix))
      val emb = time("propagate-def")(graft.learn.Propagate.meanRoundsFixed(
        loaded, graft.learn.Propagate.degreeInitFixedStructural(loaded),
        rounds = 2, checkpoint = false))
      time("propagate-exec")(
        emb("customer")
          .select(lit("customer").as("node_type"), col("id"), col("h"))
          .unionByName(emb("orders")
            .select(lit("orders").as("node_type"), col("id"), col("h")))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
