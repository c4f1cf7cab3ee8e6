package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r12.md, r11 verdict Next #4): scale curves for the
  * three r11 families that rested on shape reasoning plus single-scale
  * probes — the containment join, temporal walks, and the DocIngest
  * incremental near-dedup store.
  *
  *  - CONTAINMENT (q125 path): K = 1/2/4 structure-preserving disjoint
  *    doc copies (CurScaleProbe's `zq<i>` token-suffix transform: shingle
  *    sets map injectively per copy, zero cross-copy overlap — candidate
  *    and pair counts must scale exactly K×). Each K runs twice: the
  *    default gated-broadcast verify and the `broadcastDocs=0` SHUFFLED
  *    verify, demonstrating the post-gate shuffled plan at equal results.
  *    Candidate occurrences are priced separately via
  *    [[graft.ext.Dedup.containmentCandidates]].
  *  - TEMPORAL WALKS (q118 path): K disjoint id-offset copies of the
  *    co-purchase day graph — Σ deg scales K× and the per-step message
  *    volume (paper-inherent O(Σ deg)) must track it linearly, walls
  *    sub-linearly (width absorbs volume).
  *  - DOC INGEST (q126 path): 6 sequential micro-batches (disjoint
  *    `zq<i>` copies), per-batch wall printed as the signature store
  *    grows; then the same sequence with [[graft.streaming.DocIngest
  *    .compact]] after batch 3 — per-batch cost after the fold plus the
  *    final pairs-parity count (must equal 6× the base corpus pairs in
  *    BOTH runs).
  *
  * Not part of the driver contract. Usage: `runMain graft.R12ScaleProbe`
  * (env: SPARK_GRAFT_SF_DIR / _CPUS; CASE=containment|walks|ingest to
  * run one family). */
object R12ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("CASE")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = spark.sessionState.conf.numShufflePartitions
    val off = 1L << 24

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val docsBase = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    /** CurScaleProbe's structure-preserving doc copy (see its scaladoc
      * for the injectivity argument). */
    def docCopy(i: Int): DataFrame =
      docsBase.select((col("doc_id") + i * off).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1zq$i"))
          .as("text"))

    def docCopies(k: Int): DataFrame =
      (0 until k).map(docCopy).reduce(_ unionByName _)
        .coalesce(parts).localCheckpoint(eager = true)

    if (only.forall(_ == "containment")) {
      println("== containment (q125 path): K copies, gated vs shuffled verify ==")
      for (k <- Seq(1, 2, 4)) {
        val docs = docCopies(k)
        val hashed = graft.ext.Dedup.prep(docs, "doc_id", "text", 2)
        val (nCand, tCand) = timed(
          graft.ext.Dedup.containmentCandidates(hashed, 4, 5).count())
        val (nGated, tGated) = timed(
          graft.ext.Dedup.containmentPairs(docs, "doc_id", "text").count())
        spark.conf.set("spark.graft.dedup.broadcastDocs", "0")
        val (nShuf, tShuf) = try timed(
          graft.ext.Dedup.containmentPairs(docs, "doc_id", "text").count())
        finally spark.conf.unset("spark.graft.dedup.broadcastDocs")
        println(f"R12SCALE containment K=$k cand=$nCand%,d ($tCand%.2f s) " +
          f"pairs_gated=$nGated%,d ($tGated%.2f s) " +
          f"pairs_shuffled=$nShuf%,d ($tShuf%.2f s) " +
          (if (nGated == nShuf) "PARITY" else "MISMATCH"))
      }
    }

    if (only.forall(_ == "walks")) {
      println("== temporal walks (q118 path): K disjoint graph copies ==")
      val li = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
      val od = Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey").as("bk"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("d"))
      val bo = li.join(od, Seq("bk"))
      val base = bo.join(bo.select(col("bk"), col("it").as("it2")), Seq("bk"))
        .filter(col("it") < col("it2"))
        .select(col("it").as("a"), col("it2").as("b"), col("d"))
        .distinct()
        .coalesce(parts).localCheckpoint(eager = true)
      for (k <- Seq(1, 2, 4)) {
        val edges = (0 until k).map(i => base.select(
            (col("a") + i * off).as("a"), (col("b") + i * off).as("b"),
            col("d")))
          .reduce(_ unionByName _).coalesce(parts)
          .localCheckpoint(eager = true)
        val nE = edges.count()
        val (rows, t) = timed(graft.learn.Walks.temporalWalks(
          edges, "a", "b", "d", nWalks = 2, steps = 4, seed = 42L).count())
        println(f"R12SCALE walks K=$k edges=$nE%,d (sum_deg=${2 * nE}%,d) " +
          f"walk_rows=$rows%,d wall=$t%.2f s")
      }
    }

    if (only.forall(_ == "ingest")) {
      println("== DocIngest (q126 path): per-batch cost vs store size ==")
      val batches = (0 until 6).map(i =>
        docCopy(i).withColumn("lang", lit("en"))
          .withColumn("source", lit(s"s$i"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .coalesce(parts).localCheckpoint(eager = true))
      val basePairs = graft.ext.Dedup.nearDupMinhash(
        docsBase, "doc_id", "text", bands = 32, rows = 4).count()
      for (mode <- Seq("plain", "compact@3", "bucketed")) {
        val store = java.nio.file.Files
          .createTempDirectory(s"r12ingest").toString
        val tbl = "r12probe_sigs_" + store.filter(_.isLetterOrDigit).takeRight(10)
        try {
          batches.zipWithIndex.foreach { case (b, i) =>
            val (_, t) = timed(
              if (mode == "bucketed")
                graft.streaming.DocIngest.ingestBatchBucketed(
                  b, store, tbl, tau = 0.8, batchId = i.toLong)
              else graft.streaming.DocIngest.ingestBatch(
                b, store, tau = 0.8, batchId = i.toLong))
            println(f"R12SCALE ingest $mode batch=$i wall=$t%.2f s")
            if (mode == "compact@3" && i == 3) {
              val (_, tc) = timed(graft.streaming.DocIngest.compact(
                spark, store, upToBatch = i.toLong))
              println(f"R12SCALE ingest $mode compact wall=$tc%.2f s")
            }
          }
          val n = graft.streaming.DocIngest.pairs(spark, store).count()
          println(f"R12SCALE ingest $mode total_pairs=$n%,d " +
            f"expected=${6 * basePairs}%,d " +
            (if (n == 6 * basePairs) "PARITY" else "MISMATCH"))
        } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
      }
    }

    spark.stop()
  }
}
