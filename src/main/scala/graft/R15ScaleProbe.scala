package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r15.md): the two curves the r15 additions owe
  * measurements for.
  *
  *  - SHARD SINK (q151, [[graft.ext.Packing.shardSequences]]): the claim
  *    is three corpus-sized exchanges and NO per-token row on the wire —
  *    the boundary-straddler assembly ships one pre-sliced span per
  *    (document, sequence touched), so exchanged rows ≈ documents +
  *    straddlers while the naive token-level shape ships Σ n_tok rows.
  *    Measured: wall + shuffle bytes + max-task at K = 1/5/10 corpus
  *    replicas (linear bytes, no single-task funnel), plus the row
  *    ledger (contribution rows vs token rows) that prices the two
  *    shapes. The token-level twin runs alongside at each K — same
  *    result, an exchange that is Σ n_tok rows instead.
  *  - IMAGE NEAR-DUP (q154, [[graft.multimodal.ImageDedup]]): candidate
  *    pairs come from 16-bit block-key buckets. The transferable shape:
  *    same-group candidates stay corpus-linear, while chance block
  *    collisions grow ~|corpus|²·blocks/2¹⁶ — negligible at fixture
  *    scale, the dominant term at ~10⁶ images, which is WHY the block
  *    width must track log₂(corpus) (the
  *    [[graft.ext.Dedup.simhashBlockValues]] scaladoc's rule; dHash64
  *    caps at 4×16 bits, so beyond ~10⁵–10⁶ images per bucket-domain the
  *    candidate key needs an auxiliary split — e.g. co-bucketing on a
  *    second block — or a wider perceptual hash). Measured: candidate /
  *    verified counts at K = 1/4/8 replicas with the quadratic fit.
  *
  * Not part of the driver contract. Usage: `runMain graft.R15ScaleProbe`
  * (env: SPARK_GRAFT_SF_DIR / _CPUS;
  * CASE=shardsink|imagedup|cobucket|widedup|audiodup|imgstore). */
object R15ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("CASE")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = spark.sessionState.conf.numShufflePartitions
    val off = 1L << 24

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val maxTask = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (t.taskMetrics != null)
            shuffleBytes.addAndGet(
              t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          if (t.taskInfo != null)
            maxTask.getAndUpdate(m => math.max(m, t.taskInfo.duration))
        }
      })
    /** (result, wall s, shuffle MB, max task ms) with listener drains. */
    def timedSh[A](f: => A): (A, Double, Double, Long) = {
      Thread.sleep(300)
      shuffleBytes.set(0L); maxTask.set(0L)
      val t0 = System.nanoTime()
      val a = f
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the async listener bus (dev probe only)
      (a, t, shuffleBytes.get() / 1e6, maxTask.get())
    }
    def withConf[A](kvs: (String, String)*)(body: => A): A = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val docsBase = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def replica(i: Int): DataFrame = docsBase.select(
      (col("doc_id") + i * off).as("doc_id"), col("text"))

    if (only.forall(_ == "shardsink")) withConf(
      // the fixture batch is KB-scale: without this the assembly join's
      // small side broadcasts / AQE coalesces the range exchange to one
      // partition and the probe measures the coalescer, not the shape
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      println("== q151 shard sink: 3 exchanges, rows = docs + straddlers ==")
      for (k <- Seq(1, 5, 10)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val seqs = () => graft.ext.Packing.shardSequences(
          docs, "doc_id", "text", shards = 8, seqTokens = 256L, seed = 42L)
        // the row ledger: what actually crosses the assembly exchange
        val toks = docs.select(size(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0))).cast("long").as("n"))
          .agg(sum("n")).head().getLong(0)
        val contribRows = seqs().selectExpr("sum(n_docs)").head().getLong(0)
        for (rep <- 1 to 3) {
          val (n, t, sh, mx) = timedSh(
            seqs().write.format("noop").mode("overwrite").save())
          println(f"R15SCALE shardsink K=$k rep=$rep docs=$nDocs%,d " +
            f"tokens=$toks%,d contrib_rows=$contribRows%,d " +
            f"wall=$t%.2f s shuffle=$sh%.1f MB max_task=$mx ms")
        }
        // token-level twin: same sequences, but the assembly exchange
        // carries ONE ROW PER TOKEN (what a naive groupBy-token-index
        // plan ships) — the shape q151 exists to avoid
        val (nT, tT, shT, mxT) = timedSh {
          val base = docs.select(col("doc_id"),
              regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"),
                lit(0)).as("__ts"))
            .withColumn("n_tok", size(col("__ts")).cast("long"))
            .withColumn("shard",
              graft.learn.DetRandom.mix(col("doc_id"), col("doc_id"), 42L) % 8)
            .withColumn("__h",
              graft.learn.DetRandom.mix(col("doc_id"), col("doc_id"), 43L))
          val laid = graft.ext.Selection.runningSumForProbeGrouped(
              base, Seq("shard"),
              Seq(col("__h").asc, col("doc_id").asc), "n_tok", "__cum")
            .withColumn("start_off", col("__cum") - col("n_tok"))
          laid.select(col("shard"), col("start_off"),
              posexplode(col("__ts")).as(Seq("p", "tok")))
            .select(col("shard"), (col("start_off") + col("p")).as("idx"),
              col("tok"))
            .groupBy(col("shard"), expr("idx div 256").as("seq_id"))
            .agg(count(lit(1)).as("seq_tok"))
            .write.format("noop").mode("overwrite").save()
        }
        println(f"R15SCALE shardsink K=$k token_twin " +
          f"wall=$tT%.2f s shuffle=$shT%.1f MB max_task=$mxT ms " +
          f"(exchange rows = $toks%,d tokens vs $contribRows%,d spans)")
      }
    }

    if (only.forall(_ == "imagedup")) {
      println("== q154 image near-dup: bucketed candidates vs corpus² ==")
      implicit val sp: SparkSession = spark
      for (k <- Seq(1, 4, 8)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .select("doc_id").coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val payload = graft.multimodal.MediaSynth.withPgmPayload(
          docs, "doc_id")
        for (rep <- 1 to 3) {
          val (res, t, sh, mx) = timedSh {
            val pairs = graft.multimodal.ImageDedup.nearDupDHash(
              payload, "doc_id", "payload")
            pairs.count()
          }
          // candidate volume = block-key bucket sizes choose 2, the
          // number the 2¹⁶ key domain caps; expected chance term
          // ~ |docs|²·4/2¹⁶/2
          val chance = nDocs.toDouble * nDocs * 4 / 65536 / 2
          println(f"R15SCALE imagedup K=$k rep=$rep docs=$nDocs%,d " +
            f"pairs=$res%,d wall=$t%.2f s shuffle=$sh%.1f MB " +
            f"max_task=$mx ms (chance-collision term ≈ $chance%,.0f)")
        }
      }
    }

    // q158's claim: at fixed 64-bit fingerprint width, moving from
    // single 16-bit block keys to 2-of-4 pair keys divides the CHANCE
    // candidate term by ~2¹⁶ (|docs|²·4/2¹⁷ → |docs|²·6/2³³) while the
    // verified radius-2 output is identical — the candidate ledger is
    // the measurement, bucket-sizes-choose-2 summed per scheme.
    if (only.forall(_ == "cobucket")) {
      println("== q158 co-bucket candidates vs single-block, same verify ==")
      implicit val sp: SparkSession = spark
      def blk(q: Int) =
        shiftrightunsigned(col("fp"), q * 16).bitwiseAND(lit(0xffffL))
      def candCount(keyed: DataFrame): Long =
        keyed.groupBy("key").count()
          .agg(sum(col("count") * (col("count") - 1)))
          .first().getLong(0) / 2
      for (k <- Seq(1, 4, 8)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .select("doc_id").coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val hashed = graft.multimodal.ImageDedup.dhashFrame(
            graft.multimodal.MediaSynth.withPgmPayload(docs, "doc_id"),
            "doc_id", "payload")
          .localCheckpoint(eager = true)
        val single = hashed.select(col("doc_id"), explode(array(
          (0 until 4).map(q => blk(q) + lit(q.toLong * 4294967296L)): _*))
          .as("key"))
        val pairKeys = for { q1 <- 0 until 4; q2 <- (q1 + 1) until 4 }
          yield blk(q1) * lit(65536L) + blk(q2) +
            lit((q1 * 4 + q2).toLong * 68719476736L)
        val co = hashed.select(col("doc_id"),
          explode(array(pairKeys: _*)).as("key"))
        for (rep <- 1 to 3) {
          val (cs, _, _, _) = timedSh(candCount(single))
          val (cc, tc, shc, mxc) = timedSh(candCount(co))
          val (v2, _, _, _) = timedSh(
            graft.multimodal.ImageDedup.coBucketFromHashes(hashed).count())
          println(f"R15SCALE cobucket K=$k rep=$rep docs=$nDocs%,d " +
            f"cand_single=$cs%,d cand_cobucket=$cc%,d verified_r2=$v2%,d " +
            f"co wall=$tc%.2f s shuffle=$shc%.1f MB max_task=$mxc ms")
        }
      }
    }

    // q156/q157's curves: same ledger as imagedup on the other two
    // fingerprint families — the wide 256-bit hash (16 independent
    // 16-bit keys over the fine fixture) and the audio energy-delta
    // fingerprint (4 keys, q154's machinery on decoded WAV energies).
    if (only.forall(_ == "widedup")) {
      println("== q156 wide-hash near-dup: candidate curve ==")
      implicit val sp: SparkSession = spark
      for (k <- Seq(1, 4, 8)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .select("doc_id").coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val payload = graft.multimodal.MediaSynth.withPgmFinePayload(
          docs, "doc_id")
        for (rep <- 1 to 3) {
          val (res, t, sh, mx) = timedSh(
            graft.multimodal.ImageDedup.nearDupBlockhash(
              payload, "doc_id", "payload").count())
          val chance = nDocs.toDouble * nDocs * 16 / 65536 / 2
          println(f"R15SCALE widedup K=$k rep=$rep docs=$nDocs%,d " +
            f"pairs=$res%,d wall=$t%.2f s shuffle=$sh%.1f MB " +
            f"max_task=$mx ms (chance-collision term ≈ $chance%,.0f)")
        }
      }
    }

    // q161's store≫batch claim (the SCALE_r13 §1 treatment for the
    // image family): pre-populate the bucketed fingerprint index with
    // K corpus replicas, then measure ONE fixed-size batch ingest —
    // shuffle bytes must track the batch (plus the verified-pair
    // output, which grows with the aliased-motif mass the fixture
    // caps at its 2002-group period — reported alongside), never the
    // store.
    if (only.forall(_ == "imgstore")) {
      println("== q161 image ingest: per-batch exchange vs store size ==")
      val newBatch = replica(98).filter(col("doc_id") % 10 === 0)
        .select("doc_id")
        .coalesce(parts).localCheckpoint(eager = true)
      val nNew = newBatch.count()
      for (k <- Seq(1, 4, 8)) {
        val tbl = s"graft_probe_imgstore_$k"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val tmp = java.nio.file.Files
          .createTempDirectory(s"imgstore$k").toString
        (0 until k).foreach { r =>
          graft.streaming.StoreCompact.appendToBucketedIndex(spark, tbl,
            graft.streaming.ImageIngest.fingerprints(
              replica(r).select("doc_id"))
              .withColumn("batch_id", lit(r.toLong)),
            buckets = parts, Seq("key"))
        }
        graft.streaming.ImageIngest.compact(spark, s"$tmp/store", tbl,
          upToBatch = (k - 1).toLong, buckets = parts)
        val storeRows = spark.table(tbl).count()
        for (rep <- 1 to 3) {
          val (_, t, sh, mx) = timedSh {
            graft.streaming.ImageIngest.ingestBatchBucketed(newBatch,
              s"$tmp/store", tbl, maxHamming = 3,
              batchId = (k + rep).toLong, buckets = parts)
          }
          val pairsNow = graft.streaming.ImageIngest
            .pairs(spark, s"$tmp/store").count()
          println(f"R15SCALE imgstore K=$k rep=$rep store_rows=$storeRows%,d " +
            f"batch=$nNew%,d pairs_out=$pairsNow%,d wall=$t%.2f s " +
            f"shuffle=$sh%.1f MB max_task=$mx ms")
        }
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
      }
    }

    if (only.forall(_ == "audiodup")) {
      println("== q157 audio near-dup: candidate curve ==")
      implicit val sp: SparkSession = spark
      for (k <- Seq(1, 4, 8)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .select("doc_id").coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val payload = graft.multimodal.MediaSynth.withWavMotifPayload(
          docs, "doc_id")
        for (rep <- 1 to 3) {
          val (res, t, sh, mx) = timedSh(
            graft.multimodal.AudioDedup.nearDupAudio(
              payload, "doc_id", "payload").count())
          val chance = nDocs.toDouble * nDocs * 4 / 65536 / 2
          println(f"R15SCALE audiodup K=$k rep=$rep docs=$nDocs%,d " +
            f"pairs=$res%,d wall=$t%.2f s shuffle=$sh%.1f MB " +
            f"max_task=$mx ms (chance-collision term ≈ $chance%,.0f)")
        }
      }
    }

    spark.stop()
  }
}
