package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming over events: batch/stream parity of the windowed
  * aggregations, custom keyed state across micro-batches. */
class StreamingSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._

  private def batchEvents = EventStream.withEventTime(
    Tables.load(spark, sf(), "events"))

  test("tumbling agg on a stream equals the same agg on the batch frame") {
    val batch = EventStream.tumblingAgg(batchEvents)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = EventStream.withEventTime(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = EventStream.tumblingAgg(streamDf)
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      val rows = Tables.load(spark, sf(), "events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
      // feed in two chunks to exercise incremental state
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val streamed = spark.table("tumbling")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessions: gap merges, per-user isolation (batch form)") {
    val ev = Seq(
      (1L, 0L, "a", 1.0), (1L, 60L, "a", 2.0),        // same session (gap 10 min)
      (1L, 3600L, "a", 4.0),                          // new session
      (2L, 0L, "b", 8.0)                              // other user
    ).map { case (u, sec, ty, v) => (0L, sec * 1000000000L, u, ty, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStream.sessions(EventStream.withEventTime(ev), gap = "10 minutes")
      .select($"user_id", $"n_events", $"session_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("runningUserTotals accumulates custom state across micro-batches") {
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.runningUserTotals(streamDf)
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, 0L, 7L, "x", 1.5, ""), (2L, 0L, 7L, "x", 2.5, "")))
      q.processAllAvailable()
      input.addData(Seq((3L, 0L, 7L, "x", 6.0, ""), (4L, 0L, 9L, "y", 1.0, "")))
      q.processAllAvailable()
      val rows = spark.table("totals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // user 7: batch1 -> (2, 4.0), batch2 -> (3, 10.0); user 9 -> (1, 1.0)
      assert(rows == Set((7L, 3L, 10.0), (9L, 1L, 1.0)))
    } finally q.stop()
  }

  test("purchaseAttribution stream equals the batch as-of join (q47)") {
    val batch = SparkEntry.queries("q47_asof_attrib")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.purchaseAttribution(streamDf)(spark)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // feed in three chunks in event-time order (the operator's contract)
      val rows = Tables.load(spark, sf(), "events")
        .orderBy("ts", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
      for (chunk <- rows.grouped((rows.length + 2) / 3)) {
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("purchaseAttributionLate: shuffled cross-batch arrival equals batch as-of") {
    val batch = SparkEntry.queries("q47_asof_attrib")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.purchaseAttributionLate(streamDf, watermark = "3650 days")(spark)
      .writeStream.format("memory").queryName("attrib_late")
      .outputMode("append").start()
    try {
      // deterministically SHUFFLE the fixture rows across three chunks —
      // the in-order operator's contract is violated on purpose; the
      // huge watermark keeps every arrival inside the reorder window
      val rows = Tables.load(spark, sf(), "events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
        .sortBy(r => r._1 * 2654435761L % 1000003)
      val maxTs = rows.map(_._2).max
      for (chunk <- rows.grouped((rows.length + 2) / 3)) {
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      // two far-future sentinels: the first advances the watermark past
      // every real row, the second runs a batch in which every user's
      // event-time timeout fires and drains its buffer
      val year = 365L * 24 * 3600 * 1000000000L
      input.addData(Seq((-1L, maxTs + 20 * year, 10000000L, "noise", 0.0, "")))
      q.processAllAvailable()
      input.addData(Seq((-2L, maxTs + 21 * year, 10000000L, "noise", 0.0, "")))
      q.processAllAvailable()
      val streamed = spark.table("attrib_late")
        .filter(col("event_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("purchaseAttributionLate: incremental drain + strict same-ts semantics") {
    // user 1 timeline (seconds): purchase@0, view@60, purchase@120,
    // [purchase eid33 + view eid34 BOTH @180 — strict: the view must NOT
    // see the same-ts purchase], view@240, view@400. Offset +1h: a row AT
    // the initial watermark (epoch 0) is dropped as late before the
    // operator ever sees it.
    def ev(eid: Long, sec: Long, typ: String, v: Double) =
      (eid, (3600L + sec) * 1000000000L, 1L, typ, v, "")
    val all = Seq(ev(30, 0, "purchase", 10.0), ev(31, 60, "view", 0.0),
      ev(32, 120, "purchase", 20.0), ev(33, 180, "purchase", 30.0),
      ev(34, 180, "view", 0.0), ev(35, 240, "view", 0.0),
      ev(36, 400, "view", 0.0))
    val batchDf = all.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val purchases = batchDf.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("prior_purchase_id"),
        col("value").as("prior_purchase_value"))
    val want = graft.ext.AsOf.joinAsOf(
      batchDf.select("event_id", "user_id", "ts"), purchases,
      key = "user_id", time = "ts", tiebreak = "prior_purchase_id",
      payload = Seq("prior_purchase_id", "prior_purchase_value"), strict = true)
      .collect().map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    // pin the strict case explicitly: eid34 attaches eid32, not eid33
    assert(want(34L) == Some(32L))

    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.purchaseAttributionLate(streamDf, watermark = "2 minutes")(spark)
      .writeStream.format("memory").queryName("attrib_inc")
      .outputMode("append").start()
    try {
      // out-of-order WITHIN each chunk; lateness stays inside 2 minutes
      input.addData(Seq(ev(31, 60, "view", 0.0), ev(30, 0, "purchase", 10.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(34, 180, "view", 0.0), ev(32, 120, "purchase", 20.0),
        ev(33, 180, "purchase", 30.0), ev(35, 240, "view", 0.0)))
      q.processAllAvailable() // wm → 240s-120s = 120s
      input.addData(Seq(ev(36, 400, "view", 0.0)))
      q.processAllAvailable()
      // incremental: rows below the 120s watermark drained BEFORE any
      // sentinel — but rows at/after it are still buffered
      val mid = spark.table("attrib_inc").count()
      assert(mid >= 2 && mid < all.size, s"expected partial drain, got $mid")
      input.addData(Seq(ev(98, 100000, "noise", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(99, 100100, "noise", 0.0)))
      q.processAllAvailable()
      val got = spark.table("attrib_inc").filter(col("event_id") < 90)
        .collect().map(r => (r.getLong(0),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("purchaseAttribution (in-order): same-ts purchase never attaches") {
    def ev(eid: Long, sec: Long, typ: String, v: Double) =
      (eid, sec * 1000000000L, 1L, typ, v, "")
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.purchaseAttribution(streamDf)(spark)
      .writeStream.format("memory").queryName("attrib_samets")
      .outputMode("append").start()
    try {
      // purchase eid10 and view eid11 share ts=100s (purchase sorts
      // first) — strict as-of: eid11 sees only the earlier purchase eid9
      input.addData(Seq(ev(9, 50, "purchase", 5.0), ev(10, 100, "purchase", 7.0),
        ev(11, 100, "view", 0.0), ev(12, 150, "view", 0.0)))
      q.processAllAvailable()
      val got = spark.table("attrib_samets")
        .collect().map(r => (r.getLong(0),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
      assert(got(11L) == Some(9L), s"same-ts purchase leaked: $got")
      assert(got(12L) == Some(10L))
      assert(got(9L) == None)
    } finally q.stop()
  }

  test("anomalyFlags stream equals the batch z-test (q88) across micro-batches") {
    val batch = graft.ext.Anomaly.zFlags(
        Tables.load(spark, sf(), "events"),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getBoolean(6))).toSet

    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.anomalyFlags(streamDf)(spark)
      .writeStream.format("memory").queryName("zflags")
      .outputMode("append").start()
    try {
      // in event-time order, split across four micro-batches — the ring
      // buffer must carry each user's history between batches
      val rows = Tables.load(spark, sf(), "events")
        .orderBy("ts", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
      for (chunk <- rows.grouped((rows.length + 3) / 4)) {
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("zflags")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          r.getBoolean(6))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("dedupStream drops cross-batch duplicate ids within the watermark") {
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark)
    val streamDf = EventStream.withEventTime(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = EventStream.dedupStream(streamDf, "event_id")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      def ev(id: Long, sec: Long) = (id, sec * 1000000000L, 1L, "x", 1.0, "")
      input.addData(Seq(ev(1, 0), ev(2, 10), ev(1, 20))) // in-batch dup of 1
      q.processAllAvailable()
      input.addData(Seq(ev(2, 30), ev(3, 40)))           // cross-batch dup of 2
      q.processAllAvailable()
      // a far-future row advances the watermark so earlier rows finalise
      input.addData(Seq(ev(99, 100000)))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 99L))
    } finally q.stop()
  }

  test("foreachBatch embedding ingest → incremental semantic dedup equals the batch dedup") {
    import graft.ext.Similarity
    import graft.streaming.EmbIngest
    val tau = 300000000000L
    val tmp = java.nio.file.Files.createTempDirectory("embingest").toString
    val inDir = s"$tmp/in"; val storeDir = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
    new java.io.File(inDir).mkdirs()

    // planted exact copies under higher ids guarantee cross-batch drops
    val emb = Tables.load(spark, sf(), "embeddings")
    val corpus = emb.select($"vec_id", $"embedding", $"label")
      .unionByName(emb.filter($"vec_id" < 5)
        .select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label"))
      .cache()
    // the frozen model state: the same fit the batch twin memoises
    val cents = Similarity.kmeansFixedCentroids(
      corpus, "vec_id", "embedding", nCentroids = 16, iters = 3, seed = 42L)

    val bounds = Seq((Long.MinValue, 20L), (20L, 40L), (40L, Long.MaxValue))
    val q = EmbIngest.start(spark, inDir, storeDir, ckpt, cents, tau)
    try {
      // id-ordered chunks: first-seen-wins must equal batch min-id-wins
      bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
        val staging = s"$tmp/stage$i"
        corpus.filter($"vec_id" >= lo && $"vec_id" < hi)
          .coalesce(1).write.parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$inDir/chunk$i.parquet"))
        q.processAllAvailable()
      }
    } finally q.stop()

    val read = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val streamed = read(EmbIngest.result(spark, storeDir))
    val batch = read(Similarity.semanticDedup(corpus, "vec_id", "embedding", tau))
    assert(batch.values.exists(_._3 == 0L), "fixture should contain drops")
    assert(streamed === batch)

    // at-least-once replay: re-running the LAST micro-batch with its own
    // batchId must overwrite its earlier output, not append a second copy
    val cSeq = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    EmbIngest.ingestBatch(spark.read.parquet(s"$inDir/chunk2.parquet"),
      storeDir, cSeq, tau, batchId = 2L)
    val replayed = EmbIngest.result(spark, storeDir)
    assert(replayed.count() == streamed.size, "replay appended instead of overwriting")
    assert(read(replayed) === streamed)
  }

  test("embedding ingest out of id order: verdicts follow the documented store-rule") {
    import graft.ext.Similarity
    import graft.streaming.EmbIngest
    val tau = 300000000000L
    val tmp = java.nio.file.Files.createTempDirectory("embooo").toString
    val emb = Tables.load(spark, sf(), "embeddings")
    val corpus = emb.select($"vec_id", $"embedding", $"label")
      .unionByName(emb.filter($"vec_id" < 5)
        .select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label"))
      .cache()
    val cents = Similarity.kmeansFixedCentroids(
      corpus, "vec_id", "embedding", nCentroids = 16, iters = 3, seed = 42L)
    val cSeq = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)

    // chunks deliberately NOT in id order: the copies (highest ids) and
    // the high fixture ids arrive FIRST
    val chunkPred = Seq(
      $"vec_id" >= 40L, $"vec_id" < 20L, $"vec_id".between(20L, 39L))
    chunkPred.zipWithIndex.foreach { case (p, i) =>
      EmbIngest.ingestBatch(corpus.filter(p), s"$tmp/store", cSeq, tau, batchId = i.toLong)
    }
    val got = EmbIngest.result(spark, s"$tmp/store")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == corpus.count())

    // naive replay of the documented rule: an item is dropped iff a
    // SMALLER-ID item of its cluster in (already-stored ∪ same batch)
    // exceeds tau; verdicts are final at ingest
    val ws = corpus.select($"vec_id",
        transform(graft.functions.ArrayOps.l2normalize($"embedding".cast("array<double>")),
          x => floor(x * lit(1000000.0))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val cid = got.map { case (id, (c, _, _)) => id -> c }
    def sim(a: Long, b: Long): Long =
      ws(a).indices.map(d => ws(a)(d) * ws(b)(d)).sum
    val allIds = corpus.select($"vec_id").collect().map(_.getLong(0))
    val chunks = Seq(
      allIds.filter(_ >= 40L), allIds.filter(_ < 20L),
      allIds.filter(id => id >= 20L && id <= 39L))
    var store = Set.empty[Long]
    val naive = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    chunks.foreach { chunk =>
      val visible = store ++ chunk
      chunk.foreach { b =>
        val n = visible.count(a =>
          a < b && cid(a) == cid(b) && sim(a, b) > tau).toLong
        naive(b) = (cid(b), n, if (n == 0) 1L else 0L)
      }
      store ++= chunk
    }
    // the order dependence this test pins: a copy that arrives BEFORE
    // its original is judged without it (the original's smaller id is
    // not yet in the store), and the original is never dropped by the
    // larger-id copy — so out of order BOTH survive, where id-ordered
    // arrival (the parity test above) drops the copy
    assert((0L until 5L).exists(src =>
      naive(src)._3 == 1L && naive(src + 100000L)._3 == 1L),
      "expected an early-arrived copy and its original to both survive")
    assert(got === naive.toMap)
  }

  test("foreachBatch ingest → incremental near-dedup equals the batch dedup") {
    import graft.streaming.DocIngest
    val tmp = java.nio.file.Files.createTempDirectory("ingest").toString
    val inDir = s"$tmp/in"; val storeDir = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
    new java.io.File(inDir).mkdirs()

    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text", "lang", "source", "n_chars").cache()
    val n = docs.count()

    val q = DocIngest.start(spark, inDir, storeDir, ckpt)
    try {
      // land the corpus as three separate files, one micro-batch each —
      // near-dup pairs must be found across batch boundaries too
      Seq((0L, n / 3), (n / 3, 2 * n / 3), (2 * n / 3, n + 1)).zipWithIndex
        .foreach { case ((lo, hi), i) =>
          // the file source only sees top-level files: write the chunk
          // aside, then move its part-file into the watched dir
          val staging = s"$tmp/stage$i"
          docs.filter($"doc_id" >= lo && $"doc_id" < hi)
            .coalesce(1).write.parquet(staging)
          val part = new java.io.File(staging).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            java.nio.file.Paths.get(s"$inDir/chunk$i.parquet"))
          q.processAllAvailable()
        }
    } finally q.stop()

    val streamed = DocIngest.pairs(spark, storeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.ext.Dedup
      .nearDupMinhash(docs, "doc_id", "text", bands = 32, rows = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture should contain planted near-dups")

    // at-least-once replay: re-running the LAST micro-batch with its own
    // batchId must overwrite its earlier output, not append a second copy
    val lastBatch = spark.read.parquet(s"$inDir/chunk2.parquet")
    DocIngest.ingestBatch(lastBatch, storeDir, tau = 0.8, batchId = 2L)
    val replayed = DocIngest.pairs(spark, storeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(replayed.length == replayed.distinct.length,
      "replayed batch appended duplicate pairs")
    assert(replayed.toSet == batch, "replay changed the accumulated pairs")
  }

  test("DocIngest.compact: pairs-identical store, superseded partitions " +
      "folded, eviction bounds the dedup horizon") {
    import graft.streaming.DocIngest
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text", "lang", "source", "n_chars").cache()
    val n = docs.count()
    val cuts = Seq((0L, n / 3), (n / 3, 2 * n / 3), (2 * n / 3, n + 1))
    def chunk(i: Int) = docs.filter(
      $"doc_id" >= cuts(i)._1 && $"doc_id" < cuts(i)._2)
    def pairsOf(d: String) = DocIngest.pairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // control (never compacted) vs compacted-mid-stream store
    val ctl = s"$tmp/ctl"; val cmp = s"$tmp/cmp"
    for ((dir, doCompact) <- Seq(ctl -> false, cmp -> true)) {
      DocIngest.ingestBatch(chunk(0), dir, tau = 0.8, batchId = 0L)
      DocIngest.ingestBatch(chunk(1), dir, tau = 0.8, batchId = 1L)
      if (doCompact) DocIngest.compact(spark, dir, upToBatch = 1L)
      DocIngest.ingestBatch(chunk(2), dir, tau = 0.8, batchId = 2L)
    }
    assert(pairsOf(cmp) == pairsOf(ctl),
      "compaction changed the accumulated pairs")
    assert(pairsOf(ctl).nonEmpty, "fixture should contain planted near-dups")

    // layout: batches 0 and 1 folded into batch_id=1; batch 2 untouched
    for (store <- Seq("sigs", "shingles")) {
      val parts = new java.io.File(s"$cmp/$store").listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).toSet
      assert(parts == Set("batch_id=1", "batch_id=2"),
        s"$store partitions after compact: $parts")
    }

    // replay AFTER compaction: batch 2 (> upToBatch) re-runs against the
    // folded store and must overwrite, not duplicate or drift
    DocIngest.ingestBatch(chunk(2), cmp, tau = 0.8, batchId = 2L)
    assert(pairsOf(cmp) == pairsOf(ctl), "replay after compact drifted")

    // supersede: the SAME doc ids re-ingested with new text — after
    // compact the index holds exactly one signature set per doc (the
    // latest), not two
    val sup = s"$tmp/sup"
    DocIngest.ingestBatch(chunk(0), sup, tau = 0.8, batchId = 0L)
    DocIngest.ingestBatch(
      chunk(0).withColumn("text", concat($"text", lit(" rev2"))),
      sup, tau = 0.8, batchId = 1L)
    DocIngest.compact(spark, sup, upToBatch = 1L)
    val one = s"$tmp/one"
    DocIngest.ingestBatch(
      chunk(0).withColumn("text", concat($"text", lit(" rev2"))),
      one, tau = 0.8, batchId = 0L)
    val supSigs = spark.read.parquet(s"$sup/sigs").drop("batch_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oneSigs = spark.read.parquet(s"$one/sigs").drop("batch_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(supSigs == oneSigs,
      "compacted index != the latest text's signature set (supersede broke)")

    // eviction: drop everything below the horizon, then ingest shifted
    // copies of the evicted docs — no cross pair may reach back past the
    // horizon, while the un-evicted control store finds them all
    val shifted = chunk(0).withColumn("doc_id", $"doc_id" + 1000000L)
    DocIngest.compact(spark, cmp, upToBatch = 2L, evictBelow = 3L)
    val before = pairsOf(cmp)
    DocIngest.ingestBatch(shifted, cmp, tau = 0.8, batchId = 3L)
    val gained = pairsOf(cmp) -- before
    assert(gained.forall { case (a, b) => a >= 1000000L && b >= 1000000L },
      s"evicted docs still matched: ${gained.filter(_._1 < 1000000L).take(5)}")
    DocIngest.ingestBatch(shifted, ctl, tau = 0.8, batchId = 3L)
    val gainedCtl = pairsOf(ctl) -- pairsOf(cmp) -- before
    assert(gainedCtl.exists { case (a, b) => a < 1000000L && b >= 1000000L },
      "control store should match the shifted copies to their originals")
  }

  test("bucketed signature index: pairs parity with the plain store; " +
      "no exchange between the index scan and the candidate join") {
    import graft.streaming.DocIngest
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

    // own session: the plan leg disables auto-broadcast (emulating
    // corpus-scale statistics) without touching concurrent suites
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("bktingest").toString
    val tbl = "graft_test_bkt_sigs"
    s2.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val chunks = (0 until 3).map(i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i))
      val ctl = s"$tmp/ctl"; val bkt = s"$tmp/bkt"
      chunks.zipWithIndex.foreach { case (c, i) =>
        DocIngest.ingestBatch(c, ctl, tau = 0.8, batchId = i.toLong)
        DocIngest.ingestBatchBucketed(c, bkt, tbl, tau = 0.8,
          batchId = i.toLong, buckets = 8)
      }
      def pairsOf(d: String) = DocIngest.pairs(s2, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairsOf(bkt) == pairsOf(ctl), "bucketed index changed the pairs")
      assert(pairsOf(ctl).nonEmpty, "fixture should contain planted near-dups")

      // append-only replay: batch 2 re-runs, recomputes against the
      // pre-batch index (own batch_id excluded) — pairs must not drift,
      // and the duplicate index rows it appends must stay benign
      DocIngest.ingestBatchBucketed(chunks(2), bkt, tbl, tau = 0.8,
        batchId = 2L, buckets = 8)
      assert(pairsOf(bkt) == pairsOf(ctl), "replay drifted the pairs")

      // THE scale claim: with auto-broadcast off (corpus-scale statistics),
      // the candidate join plans as a shuffled join whose index side reads
      // the BUCKETED table — no exchange between that scan and the join;
      // only the |batch|-sized new side shuffles.
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val self = p match {
          case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
          case _ => Seq(p) ++ p.children.flatMap(nodes)
        }
        self ++ p.subqueries.flatMap(nodes)
      }
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newKeys = graft.ext.Dedup.signatures(chunks(0), "doc_id", "text")
        .select("doc_id", "band", "key").localCheckpoint(eager = true)
      val cand = DocIngest.bucketedCandidates(s2, tbl, newKeys, batchId = 99L)
      val joins = nodes(cand.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      val scanSides = joins.flatMap(_.children).filter(c =>
        nodes(c).exists(_.isInstanceOf[FileSourceScanExec]))
      assert(scanSides.nonEmpty,
        "expected the sigs table scan under a shuffled candidate join")
      val bad = scanSides.filter(c =>
        nodes(c).exists(_.isInstanceOf[ShuffleExchangeExec]))
      assert(bad.isEmpty,
        "the bucketed index side pays an exchange — bucketing not engaged")
    } finally {
      s2.sql(s"DROP TABLE IF EXISTS $tbl")
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("compactBucketed: pairs parity across a mid-stream fold, replayed " +
      "duplicates removed, folded-all table one file per bucket with a " +
      "sort-free exchange-free store side, interrupted swap resumes") {
    import graft.streaming.DocIngest
    import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

    // own session: the plan leg disables auto-broadcast (emulating
    // corpus-scale statistics) without touching concurrent suites
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("bktcompact").toString
    val tbl = "graft_test_bktcmp_sigs"
    val ctlTbl = "graft_test_bktcmp_ctl"
    Seq(tbl, ctlTbl, s"${tbl}__compact", s"${tbl}__old")
      .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val chunks = (0 until 4).map(i =>
        docs.filter(pmod(col("doc_id"), lit(4)) === i))
      val ctl = s"$tmp/ctl"; val bkt = s"$tmp/bkt"
      def ing(c: Int, dir: String, t: String, b: Long): Unit =
        DocIngest.ingestBatchBucketed(chunks(c), dir, t, tau = 0.8,
          batchId = b, buckets = 8)
      def pairsOf(d: String) = DocIngest.pairs(s2, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // control: never compacted (batches 0..2 now, batch 3 later)
      (0 until 3).foreach(i => ing(i, ctl, ctlTbl, i.toLong))
      // compacted store: fold after batch 1 (with a replayed duplicate
      // append the fold must remove), again after batch 2, batch 3 last
      ing(0, bkt, tbl, 0L); ing(1, bkt, tbl, 1L)
      ing(1, bkt, tbl, 1L) // replayed append: duplicate rows, same batch_id
      DocIngest.compactBucketed(s2, tbl, upToBatch = 1L, buckets = 8)
      ing(2, bkt, tbl, 2L)
      assert(pairsOf(bkt) == pairsOf(ctl), "mid-stream fold changed the pairs")
      // replay AFTER the fold: batch 2 > upToBatch re-runs — no drift
      ing(2, bkt, tbl, 2L)
      assert(pairsOf(bkt) == pairsOf(ctl), "replay after fold drifted")
      // layout: batches 0,1 folded into 1; batch 2 kept (two appends)
      val parts = s2.table(tbl).select("batch_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(parts == Set(1L, 2L), s"partitions after fold: $parts")
      val folded1 = s2.table(tbl).filter(col("batch_id") === 1L)
      assert(folded1.count() == folded1.distinct().count(),
        "fold kept the replayed duplicate rows")

      // fold EVERYTHING → one partition with ONE file per bucket, and
      // the declared sortBy becomes exploitable (through the Maintenance
      // facade: parquet folds first, bucketed rebuild last)
      graft.streaming.Maintenance.compactDocStore(
        s2, bkt, upToBatch = 2L, sigsTable = Some(tbl), buckets = 8)
      val loc = s2.sql(s"DESCRIBE FORMATTED $tbl").collect()
        .find(_.getString(0).trim == "Location").get.getString(1)
      val dataFiles = {
        val it = java.nio.file.Files.walk(
          java.nio.file.Paths.get(new java.net.URI(loc)))
        try it.filter(p => p.getFileName.toString.startsWith("part-")).count()
        finally it.close()
      }
      assert(dataFiles <= 8L && dataFiles >= 1L,
        s"expected at most one file per bucket, got $dataFiles")

      // THE claim the rebuild unlocks: with auto-broadcast off the
      // candidate join's store side reads the bucketed table with
      // neither an exchange NOR a sort (single-file buckets satisfy the
      // SMJ's ordering requirement from the declared sortBy)
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val self = p match {
          case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
          case _ => Seq(p) ++ p.children.flatMap(nodes)
        }
        self ++ p.subqueries.flatMap(nodes)
      }
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newKeys = graft.ext.Dedup.signatures(chunks(0), "doc_id", "text")
        .select("doc_id", "band", "key").localCheckpoint(eager = true)
      val cand = DocIngest.bucketedCandidates(s2, tbl, newKeys, batchId = 99L)
      val joins = nodes(cand.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      val scanSides = joins.flatMap(_.children).filter(c =>
        nodes(c).exists(_.isInstanceOf[FileSourceScanExec]))
      assert(scanSides.nonEmpty,
        "expected the sigs table scan under a shuffled candidate join")
      assert(scanSides.forall(c =>
        !nodes(c).exists(_.isInstanceOf[ShuffleExchangeExec])),
        "the post-compact index side pays an exchange")
      assert(scanSides.forall(c =>
        !nodes(c).exists(_.isInstanceOf[SortExec])),
        "the post-compact index side re-sorts — bucket sort not exploited")
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      // interrupted swap: live table renamed away, rebuild present — the
      // next call finishes the rename pair instead of refolding
      s2.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__compact")
      DocIngest.compactBucketed(s2, tbl, upToBatch = 2L, buckets = 8)
      assert(s2.catalog.tableExists(tbl) &&
        !s2.catalog.tableExists(s"${tbl}__compact"),
        "interrupted swap did not resume")

      // post-fold ingest: batch 3 against the folded index — parity with
      // the never-compacted control
      ing(3, ctl, ctlTbl, 3L)
      ing(3, bkt, tbl, 3L)
      assert(pairsOf(bkt) == pairsOf(ctl), "post-fold ingest drifted")
      assert(pairsOf(ctl).nonEmpty, "fixture should contain planted near-dups")

      // supersede: same doc ids re-ingested with new text, folded — the
      // index holds exactly the latest text's signature set
      val supTbl = "graft_test_bktcmp_sup"
      val oneTbl = "graft_test_bktcmp_one"
      Seq(supTbl, oneTbl).foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
      val rev2 = chunks(0).withColumn("text", concat($"text", lit(" rev2")))
      DocIngest.ingestBatchBucketed(chunks(0), s"$tmp/sup", supTbl,
        tau = 0.8, batchId = 0L, buckets = 8)
      DocIngest.ingestBatchBucketed(rev2, s"$tmp/sup", supTbl,
        tau = 0.8, batchId = 1L, buckets = 8)
      DocIngest.compactBucketed(s2, supTbl, upToBatch = 1L, buckets = 8)
      DocIngest.ingestBatchBucketed(rev2, s"$tmp/one", oneTbl,
        tau = 0.8, batchId = 0L, buckets = 8)
      def sigSet(t: String) = s2.table(t).drop("batch_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(sigSet(supTbl) == sigSet(oneTbl),
        "folded index != the latest text's signature set (supersede broke)")
      Seq(supTbl, oneTbl).foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
    } finally {
      Seq(tbl, ctlTbl, s"${tbl}__compact", s"${tbl}__old")
        .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("swap-window reads RESUME or fail LOUD — never an empty index " +
      "(red path: live table absent with a swap sibling present)") {
    import graft.streaming.{DocIngest, StoreCompact}

    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("swapred").toString
    val tbl = "graft_test_swapred_sigs"
    val ghost = "graft_test_swapred_nosuch"
    Seq(tbl, ghost).flatMap(t => Seq(t, s"${t}__compact", s"${t}__old"))
      .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val chunks = (0 until 3).map(i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i))
      (0 until 2).foreach(i => DocIngest.ingestBatchBucketed(
        chunks(i), s"$tmp/bkt", tbl, tau = 0.8, batchId = i.toLong,
        buckets = 8))
      val newKeys = graft.ext.Dedup.signatures(chunks(2), "doc_id", "text")
        .select("doc_id", "band", "key").localCheckpoint(eager = true)
      def candSet = DocIngest
        .bucketedCandidates(s2, tbl, newKeys, batchId = 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = candSet
      // what the pre-r14 behavior would silently emit mid-swap: the
      // new × new candidates only (computed against a never-created
      // name — the ONE state where an absent table legitimately means
      // an empty index)
      val reduced = DocIngest
        .bucketedCandidates(s2, ghost, newKeys, batchId = 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reduced != full,
        "fixture must make the empty-index read observable " +
          "(no cross-batch candidates?)")

      // (1) mid-swap window: live name absent, complete rebuild present
      // — the read RESUMES (finishes the rename pair) and returns the
      // full candidate set, never the reduced one
      s2.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__compact")
      assert(candSet == full, "mid-swap read did not resume the full index")
      assert(s2.catalog.tableExists(tbl) &&
        !s2.catalog.tableExists(s"${tbl}__compact"),
        "mid-swap read did not finish the rename pair")

      // (2) crashed before the rebuild finished: only __old present —
      // the read restores the pre-fold table
      s2.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__old")
      assert(candSet == full, "crashed-swap read did not restore the index")
      assert(s2.catalog.tableExists(tbl) &&
        !s2.catalog.tableExists(s"${tbl}__old"),
        "crashed-swap read did not restore the live name")

      // (3) the WRITE guard: a swap racing the batch between the read
      // and the append must not re-create the live name over the
      // rebuild (which the next fold would drop as stale — the whole
      // index silently lost); it throws instead
      s2.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__compact")
      val ex = intercept[IllegalStateException] {
        StoreCompact.appendToBucketedIndex(s2, tbl,
          newKeys.withColumn("batch_id", lit(9L)), buckets = 8,
          bucketCols = Seq("band", "key"))
      }
      assert(ex.getMessage.contains("refusing to re-create"))
      StoreCompact.resumeSwap(s2, tbl)
      assert(s2.catalog.tableExists(tbl), "explicit resume failed")

      // (4) None ONLY when genuinely never created (first-batch case)
      assert(StoreCompact.liveIndexTable(s2, ghost).isEmpty)

      // (5) the Maintenance facade resumes BEFORE folding: an
      // interrupted swap left on disk, then one facade call both
      // finishes the swap and folds everything — same full candidates
      s2.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__compact")
      graft.streaming.Maintenance.compactDocStore(
        s2, s"$tmp/bkt", upToBatch = 1L, sigsTable = Some(tbl), buckets = 8)
      assert(s2.catalog.tableExists(tbl) &&
        !s2.catalog.tableExists(s"${tbl}__compact"),
        "facade did not resume the interrupted swap before folding")
      assert(candSet == full, "facade maintenance changed the candidates")

      // (6) the APPEND-side race guard (r14 ADVICE): the exists check
      // and the append commit are not atomic — a swap sibling observed
      // right after a "successful" append means a fold raced the write
      // (or crashed debris is indistinguishable from one), and the
      // append must fail LOUDLY so the batch replays, never acknowledge
      // rows a landing swap may drop
      s2.sql(s"CREATE TABLE ${tbl}__old AS SELECT * FROM $tbl LIMIT 1")
      val exA = intercept[IllegalStateException] {
        StoreCompact.appendToBucketedIndex(s2, tbl,
          newKeys.withColumn("batch_id", lit(10L)), buckets = 8,
          bucketCols = Seq("band", "key"))
      }
      assert(exA.getMessage.contains("raced this batch's index append"))
      s2.sql(s"DROP TABLE ${tbl}__old")
    } finally {
      Seq(tbl, ghost).flatMap(t => Seq(t, s"${t}__compact", s"${t}__old"))
        .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("bucketed DocIngest killed mid-crash-window and RESUMED from its " +
      "checkpoint: batch 1 replays, pairs stay exact, the replay's " +
      "duplicate index rows exist until the fold removes them") {
    import graft.streaming.DocIngest

    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("bktrestart").toString
    val tbl = "graft_test_bktrst_sigs"
    s2.sql(s"DROP TABLE IF EXISTS $tbl")
    val inDir = s"$tmp/in"; val store = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
    new java.io.File(inDir).mkdirs()
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      def stage(b: Long): Unit = {
        val staging = s"$tmp/stage$b"
        docs.filter(pmod(col("doc_id"), lit(3)) === b)
          .coalesce(1).write.parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$inDir/chunk$b.parquet"))
      }
      val q1 = DocIngest.startBucketed(s2, inDir, store, tbl, ckpt,
        buckets = 8)
      try {
        stage(0L); q1.processAllAvailable()
        stage(1L); q1.processAllAvailable()
      } finally q1.stop()

      // crash window: batch 1's output landed but its commit marker is
      // gone — the resumed query MUST replay batch 1 before batch 2
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$ckpt/commits/1"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$ckpt/commits/.1.crc"))
      stage(2L)
      val preRows = s2.table(tbl).count()
      val q2 = DocIngest.startBucketed(s2, inDir, store, tbl, ckpt,
        buckets = 8)
      try q2.processAllAvailable() finally q2.stop()

      // the replay leg actually fired: batch 1's second append left
      // duplicate (doc_id, band, key, batch_id) rows in the index.
      // (refresh first: the appends ran in the stream's CLONED session,
      // and s2's cached relation still lists the pre-restart files)
      s2.catalog.refreshTable(tbl)
      val postRows = s2.table(tbl).count()
      val postDistinct = s2.table(tbl).distinct().count()
      assert(postRows > preRows, "restart did not process anything")
      assert(postRows > postDistinct,
        "no duplicate index rows — batch 1 never replayed, the " +
          "at-least-once leg is vacuous")

      // pairs are exactly the batch near-dup set despite the replay
      val got = DocIngest.pairs(s2, store)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = graft.ext.Dedup.nearDupMinhash(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expect.nonEmpty, "fixture should contain planted near-dups")
      assert(got == expect, "replay drifted the accumulated pairs")

      // the fold removes the replay's duplicates: zero dup rows remain
      graft.streaming.Maintenance.compactDocStore(
        s2, store, upToBatch = 2L, sigsTable = Some(tbl), buckets = 8)
      val folded = s2.table(tbl).count()
      assert(folded == s2.table(tbl).distinct().count(),
        "fold left duplicate signature rows in the index")
      assert(DocIngest.pairs(s2, store)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expect,
        "fold after restart changed the pairs")
    } finally {
      s2.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = java.nio.file.Paths.get(tmp)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("two-session maintenance race: resume from one session and the " +
      "fold entry from another converge on the live table, no index " +
      "rows lost, in either interleaving") {
    import graft.streaming.{DocIngest, StoreCompact}

    val sA = spark.newSession(); val sB = spark.newSession()
    val tbl = "graft_test_race_sigs"
    Seq(tbl, s"${tbl}__compact", s"${tbl}__old")
      .foreach(t => sA.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = Tables.load(sA, sf(), "documents")
        .select("doc_id", "text")
      val sigs = graft.ext.Dedup.signatures(docs, "doc_id", "text")
        .select("doc_id", "band", "key").distinct()
        .localCheckpoint(eager = true)
      // two identical appends under batch ids 0/1: the latest-wins fold
      // must keep exactly one signature set per doc — `expectRows`
      val expectRows = sigs.count()
      def seed(): Unit =
        (0 until 2).foreach { b =>
          StoreCompact.appendToBucketedIndex(sA, tbl,
            sigs.withColumn("batch_id", lit(b.toLong)), buckets = 8,
            bucketCols = Seq("band", "key"))
        }

      // interleaving 1: crash mid-swap (rebuild durable, live absent),
      // session A resumes, session B then runs the FOLD entry — B must
      // see A's resumed table and fold it, not trip over siblings
      seed()
      sA.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__compact")
      StoreCompact.resumeSwap(sA, tbl)
      DocIngest.compactBucketed(sB, tbl, upToBatch = 1L, buckets = 8)
      assert(sB.catalog.tableExists(tbl) &&
        !sB.catalog.tableExists(s"${tbl}__compact") &&
        !sB.catalog.tableExists(s"${tbl}__old"),
        "interleaving 1 did not converge to the live table alone")
      assert(sB.table(tbl).count() == expectRows,
        "interleaving 1 lost index rows")

      // interleaving 2: same crash, but the FOLD entry (B) arrives
      // FIRST — it resumes and returns; A's explicit resume is then a
      // no-op; a second fold from A completes normally
      sA.sql(s"DROP TABLE $tbl")
      seed()
      sA.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__compact")
      DocIngest.compactBucketed(sB, tbl, upToBatch = 1L, buckets = 8)
      StoreCompact.resumeSwap(sA, tbl)
      DocIngest.compactBucketed(sA, tbl, upToBatch = 1L, buckets = 8)
      assert(sA.catalog.tableExists(tbl) &&
        !sA.catalog.tableExists(s"${tbl}__compact") &&
        !sA.catalog.tableExists(s"${tbl}__old"),
        "interleaving 2 did not converge to the live table alone")
      assert(sA.table(tbl).count() == expectRows,
        "interleaving 2 lost index rows")
    } finally {
      Seq(tbl, s"${tbl}__compact", s"${tbl}__old")
        .foreach(t => sA.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ImageIngest bucketed fingerprint index: pairs parity with the " +
      "batch dHash answer, replay benign, fold preserves pairs and " +
      "dedups the index, no store-side exchange") {
    import graft.streaming.ImageIngest
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("imgingest").toString
    val tbl = "graft_test_img_fps"
    s2.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val chunks = (0 until 3).map(i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i))
      val store = s"$tmp/store"
      chunks.zipWithIndex.foreach { case (c, i) =>
        ImageIngest.ingestBatchBucketed(c, store, tbl, maxHamming = 3,
          batchId = i.toLong, buckets = 8)
      }
      def pairsNow = ImageIngest.pairs(s2, store)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val batchPairs = graft.multimodal.ImageDedup.nearDupDHash(
          graft.multimodal.MediaSynth.withPgmPayload(
            docs.select(col("doc_id")), "doc_id")(s2),
          "doc_id", "payload")(s2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(pairsNow == batchPairs,
        "incremental pairs diverge from the batch dHash answer")
      assert(batchPairs.nonEmpty, "fixture should contain planted near-dups")

      // append-only replay: batch 2 re-runs against the pre-batch index
      ImageIngest.ingestBatchBucketed(chunks(2), store, tbl, maxHamming = 3,
        batchId = 2L, buckets = 8)
      assert(pairsNow == batchPairs, "replay drifted the pairs")

      // the replay left duplicate index rows; the maintenance fold
      // removes them and preserves the pair log
      val dupesBefore = s2.table(tbl).groupBy("doc_id", "key").count()
        .filter(col("count") > 1).count()
      assert(dupesBefore > 0, "replay should have left duplicate index rows")
      graft.streaming.Maintenance.compactImageStore(s2, store, tbl,
        upToBatch = 2L, buckets = 8)
      assert(pairsNow == batchPairs, "fold changed the pairs")
      val dupesAfter = s2.table(tbl).groupBy("doc_id", "key").count()
        .filter(col("count") > 1).count()
      assert(dupesAfter == 0, "fold left duplicate fingerprint rows")

      // the scale claim (the q137 treatment): with auto-broadcast off,
      // the candidate join's index side reads the bucketed table with
      // NO exchange between scan and join. Do NOT descend into
      // subqueries here: Spark injects a runtime bloom filter on the
      // new side whose SUBQUERY re-scans the table (unbucketed, one
      // partial-agg pass) — that scan feeds might_contain, not the
      // join, and classifying through it would flag the new side's
      // perfectly correct |batch|-sized exchange as a store-side one.
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val self = p match {
          case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
          case _ => Seq(p) ++ p.children.flatMap(nodes)
        }
        self
      }
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newKeys = ImageIngest.fingerprints(chunks(0))
        .localCheckpoint(eager = true)
      val cand = ImageIngest.bucketedCandidates(s2, tbl, newKeys,
        maxHamming = 3, batchId = 99L)
      val joins = nodes(cand.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      val scanSides = joins.flatMap(_.children).filter(c =>
        nodes(c).exists(_.isInstanceOf[FileSourceScanExec]))
      assert(scanSides.nonEmpty,
        "expected the fps table scan under a shuffled candidate join")
      val bad = scanSides.filter(c =>
        nodes(c).exists(_.isInstanceOf[ShuffleExchangeExec]))
      assert(bad.isEmpty,
        "the bucketed index side pays an exchange — bucketing not engaged")
    } finally {
      s2.sql(s"DROP TABLE IF EXISTS $tbl")
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("AudioIngest bucketed fingerprint index: pairs parity with the " +
      "batch energy-delta answer, replay benign, fold preserves pairs " +
      "and dedups the index, no store-side exchange") {
    import graft.streaming.AudioIngest
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("audingest").toString
    val tbl = "graft_test_aud_fps"
    s2.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val chunks = (0 until 3).map(i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i))
      val store = s"$tmp/store"
      chunks.zipWithIndex.foreach { case (c, i) =>
        AudioIngest.ingestBatchBucketed(c, store, tbl, maxHamming = 3,
          batchId = i.toLong, buckets = 8)
      }
      def pairsNow = AudioIngest.pairs(s2, store)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val batchPairs = graft.multimodal.AudioDedup.nearDupAudio(
          graft.multimodal.MediaSynth.withWavMotifPayload(
            docs.select(col("doc_id")), "doc_id")(s2),
          "doc_id", "payload")(s2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(pairsNow == batchPairs,
        "incremental pairs diverge from the batch fingerprint answer")
      assert(batchPairs.nonEmpty, "fixture should contain planted near-dups")

      // append-only replay: batch 2 re-runs against the pre-batch index
      AudioIngest.ingestBatchBucketed(chunks(2), store, tbl, maxHamming = 3,
        batchId = 2L, buckets = 8)
      assert(pairsNow == batchPairs, "replay drifted the pairs")

      // the replay left duplicate index rows; the maintenance fold
      // removes them and preserves the pair log
      val dupesBefore = s2.table(tbl).groupBy("doc_id", "key").count()
        .filter(col("count") > 1).count()
      assert(dupesBefore > 0, "replay should have left duplicate index rows")
      graft.streaming.Maintenance.compactAudioStore(s2, store, tbl,
        upToBatch = 2L, buckets = 8)
      assert(pairsNow == batchPairs, "fold changed the pairs")
      val dupesAfter = s2.table(tbl).groupBy("doc_id", "key").count()
        .filter(col("count") > 1).count()
      assert(dupesAfter == 0, "fold left duplicate fingerprint rows")

      // the scale claim, shared FpIngest machinery (see the image leg
      // for why subqueries stay out of the node walk)
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val self = p match {
          case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
          case _ => Seq(p) ++ p.children.flatMap(nodes)
        }
        self
      }
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newKeys = AudioIngest.fingerprints(chunks(0))
        .localCheckpoint(eager = true)
      val cand = graft.streaming.FpIngest.candidates(s2, tbl, newKeys,
        maxHamming = 3, batchId = 99L)
      val joins = nodes(cand.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      val scanSides = joins.flatMap(_.children).filter(c =>
        nodes(c).exists(_.isInstanceOf[FileSourceScanExec]))
      assert(scanSides.nonEmpty,
        "expected the fps table scan under a shuffled candidate join")
      val bad = scanSides.filter(c =>
        nodes(c).exists(_.isInstanceOf[ShuffleExchangeExec]))
      assert(bad.isEmpty,
        "the bucketed index side pays an exchange — bucketing not engaged")
    } finally {
      s2.sql(s"DROP TABLE IF EXISTS $tbl")
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("VideoIngest multi-fingerprint index: pairs parity with the " +
      "batch aligned-frame answer, replay benign (frame-row distinct), " +
      "fold preserves pairs and dedups the index, eviction drops whole " +
      "clips, no store-side exchange") {
    import graft.streaming.VideoIngest
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("vidingest").toString
    val tbl = "graft_test_vid_fps"
    s2.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val chunks = (0 until 3).map(i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i))
      val store = s"$tmp/store"
      chunks.zipWithIndex.foreach { case (c, i) =>
        VideoIngest.ingestBatchBucketed(c, store, tbl, maxTotalHamming = 3,
          batchId = i.toLong, buckets = 8)
      }
      def pairsNow = VideoIngest.pairs(s2, store)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val batchPairs = graft.multimodal.VideoDedup.nearDupVideo(
          graft.multimodal.MediaSynth.withGifMotifPayload(
            docs.select(col("doc_id")), "doc_id")(s2),
          "doc_id", "payload")(s2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(pairsNow == batchPairs,
        "incremental pairs diverge from the batch aligned-frame answer")
      assert(batchPairs.nonEmpty, "fixture should contain planted near-dups")

      // append-only replay: batch 2 re-runs against the pre-batch index.
      // The duplicate frame rows this leaves would DOUBLE-COUNT the
      // clip-level Hamming sums without frameCandidates' frame-row
      // distinct — this is the multi-fp contract the single-fp families
      // get for free from their pair distinct
      VideoIngest.ingestBatchBucketed(chunks(2), store, tbl,
        maxTotalHamming = 3, batchId = 2L, buckets = 8)
      assert(pairsNow == batchPairs, "replay drifted the pairs")

      // the replay left duplicate index rows; the maintenance fold
      // removes them and preserves the pair log
      val dupesBefore = s2.table(tbl).groupBy("doc_id", "f", "key").count()
        .filter(col("count") > 1).count()
      assert(dupesBefore > 0, "replay should have left duplicate index rows")
      graft.streaming.Maintenance.compactVideoStore(s2, store, tbl,
        upToBatch = 2L, buckets = 8)
      assert(pairsNow == batchPairs, "fold changed the pairs")
      val dupesAfter = s2.table(tbl).groupBy("doc_id", "f", "key").count()
        .filter(col("count") > 1).count()
      assert(dupesAfter == 0, "fold left duplicate fingerprint rows")

      // eviction is per-CLIP even though the store is per-frame rows:
      // latestWinsPerKey is per-row, so a clip's whole frame set leaves
      // together — no orphan frames survive below the horizon
      graft.streaming.Maintenance.compactVideoStore(s2, store, tbl,
        upToBatch = 2L, evictBelow = 3L, buckets = 8)
      assert(s2.table(tbl).count() == 0,
        "eviction below the horizon should have emptied the index")
      assert(pairsNow == batchPairs, "eviction rewired the emitted pairs")

      // the scale claim, FpIngest frame machinery: the candidate key
      // join reads the store side from the bucketed table with NO
      // exchange (see the image leg for why subqueries stay out of the
      // node walk)
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val self = p match {
          case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
          case _ => Seq(p) ++ p.children.flatMap(nodes)
        }
        self
      }
      s2.sql(s"DROP TABLE IF EXISTS $tbl")
      VideoIngest.ingestBatchBucketed(chunks(0), store, tbl,
        maxTotalHamming = 3, batchId = 0L, buckets = 8)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newKeyed = VideoIngest.frameFingerprints(chunks(1))
        .localCheckpoint(eager = true)
      val cand = graft.streaming.FpIngest.frameCandidatePairs(s2, tbl,
        newKeyed, batchId = 99L)
      val joins = nodes(cand.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      val scanSides = joins.flatMap(_.children).filter(c =>
        nodes(c).exists(_.isInstanceOf[FileSourceScanExec]))
      assert(scanSides.nonEmpty,
        "expected the fps table scan under a shuffled candidate join")
      val bad = scanSides.filter(c =>
        nodes(c).exists(_.isInstanceOf[ShuffleExchangeExec]))
      assert(bad.isEmpty,
        "the bucketed index side pays an exchange — bucketing not engaged")
    } finally {
      s2.sql(s"DROP TABLE IF EXISTS $tbl")
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("FpIngest multi-fp guards (r17 ADVICE): completeness require " +
      "fails fast at radius > blocks-1, re-ingest with a changed frame " +
      "set resolves latest-batch-wins before any fold") {
    import graft.streaming.FpIngest
    val s2 = spark.newSession()
    import s2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fpadvice").toString
    val tbl = "graft_test_fp_advice"
    s2.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      def keyed(rows: Seq[(Long, Int, Long, Long)]) =
        FpIngest.keyedFrames(rows.toDF("doc_id", "f", "nf", "fp"))
      // batch-path parity: nearDupVideo's pigeonhole guard now fails
      // fast on the streaming path too instead of silently missing pairs
      intercept[IllegalArgumentException] {
        FpIngest.frameCandidates(s2, tbl, keyed(Seq((1L, 0, 1L, 5L))),
          maxTotalHamming = 4, batchId = 0L)
      }
      // doc 1 v1: two frames; v2 (changed frame set, nf 2 -> 1) lands
      // under a later batch id with NO fold in between — the store now
      // holds doc 1 under two batch ids with differing nf
      FpIngest.ingestBatchFrames(
        keyed(Seq((1L, 0, 2L, 0x0fL), (1L, 1, 2L, 0xf0L))),
        s"$tmp/store", tbl, maxTotalHamming = 3, batchId = 0L, buckets = 4)
      FpIngest.ingestBatchFrames(
        keyed(Seq((1L, 0, 1L, 0xffL))),
        s"$tmp/store", tbl, maxTotalHamming = 3, batchId = 1L, buckets = 4)
      // doc 2 matches v2 exactly; v1's stale rows must neither fan out
      // the count join nor pollute the aligned Hamming sum
      FpIngest.ingestBatchFrames(
        keyed(Seq((2L, 0, 1L, 0xffL))),
        s"$tmp/store", tbl, maxTotalHamming = 3, batchId = 2L, buckets = 4)
      val got = FpIngest.pairs(s2, s"$tmp/store")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 2L, 0L)),
        s"latest-batch-wins resolution violated: $got")
    } finally s2.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("CurationIngest composed chain: verdict matches the batch q164 " +
      "result, replay benign across all three legs, fold consolidates " +
      "the gate store, eviction drops pairing state but never verdict " +
      "coverage") {
    import graft.streaming.CurationIngest
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("curingest").toString
    val imgTbl = "graft_test_cur_img"; val audTbl = "graft_test_cur_aud"
    s2.sql(s"DROP TABLE IF EXISTS $imgTbl")
    s2.sql(s"DROP TABLE IF EXISTS $audTbl")
    try {
      val docs = Tables.load(s2, sf(), "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val chunks = (0 until 3).map(i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i))
      val store = s"$tmp/store"
      chunks.zipWithIndex.foreach { case (c, i) =>
        CurationIngest.ingestBatchBucketed(c, store, imgTbl, audTbl,
          maxHamming = 3, batchId = i.toLong, buckets = 8)
      }
      def verdictNow = CurationIngest.verdict(s2, store)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val batch = SparkEntry.queries("q164_multimodal_curation")(s2, sf())
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val v0 = verdictNow
      assert(v0 == batch,
        "incremental verdict diverges from the batch q164 assembly")
      assert(v0.nonEmpty && v0.values.exists(_._4 == 0L) &&
        v0.values.exists(_._4 == 1L), "verdict should discriminate")

      // at-least-once replay re-runs the WHOLE composed batch body:
      // the gate store's partition overwrite replaces batch 2's rows,
      // both index replays collapse in their candidate distincts
      CurationIngest.ingestBatchBucketed(chunks(2), store, imgTbl, audTbl,
        maxHamming = 3, batchId = 2L, buckets = 8)
      assert(verdictNow == v0, "replay drifted the composed verdict")

      // fold: verdict preserved, gate store consolidated to the fold
      // horizon's single partition with no row loss
      val gateCount = s2.read.parquet(s"$store/gate").count()
      graft.streaming.Maintenance.compactCurationStore(s2, store,
        imgTbl, audTbl, upToBatch = 2L, buckets = 8)
      assert(verdictNow == v0, "fold changed the composed verdict")
      val gateDirs = new java.io.File(s"$store/gate").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
      assert(gateDirs == Set("batch_id=2"),
        s"gate store not consolidated: $gateDirs")
      assert(s2.read.parquet(s"$store/gate").count() == gateCount,
        "fold lost gate rows")

      // eviction drops PAIRING state (both fingerprint indexes) but
      // never verdict coverage: gate rows and emitted pairs are
      // output, so the verdict is byte-identical even at a horizon
      // that empties both indexes
      graft.streaming.Maintenance.compactCurationStore(s2, store,
        imgTbl, audTbl, upToBatch = 2L, evictBelow = 3L, buckets = 8)
      assert(s2.table(imgTbl).count() == 0 && s2.table(audTbl).count() == 0,
        "eviction below the horizon should empty both indexes")
      assert(verdictNow == v0, "eviction rewired the verdict")
    } finally {
      s2.sql(s"DROP TABLE IF EXISTS $imgTbl")
      s2.sql(s"DROP TABLE IF EXISTS $audTbl")
    }
  }

  test("file-source stream reads the fixture directory") {
    val tmp = java.nio.file.Files.createTempDirectory("evstream").toString
    // stage the fixture file into a stream-watched dir
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf() + "/events.parquet"),
      java.nio.file.Paths.get(tmp + "/events.parquet"))
    val q = EventStream.tumblingAgg(EventStream.readEventsStream(spark, tmp))
      .writeStream.format("memory").queryName("filestream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("filestream").agg(sum("n")).head().getLong(0)
      assert(n == Tables.load(spark, sf(), "events").count())
    } finally q.stop()
  }

  test("EmbIngest/PqIngest compact: results identical, partitions folded, re-delivery superseded") {
    import graft.ext.Similarity
    import graft.streaming.{EmbIngest, PqIngest}
    val tmp = java.nio.file.Files.createTempDirectory("ingcompact").toString
    val emb = Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", $"embedding", $"label").cache()
    val cents = Similarity.kmeansFixedCentroids(
      emb, "vec_id", "embedding", nCentroids = 16, iters = 3, seed = 42L)
    val cSeq = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    val tau = 300000000000L
    val preds = Seq($"vec_id" % 3 === 0, $"vec_id" % 3 === 1, $"vec_id" % 3 === 2)

    // EmbIngest: compacted mid-stream vs never-compacted control — the
    // verdicts depend on arrival order, so equality is exact parity
    for ((dir, doCompact) <- Seq(s"$tmp/ectl" -> false, s"$tmp/ecmp" -> true)) {
      preds.zipWithIndex.foreach { case (p, i) =>
        EmbIngest.ingestBatch(emb.filter(p), dir, cSeq, tau, batchId = i.toLong)
        if (doCompact && i == 1) EmbIngest.compact(spark, dir, upToBatch = 1L)
      }
    }
    def embRead(d: String) = EmbIngest.result(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(embRead(s"$tmp/ecmp") === embRead(s"$tmp/ectl"),
      "EmbIngest compaction changed the verdicts")
    val eParts = new java.io.File(s"$tmp/ecmp/items").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(eParts == Set("batch_id=1", "batch_id=2"), s"items partitions: $eParts")

    // source RE-SEND (same vectors under a NEW batch id): result() must
    // surface each vec_id ONCE (the latest verdict), and compaction must
    // leave the read unchanged — the max_by read and the latest-wins
    // fold pick the same row
    EmbIngest.ingestBatch(emb.filter(preds(0)), s"$tmp/ectl", cSeq, tau,
      batchId = 3L)
    assert(EmbIngest.result(spark, s"$tmp/ectl").count() == emb.count(),
      "re-delivered vectors surfaced more than once")
    val resent = embRead(s"$tmp/ectl")
    EmbIngest.compact(spark, s"$tmp/ectl", upToBatch = 3L)
    assert(embRead(s"$tmp/ectl") === resent,
      "compaction changed result() for re-delivered keys")

    // PqIngest: re-deliver chunk 0 under a new batch id, compact over it —
    // the folded store holds ONE row per vector and serves the same index
    val books = Similarity.pqCodebooksFixed(emb, "vec_id", "embedding")
    val bSeq = books.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .toSeq.sortBy(b => (b._1, b._2))
    val pq = s"$tmp/pq"
    preds.zipWithIndex.foreach { case (p, i) =>
      PqIngest.ingestBatch(emb.filter(p), pq, bSeq, batchId = i.toLong) }
    PqIngest.ingestBatch(emb.filter(preds(0)), pq, bSeq, batchId = 3L) // re-send
    def pqRead() = PqIngest.result(spark, pq).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val before = pqRead()
    assert(before === Similarity.pqAssignCodes(emb, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
    PqIngest.compact(spark, pq, upToBatch = 3L)
    assert(pqRead() === before, "PqIngest compaction changed the code index")
    val rows = spark.read.parquet(s"$pq/codes").count()
    assert(rows == emb.count(),
      s"folded store must hold one row per vector, got $rows")
  }

  test("EmbIngest bucketed item index: verdict parity with the plain " +
      "store, replay benign, fold to one file per bucket leaves the " +
      "in-cluster join's index side with neither exchange nor sort") {
    import graft.ext.Similarity
    import graft.streaming.EmbIngest
    import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("embbkt").toString
    val tbl = "graft_test_embbkt_items"
    Seq(tbl, s"${tbl}__compact", s"${tbl}__old")
      .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val emb = Tables.load(s2, sf(), "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
        .localCheckpoint(eager = true)
      val cents = Similarity.kmeansFixedCentroids(
        emb, "vec_id", "embedding", nCentroids = 16, iters = 3, seed = 42L)
      val cSeq = cents.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
      val tau = 300000000000L
      val chunks = (0 until 3).map(i =>
        emb.filter(pmod(col("vec_id"), lit(3)) === i))
      val ctl = s"$tmp/ctl"; val bkt = s"$tmp/bkt"
      chunks.zipWithIndex.foreach { case (c, i) =>
        EmbIngest.ingestBatch(c, ctl, cSeq, tau, batchId = i.toLong)
        EmbIngest.ingestBatchBucketed(c, bkt, tbl, cSeq, tau,
          batchId = i.toLong, buckets = 8)
      }
      def read(d: String) = EmbIngest.result(s2, d).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val ctlRead = read(ctl)
      assert(read(bkt) === ctlRead, "bucketed index changed the verdicts")
      assert(ctlRead.values.exists(_._3 == 0L),
        "fixture should contain planted semantic near-dups")

      // replay: batch 2 re-runs — verdict partition overwrites, the
      // duplicate index rows its second append leaves are collapsed by
      // the count_distinct; verdicts must not drift
      EmbIngest.ingestBatchBucketed(chunks(2), bkt, tbl, cSeq, tau,
        batchId = 2L, buckets = 8)
      assert(read(bkt) === ctlRead, "replay drifted the verdicts")

      // fold everything: one file per bucket, duplicates gone, verdicts
      // unchanged
      EmbIngest.compactBucketed(s2, tbl, upToBatch = 2L, buckets = 8)
      assert(read(bkt) === ctlRead, "fold changed the verdicts")
      assert(s2.table(tbl).count() == emb.count(),
        "folded index must hold one row per vector")
      val loc = s2.sql(s"DESCRIBE FORMATTED $tbl").collect()
        .find(_.getString(0).trim == "Location").get.getString(1)
      val dataFiles = {
        val it = java.nio.file.Files.walk(
          java.nio.file.Paths.get(new java.net.URI(loc)))
        try it.filter(p => p.getFileName.toString.startsWith("part-")).count()
        finally it.close()
      }
      assert(dataFiles <= 8L && dataFiles >= 1L,
        s"expected at most one file per bucket, got $dataFiles")

      // the scale claim: with auto-broadcast off the in-cluster pair
      // join's index side reads the bucketed table with neither an
      // exchange nor (post-fold) a sort
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val self = p match {
          case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
          case _ => Seq(p) ++ p.children.flatMap(nodes)
        }
        self ++ p.subqueries.flatMap(nodes)
      }
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val assigned = Similarity
        .assignFixed(chunks(0), "vec_id", "embedding", cents)
        .localCheckpoint(eager = true)
      val counts = EmbIngest.bucketedPriorCounts(s2, tbl, assigned, tau,
        batchId = 99L)
      val joins = nodes(counts.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      val scanSides = joins.flatMap(_.children).filter(c =>
        nodes(c).exists(_.isInstanceOf[FileSourceScanExec]))
      assert(scanSides.nonEmpty,
        "expected the items table scan under a shuffled in-cluster join")
      assert(scanSides.forall(c =>
        !nodes(c).exists(_.isInstanceOf[ShuffleExchangeExec])),
        "the bucketed item-index side pays an exchange")
      assert(scanSides.forall(c =>
        !nodes(c).exists(_.isInstanceOf[SortExec])),
        "the post-fold item-index side re-sorts — bucket sort not exploited")
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      // red path: the semantic read is swap-aware too — a mid-swap
      // absent table resumes to the full prior counts, never an
      // empty-index undercount
      def countMap = EmbIngest
        .bucketedPriorCounts(s2, tbl, assigned, tau, batchId = 99L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fullCounts = countMap
      s2.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__compact")
      assert(countMap == fullCounts,
        "mid-swap semantic read did not resume the full index")
      assert(s2.catalog.tableExists(tbl) &&
        !s2.catalog.tableExists(s"${tbl}__compact"),
        "mid-swap semantic read did not finish the rename pair")
    } finally {
      Seq(tbl, s"${tbl}__compact", s"${tbl}__old")
        .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
      s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("foreachBatch PQ coding equals the batch code index; replay idempotent") {
    import graft.streaming.PqIngest
    val tmp = java.nio.file.Files.createTempDirectory("pqingest").toString
    val inDir = s"$tmp/in"; val storeDir = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
    new java.io.File(inDir).mkdirs()

    val corpus = Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", $"embedding", $"label").cache()
    // the frozen model state: the same fit the batch twin memoises
    val books = graft.ext.Similarity.pqCodebooksFixed(
      corpus, "vec_id", "embedding")

    // arbitrary (non-id-ordered) chunks: coding is per-row, so parity
    // must hold under ANY arrival order
    val bounds = Seq(
      ($"vec_id" >= 40L, 0), ($"vec_id" < 20L, 1),
      ($"vec_id" >= 20L && $"vec_id" < 40L, 2))
    val q = PqIngest.start(spark, inDir, storeDir, ckpt, books)
    try {
      bounds.foreach { case (p, i) =>
        val staging = s"$tmp/stage$i"
        corpus.filter(p).coalesce(1).write.parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$inDir/chunk$i.parquet"))
        q.processAllAvailable()
      }
    } finally q.stop()

    val read = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val streamed = read(PqIngest.result(spark, storeDir))
    val batch = read(graft.ext.Similarity.pqAssignCodes(
      corpus, "vec_id", "embedding", books))
    assert(streamed.size == corpus.count())
    assert(streamed === batch)

    // at-least-once replay: re-running a micro-batch with its own
    // batchId must overwrite its earlier output, not append a copy
    val bSeq = books.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .toSeq.sortBy(b => (b._1, b._2))
    PqIngest.ingestBatch(spark.read.parquet(s"$inDir/chunk2.parquet"),
      storeDir, bSeq, batchId = 2L)
    assert(read(PqIngest.result(spark, storeDir)) === batch)

    // source RE-SEND (same vectors under a NEW batch id — not a
    // foreachBatch replay): the read-side per-vec_id dedup keeps the
    // store's surface identical, no duplicate (id, codes) rows
    PqIngest.ingestBatch(spark.read.parquet(s"$inDir/chunk0.parquet"),
      storeDir, bSeq, batchId = 7L)
    val afterResend = PqIngest.result(spark, storeDir)
    assert(afterResend.count() == corpus.count())
    assert(read(afterResend) === batch)
  }
}
