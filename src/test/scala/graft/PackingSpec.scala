package graft

import graft.ext.Packing
import graft.learn.DetRandom
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: the scale-safe layout equals the naive global
  * cumulative window, is partition-independent, and tiles the token
  * stream exactly. */
class PackingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf(), "documents")
    .select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_tok"))
    .filter(col("n_tok") > 0)

  private def layout(df: org.apache.spark.sql.DataFrame) =
    Packing.concatChunk(df, "doc_id", "n_tok", chunkTokens = 512L, seed = 7L)
      .select("doc_id", "start_off", "chunk_first", "chunk_last", "n_chunks")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("concatChunk: equals the naive global window, any input partitioning") {
    val naiveW = Window
      .orderBy(DetRandom.mix(col("doc_id"), col("doc_id"), 7L), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("start_off", sum(col("n_tok")).over(naiveW) - col("n_tok"))
      .select(col("doc_id"), col("start_off"),
        expr("start_off div 512").as("chunk_first"),
        expr("(start_off + n_tok - 1) div 512").as("chunk_last"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(3) - r.getLong(2) + 1)))
      .toMap
    assert(naive.nonEmpty)
    assert(layout(docs) === naive)
    assert(layout(docs.repartition(13)) === naive)
  }

  test("concatChunk: offsets tile the token stream with no gaps or overlaps") {
    val rows = Packing.concatChunk(docs, "doc_id", "n_tok", 512L, 7L)
      .select("start_off", "n_tok", "n_chunks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // consecutive documents are adjacent: next start = prev start + prev len
    rows.sliding(2).foreach {
      case Array((s1, w1, _), (s2, _, _)) => assert(s1 + w1 === s2)
      case _                              =>
    }
    assert(rows.head._1 === 0L)
    // a document spans ≥1 chunk; starting at worst 1 token before a
    // boundary, its remaining w-1 tokens fill at most (w-2)/512 + 1 more
    rows.foreach { case (_, w, c) =>
      assert(c >= 1L && c <= (w - 1) / 512L + 2L)
    }
    // total stream length is the sum of counts
    val total = rows.map(_._2).sum
    assert(rows.last._1 + rows.last._2 === total)
  }

  test("strideChunks: equals the naive window walk across every boundary case") {
    import spark.implicits._
    // 1 token, just-under/at/over one window, just-under/at/over the
    // two-window end (24 + 32 = 56), and a long doc; 0 tokens drops out
    val counts = Seq(1L, 8L, 31L, 32L, 33L, 55L, 56L, 57L, 100L, 0L)
    val df = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n_tok")
    // the window walk: emit [start, start+32) every 24 until the end
    // is covered — the sequential definition the closed form must match
    def naive(n: Long): Seq[(Long, Long, Long)] = {
      val b = Seq.newBuilder[(Long, Long, Long)]
      var g = 0L
      var again = n >= 1
      while (again) {
        b += ((g, g * 24L, math.min(32L, n - g * 24L)))
        if (g * 24L + 32L >= n) again = false else g += 1L
      }
      b.result()
    }
    val expected = counts.zipWithIndex.flatMap { case (n, i) =>
      naive(n).map { case (g, s, l) => (i.toLong, n, g, s, l) }
    }.toSet
    val got = Packing.strideChunks(df, "doc_id", "n_tok", 32L, 24L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // every chunk is non-empty and within the doc; overlap is 8 tokens
    got.foreach { case (_, n, g, s, l) =>
      assert(s === g * 24L && l >= 1L && s + l <= n)
    }
    // partition independence (pure row-local projection)
    val got7 = Packing.strideChunks(df.repartition(7), "doc_id", "n_tok",
      32L, 24L).as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got7 === got)
  }

  test("strideChunks: stride = window degenerates to disjoint tiling") {
    import spark.implicits._
    val df = Seq((1L, 65L)).toDF("doc_id", "n_tok")
    val got = Packing.strideChunks(df, "doc_id", "n_tok", 32L, 32L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(got === Seq((1L, 65L, 0L, 0L, 32L), (1L, 65L, 1L, 32L, 32L),
      (1L, 65L, 2L, 64L, 1L)))
  }

  test("shardLayout: equals the naive per-shard window, partition " +
      "independent, shards cover and partition the corpus") {
    val fixture = Tables.load(spark, sf(), "documents")
    val run = (df: org.apache.spark.sql.DataFrame) =>
      Packing.shardLayout(df, "doc_id", "text", shards = 8, seed = 42L)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    val got = run(fixture)

    val rows = fixture
      .select(col("doc_id"), graft.ext.Dedup.tokens(col("text")).as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).length.toLong))
    val naive = rows
      .map { case (id, n) =>
        (id, n, DetRandom.mixLong(id, id, 42L) % 8,
          DetRandom.mixLong(id, id, 43L))
      }
      .groupBy(_._3).toSeq.flatMap { case (shard, g) =>
        var cum = 0L
        g.sortBy(t => (t._4, t._1)).map { case (id, n, _, _) =>
          cum += n
          id -> (n, shard, cum - n, cum)
        }.toSeq
      }.toMap
    assert(got === naive)
    assert(got.values.map(_._2).toSet.size == 8,
      "fixture should populate every shard")
    assert(run(fixture.repartition(7)) === got)
  }

  /** Driver-side naive reconstruction of the shard sequences: tokenise,
    * group by the seeded shard draw, order by (order-hash, id), concat,
    * cut every `c` tokens — the sequential definition the distributed
    * plan must match. */
  private def naiveSequences(
      fixture: org.apache.spark.sql.DataFrame, c: Int)
      : Map[(Long, Long), (Long, Long, String)] = {
    val toks = fixture
      .select(col("doc_id"), graft.ext.Dedup.tokens(col("text")).as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    toks
      .map { case (id, ts) =>
        (DetRandom.mixLong(id, id, 42L) % 8, DetRandom.mixLong(id, id, 43L),
          id, ts)
      }
      .groupBy(_._1).toSeq.flatMap { case (shard, g) =>
        val stream = g.sortBy(t => (t._2, t._3))
          .flatMap { case (_, _, id, ts) => ts.map(tok => (id, tok)) }
        stream.zipWithIndex
          .groupBy { case (_, idx) => idx.toLong / c }
          .map { case (seqId, s) =>
            (shard, seqId) -> (s.map(_._1._1).distinct.length.toLong,
              s.length.toLong, s.map(_._1._2).mkString(" "))
          }
      }.toMap
  }

  test("shardSequences: equals the naive concat-and-cut per shard, and " +
      "the shardLayout ledger is its seek index") {
    val fixture = Tables.load(spark, sf(), "documents")
    val naive = naiveSequences(fixture, 64)
    val got = Packing
      .shardSequences(fixture, "doc_id", "text", shards = 8,
        seqTokens = 64L, seed = 42L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(got === naive)
    // non-vacuous: boundary straddlers exist (some sequence holds >1 doc)
    assert(got.values.exists(_._1 > 1L))
    // composition with the ledger: slicing the shard stream at a doc's
    // [start_off, start_off + n_tok) reproduces exactly that doc's tokens
    val stream = got.toSeq.groupBy(_._1._1).map { case (shard, seqs) =>
      shard -> seqs.sortBy(_._1._2).flatMap(_._2._3.split(" ")).toIndexedSeq
    }
    val ledger = Packing
      .shardLayout(fixture, "doc_id", "text", shards = 8, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = fixture
      .select(col("doc_id"), graft.ext.Dedup.tokens(col("text")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    ledger.filter(_._2 > 0).foreach { case (id, n, shard, off) =>
      assert(stream(shard).slice(off.toInt, (off + n).toInt) === toks(id),
        s"ledger seek for doc $id did not reproduce its tokens")
    }
  }

  test("writeShards: one file per shard, read-back equals the pure " +
      "layout, re-writes byte-identical on re-arrived data") {
    val fixture = Tables.load(spark, sf(), "documents")
    val tmp = java.nio.file.Files.createTempDirectory("shardsink").toString
    def fileOfShard(dir: String): Map[String, java.io.File] = {
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      shardDirs.map { d =>
        val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(parts.length == 1,
          s"${d.getName}: expected exactly one file, got ${parts.length}")
        d.getName -> parts.head
      }.toMap
    }
    try {
      val back = Packing.writeShards(fixture, "doc_id", "text",
        shards = 8, seqTokens = 64L, seed = 42L, outDir = s"$tmp/a")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getString(4)))
        .toMap
      assert(back === naiveSequences(fixture, 64),
        "read-back of the written shards diverges from the pure layout")
      // re-arrival: same rows, different input partitioning — the
      // written artifact must be byte-identical file by file
      Packing.writeShards(fixture.repartition(7), "doc_id", "text",
        shards = 8, seqTokens = 64L, seed = 42L, outDir = s"$tmp/b")
      val a = fileOfShard(s"$tmp/a"); val b = fileOfShard(s"$tmp/b")
      assert(a.keySet === b.keySet && a.keySet ===
        (0 until 8).map(i => s"shard=$i").toSet)
      a.foreach { case (shard, fa) =>
        val ba = java.nio.file.Files.readAllBytes(fa.toPath)
        val bb = java.nio.file.Files.readAllBytes(b(shard).toPath)
        assert(java.util.Arrays.equals(ba, bb),
          s"$shard re-write is not byte-identical")
      }
    } finally {
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("fimSplit: prefix+middle+suffix reassemble the document exactly") {
    val fixture = Tables.load(spark, sf(), "documents")
    val got = Packing.fimSplit(fixture, "doc_id", "text", seed = 42L)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5), r.getString(6)))
      .toMap
    val toks = fixture
      .select(col("doc_id"), graft.ext.Dedup.tokens(col("text")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got.keySet == toks.keySet)
    got.foreach { case (id, (n, lo, hi, p, m, s)) =>
      val ts = toks(id)
      assert(n == ts.length)
      // cuts replay the seeded draw exactly
      val c1 = DetRandom.mixLong(id, 1L, 42L) % (n + 1)
      val c2 = DetRandom.mixLong(id, 2L, 42L) % (n + 1)
      assert((lo, hi) == (math.min(c1, c2), math.max(c1, c2)))
      // the three segments are the document, losslessly
      assert(p == ts.take(lo.toInt).mkString(" "))
      assert(m == ts.slice(lo.toInt, hi.toInt).mkString(" "))
      assert(s == ts.drop(hi.toInt).mkString(" "))
    }
    // the transform must produce nonempty middles somewhere (nonvacuous)
    assert(got.values.exists(_._5.nonEmpty))
  }
}
