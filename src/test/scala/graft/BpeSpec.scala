package graft

import graft.ext.Bpe
import scala.collection.mutable

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Classic sequential BPE trainer (Sennrich et al.'s algorithm 1
    * shape): pair stats count every adjacent position (overlaps
    * included), the fuse is a literal greedy left-to-right scan — the
    * independent reference for the engine's run-parity closed form. */
  private def naive(
      texts: Seq[String], merges: Int): Seq[(Long, String, String, Long)] = {
    val words = texts
      .flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var syms: Map[String, Vector[String]] =
      words.map { case (w, _) => w -> w.split("").toVector.filter(_.nonEmpty) }
    (1 to merges).map { r =>
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((w, f) <- words; v = syms(w); i <- 0 until v.size - 1)
        counts((v(i), v(i + 1))) += f
      val ((a, b), cnt) =
        counts.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head
      syms = syms.map { case (w, v) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < v.size) {
          if (i < v.size - 1 && v(i) == a && v(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += v(i); i += 1 }
        }
        w -> out.result()
      }
      (r.toLong, a, b, cnt)
    }
  }

  private def train(texts: Seq[String], merges: Int) =
    Bpe.trainMerges(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq

  test("hand corpus: merges chain into subwords, counts are overlap-inclusive") {
    // "aaaa" contributes THREE (a,a) positions per occurrence (the
    // paper's get_stats convention) but fuses to [aa, aa]
    val texts = Seq.fill(4)("aaaa the the") ++ Seq.fill(3)("then")
    val got = train(texts, 3)
    assert(got === naive(texts, 3))
    // round 1 is forced: (a,a) with 4 words × 3 overlapping positions
    assert(got.head === ((1L, "a", "a", 12L)))
    // "aaaa" is now [aa, aa] (4 counts); (t,h) and (h,e) tie at 11
    // (8 "the" + 3 "then") → lexicographic tie-break picks (h,e)
    assert(got(1) === ((2L, "h", "e", 11L)))
    assert(got(2) === ((3L, "t", "he", 11L)))
  }

  test("random corpora match the sequential trainer exactly") {
    val rng = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val alpha = "abc"
      val texts = (0 until 40).map { _ =>
        (0 until (2 + rng.nextInt(5))).map { _ =>
          (0 until (1 + rng.nextInt(6)))
            .map(_ => alpha(rng.nextInt(alpha.length))).mkString
        }.mkString(" ")
      }
      assert(train(texts, 5) === naive(texts, 5), s"trial $trial diverged")
    }
  }

  test("subwordVocab: equals applying the naive merges to the word table") {
    val rng = new scala.util.Random(29)
    val texts = (0 until 40).map { _ =>
      (0 until (2 + rng.nextInt(5))).map { _ =>
        (0 until (1 + rng.nextInt(6)))
          .map(_ => "abc" (rng.nextInt(3))).mkString
      }.mkString(" ")
    }
    // re-run the sequential trainer, keeping the final symbol tables
    val words = texts
      .flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var syms: Map[String, Vector[String]] =
      words.map { case (w, _) => w -> w.split("").toVector.filter(_.nonEmpty) }
    naive(texts, 4).foreach { case (_, a, b, _) =>
      syms = syms.map { case (w, v) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < v.size) {
          if (i < v.size - 1 && v(i) == a && v(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += v(i); i += 1 }
        }
        w -> out.result()
      }
    }
    val counts = mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, f) <- words; s <- syms(w)) counts(s) += f
    val expected = counts.toSeq.sortBy { case (t, f) => (-f, t) }.take(10)
    val got = Bpe.subwordVocab(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text", merges = 4, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === expected)
  }

  test("tokenCounts: per-doc trained-tokenizer counts, wordless docs count 0") {
    val texts = Seq(
      "the cat sat", "thethe the", "", "!!! ??", "cat cat cat the")
    // train on the same corpus, then segment each doc's words
    val merges = naive(texts, 3).map { case (_, a, b, _) => (a, b) }
    def segment(w: String): Int = {
      var v = w.split("").toVector.filter(_.nonEmpty)
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < v.size) {
          if (i < v.size - 1 && v(i) == a && v(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += v(i); i += 1 }
        }
        v = out.result()
      }
      v.size
    }
    val expected = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong,
        t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          .map(segment).sum.toLong)
    }.toSet
    val got = Bpe.tokenCounts(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text", merges = 3)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.contains((2L, 0L)) && got.contains((3L, 0L)))
  }

  test("segmentLexicon: word -> pieces map equals the naive segmentation") {
    val texts = (0 until 30).map(i =>
      s"pack pac ack aack the then cat ${"a" * (i % 4 + 1)}")
    val rules = naive(texts, 4).map { case (_, a, b, _) => (a, b) }
    def segment(w: String): Vector[String] = {
      var v = w.split("").toVector.filter(_.nonEmpty)
      rules.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < v.size) {
          if (i < v.size - 1 && v(i) == a && v(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += v(i); i += 1 }
        }
        v = out.result()
      }
      v
    }
    val words = texts
      .flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val expected = words.toSeq.map { case (w, f) =>
      val segs = segment(w)
      (w, f, segs.mkString("_"), segs.size.toLong)
    }.sortBy { case (w, f, _, _) => (-f, w) }.take(6)
    val got = Bpe.segmentLexicon(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text", merges = 4, topK = 6)
      .as[(String, Long, String, Long)].collect().toSeq
    assert(got === expected)
  }

  test("fertility: exact per-group pieces-per-word ratio") {
    val rows = Seq(
      (0L, "the cat sat", "en"), (1L, "thethe the", "en"),
      (2L, "catcat sat sat", "de"), (3L, "", "de"), (4L, "cat", "de"))
    val rules = naive(rows.map(_._2), 3).map { case (_, a, b, _) => (a, b) }
    def nSub(w: String): Long = {
      var v = w.split("").toVector.filter(_.nonEmpty)
      rules.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < v.size) {
          if (i < v.size - 1 && v(i) == a && v(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += v(i); i += 1 }
        }
        v = out.result()
      }
      v.size.toLong
    }
    val expected = rows
      .flatMap { case (_, t, g) =>
        t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(g -> _) }
      .groupBy(_._1).map { case (g, ws) =>
        val words = ws.size.toLong
        val subs = ws.map(w => nSub(w._2)).sum
        (g, words, subs, subs * 1000000L / words)
      }.toSet
    val got = Bpe.fertility(rows.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", merges = 3)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("partition independence") {
    val texts = (0 until 30).map(i => s"pack pac $i ack aack aaack pack")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = Bpe.trainMerges(df.repartition(1), "doc_id", "text", 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    val b = Bpe.trainMerges(df.repartition(7), "doc_id", "text", 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    assert(a === naive(texts, 4))
  }
}
