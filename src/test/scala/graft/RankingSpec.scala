package graft

import graft.ext.Ranking
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  /** Single-threaded replay of the exact integer BM25 recurrence. */
  private def naiveBm25(
      docs: Seq[(Long, String)], k: Int): Set[(Long, String, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector
    }.filter(_._2.nonEmpty)
    val n = docs.size.toLong
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val df = toks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val dCnt = dl.size.toLong
    val tCnt = dl.values.sum
    toks.flatMap { case (id, ts) =>
      val scored = ts.groupBy(identity).toSeq.map { case (t, occ) =>
        val tf = occ.size.toLong
        val r = dl(id) * dCnt * 1000000L / tCnt
        val tfc = 22L * tf * 1000000000000L /
          (10L * tf * 1000000L + 3000000L + 9L * r)
        (t, (n * 1000000L / df(t)) * tfc / 1000000L)
      }
      scored.sortBy { case (t, s) => (-s, t) }.take(k).zipWithIndex
        .map { case ((t, s), i) => (id, t, s, (i + 1).toLong) }
    }.toSet
  }

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "spark spark spark join filter",
    2L -> "join filter scan scan window window window window window window",
    3L -> "spark join",
    4L -> "unique singleton",
    5L -> "filter join filter join filter join")

  test("bm25TopTerms replays the naive integer recurrence exactly") {
    val got = Ranking.bm25TopTerms(corpus.toDF("doc_id", "text"), "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === naiveBm25(corpus, 3))
  }

  test("rarer terms outscore common ones at equal tf and length") {
    // doc 4: both terms are df=1, same tf, same doc — tie broken by term
    val got = Ranking.bm25TopTerms(corpus.toDF("doc_id", "text"), "doc_id", "text", k = 3)
      .filter(col("doc_id") === 4L).orderBy("rk")
      .as[(Long, String, Long, Long)].collect()
    assert(got.map(_._2).toSeq === Seq("singleton", "unique"))
    assert(got(0)._3 === got(1)._3) // identical factors → identical score
    // doc 1: 'spark' (df=2) beats 'join'/'filter' (df=4) despite the
    // saturation favouring nothing at these tfs
    val d1 = Ranking.bm25TopTerms(corpus.toDF("doc_id", "text"), "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1L).as[(Long, String, Long, Long)].head()
    assert(d1._2 === "spark")
  }

  test("tf saturates: score grows sublinearly and length penalises") {
    // docs 10/11 have EQUAL length (so the dl penalty can't cancel the
    // tf gain — at unequal lengths they exactly offset); doc 12 repeats
    // doc 11's tf at 10× the length
    val docs = Seq(
      10L -> "term filler filler filler",
      11L -> "term term filler filler",
      12L -> ("term term " + "filler " * 38).trim)
    val byDoc = Ranking.bm25TopTerms(docs.toDF("doc_id", "text"), "doc_id", "text", k = 2)
      .filter(col("term") === "term")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(byDoc(11L) > byDoc(10L))          // more tf, same length → higher
    assert(byDoc(11L) < 2 * byDoc(10L))      // …but sublinearly
    assert(byDoc(12L) < byDoc(11L))          // same tf, longer doc → lower
  }

  test("bm25TopTerms is partition-independent") {
    val df = corpus.toDF("doc_id", "text")
    val a = Ranking.bm25TopTerms(df.repartition(7), "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect().toSet
    val b = Ranking.bm25TopTerms(df.coalesce(1), "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(a === b)
  }

  /** Naive collocation lift over adjacent bigrams with slot marginals. */
  private def naiveColloc(
      docs: Seq[(Long, String)], minCount: Long): Map[(String, String), (Long, Long, Long, Long)] = {
    val bigrams = docs.flatMap { case (_, text) =>
      val ts = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      ts.zip(ts.drop(1))
    }
    val f = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = f.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c2 = f.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = f.values.sum
    f.collect { case ((w1, w2), n12) if n12 >= minCount =>
      (w1, w2) -> (n12, c1(w1), c2(w2), n12 * n * 1000000L / (c1(w1) * c2(w2)))
    }.toMap
  }

  test("collocations: frozen pair maxes lift, naive replay, partition-independent") {
    // "ice cream" always collocates; "the" pairs with everything
    val docs: Seq[(Long, String)] = Seq(
      (1L, "the ice cream and the dog saw the ice cream"),
      (2L, "ice cream for the dog and the cat"),
      (3L, "the dog and the cat saw ice cream"))
    val want = naiveColloc(docs, minCount = 2L)
    def run(df: org.apache.spark.sql.DataFrame) =
      Ranking.collocations(df, "doc_id", "text", minCount = 2L)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val a = run(docs.toDF("doc_id", "text").repartition(5))
    assert(a === run(docs.toDF("doc_id", "text").coalesce(1)))
    assert(a === want)
    // ice→cream is deterministic given "ice" (slot-conditional prob 1):
    // its lift must exceed the promiscuous the→dog pair's
    assert(a(("ice", "cream"))._4 > a(("the", "dog"))._4)
  }
}
