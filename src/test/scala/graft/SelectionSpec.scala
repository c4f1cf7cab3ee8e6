package graft

import graft.ext.{Dedup, Selection}
import org.apache.spark.sql.functions._

/** DSIR-shaped importance weights (ext/Selection.scala): exact-integer
  * equality with a naive recomputation, partition independence. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights: equals a naive recomputation, partition-independent") {
    val bins = 64
    val fixture = Tables.load(spark, sf(), "documents")
    val run = (df: org.apache.spark.sql.DataFrame) =>
      Selection.dsirWeights(df, "doc_id", "text", col("lang") === "en", bins)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val got = run(fixture)

    val rows = fixture.select($"doc_id", $"lang", Dedup.tokens($"text").as("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toVector))
    def bin(t: String): Long = {
      var a = 0L
      t.foreach { ch => a = (a * 31 + ch.toInt) % 1000000007L }
      a % bins
    }
    val raw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val tgt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    rows.foreach { case (_, lang, ts) => ts.foreach { t =>
      val b = bin(t); raw(b) += 1; if (lang == "en") tgt(b) += 1 } }
    val naive = rows.collect { case (id, _, ts) if ts.nonEmpty =>
      val score = ts.groupBy(bin).map { case (b, g) =>
        g.size.toLong * ((tgt(b) + 1L) * 1000000L / (raw(b) + 1L)) }.sum
      id -> (ts.length.toLong, score, score / ts.length)
    }.toMap
    assert(naive.nonEmpty)
    // target docs should outscore non-target on average (sanity that the
    // weights actually discriminate, not just hash-match)
    val byLang = rows.map(r => r._1 -> (r._2 == "en")).toMap
    val (tAvg, oAvg) = {
      val (t, o) = naive.partition { case (id, _) => byLang(id) }
      (t.values.map(_._3).sum / t.size, o.values.map(_._3).sum / o.size)
    }
    assert(tAvg > oAvg, s"target avg $tAvg !> other avg $oAvg")
    assert(got === naive)
    assert(run(fixture.repartition(7)) === got)
  }

  test("lmScore: equals a naive bigram-LM recomputation, partition-independent") {
    val fixture = Tables.load(spark, sf(), "documents")
    val run = (df: org.apache.spark.sql.DataFrame) =>
      Selection.lmScore(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = run(fixture)

    val rows = fixture.select($"doc_id", Dedup.tokens($"text").as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toVector))
    val bigrams = rows.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
    val c2 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cx = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // vocabulary of bigram-PARTICIPATING tokens (the documented contract)
    val v = bigrams.flatMap(b => Seq(b._1, b._2)).distinct.size.toLong
    val naive = rows.collect { case (id, ts) if ts.length >= 2 =>
      val ps = ts.zip(ts.drop(1)).map(b => (c2(b) + 1L) * 1000000L / (cx(b._1) + v))
      id -> (ps.size.toLong, ps.sum / ps.size)
    }.toMap
    assert(naive.nonEmpty)
    assert(got === naive)
    assert(run(fixture.repartition(7)) === got)
  }

  test("lmScore: natural prose outscores shuffled-vocabulary word salad") {
    // same vocabulary, same corpus: one doc repeats a fluent sentence,
    // the salad doc uses bigrams that never recur as corpus context
    val prose = Seq.fill(8)("the cat sat on the mat").mkString(" ")
    val salad = "mat the on cat sat mat on sat the cat mat sat"
    val docs = Seq((1L, prose), (2L, salad), (3L, prose)).toDF("doc_id", "text")
    val got = Selection.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) > got(2L), s"prose ${got(1L)} !> salad ${got(2L)}")
  }

  test("temperatureQuotas: naive replay, exact-budget sum, low-resource upweighting") {
    import spark.implicits._
    // four sources with very unequal token mass (tokens ∝ repeated 'tk')
    val docs = Seq(
      (0L, Seq.fill(1600)("tk").mkString(" "), "big"),
      (1L, Seq.fill(400)("tk").mkString(" "), "mid"),
      (2L, Seq.fill(100)("tk").mkString(" "), "small"),
      (3L, Seq.fill(9)("tk").mkString(" "), "tiny")
    ).toDF("doc_id", "text", "source")
    val got = Selection.temperatureQuotas(docs, "source", "text", 1000L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // naive: isqrt weights 40/20/10/3, W=73; base = 1000*w div 73;
    // remainders decide the leftover
    val w = Map("big" -> 40L, "mid" -> 20L, "small" -> 10L, "tiny" -> 3L)
    val n = Map("big" -> 1600L, "mid" -> 400L, "small" -> 100L, "tiny" -> 9L)
    val sumW = w.values.sum
    val base = w.view.mapValues(v => 1000L * v / sumW).toMap
    val rem = w.view.mapValues(v => 1000L * v % sumW).toMap
    val deficit = 1000L - base.values.sum
    val extra = w.keys.toSeq.sortBy(g => (-rem(g), g)).take(deficit.toInt).toSet
    val expected = w.keys.toSeq.sorted.map(g =>
      (g, n(g), w(g), base(g) + (if (extra(g)) 1L else 0L)))
    assert(got === expected)
    assert(got.map(_._4).sum === 1000L) // exact budget
    // temperature upweights the low-resource tail: tiny's quota share
    // exceeds its raw token share, big's is below
    val totTok = n.values.sum
    val gotMap = got.map(t => t._1 -> t._4).toMap
    assert(gotMap("tiny").toDouble / 1000 > n("tiny").toDouble / totTok)
    assert(gotMap("big").toDouble / 1000 < n("big").toDouble / totTok)
    // partition independence
    val got13 = Selection.temperatureQuotas(docs.repartition(13),
        "source", "text", 1000L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got13 === got)
  }

  test("temperatureQuotas isqrt: exact at and around perfect squares") {
    import spark.implicits._
    // token counts k²−1, k², k²+1 must give isqrt k−1, k, k exactly
    val k = 37L
    val docs = Seq(
      (0L, Seq.fill((k * k - 1).toInt)("t").mkString(" "), "a"),
      (1L, Seq.fill((k * k).toInt)("t").mkString(" "), "b"),
      (2L, Seq.fill((k * k + 1).toInt)("t").mkString(" "), "c")
    ).toDF("doc_id", "text", "source")
    val got = Selection.temperatureQuotas(docs, "source", "text", 100L)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(got === Map("a" -> (k - 1), "b" -> k, "c" -> k))
  }

  test("budgetSelect: equals the global-window cumulative sum, " +
      "partition independent") {
    val fixture = Tables.load(spark, sf(), "documents")
    // naive: the textbook single global running sum
    val rows = fixture.select($"doc_id", Dedup.tokens($"text").as("ts"))
      .collect().map { r =>
        val ts = r.getSeq[String](1)
        val n = ts.length.toLong
        val ttr = if (n == 0) 0L else ts.distinct.length.toLong * 1000000L / n
        (r.getLong(0), n, ttr)
      }
    // half the corpus: the boundary lands mid-ranking at every SF
    val budget = rows.map(_._2).sum / 2
    val run = (df: org.apache.spark.sql.DataFrame) =>
      Selection.budgetSelect(df, "doc_id", "text", budget)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    val got = run(fixture)
    var cum = 0L
    val naive = rows.sortBy { case (id, _, ttr) => (-ttr, id) }.map {
      case (id, n, ttr) =>
        cum += n
        id -> (n, ttr, cum, if (cum <= budget) 1L else 0L)
    }.toMap
    assert(got === naive)
    assert(got.values.exists(_._4 == 1L) && got.values.exists(_._4 == 0L),
      "budget must split the fixture (degenerate test otherwise)")
    // the range-partitioned offsets must compose exactly no matter how
    // the input arrives
    assert(run(fixture.repartition(7)) === got)
  }
}
