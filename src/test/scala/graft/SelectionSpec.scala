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
}
