package graft

import graft.ext.AsOf
import org.apache.spark.sql.functions._

/** Point-in-time join: strict vs inclusive time semantics, tiebreaks,
  * no-match nulls, and the single-shuffle plan shape. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    // key, t, qid, px
    (1L, 10L, 100L, 1.0),
    (1L, 20L, 101L, 2.0),
    (1L, 20L, 102L, 3.0), // same instant as 101 — tiebreak: larger qid wins
    (2L, 15L, 200L, 9.0))
    .toDF("k", "t", "qid", "px")

  private lazy val trades = Seq(
    (1L, 5L, 1000L),  // before any quote
    (1L, 10L, 1001L), // exactly at quote 100
    (1L, 25L, 1002L), // after the tied pair
    (2L, 15L, 2000L), // exactly at quote 200
    (3L, 50L, 3000L)) // key with no quotes at all
    .toDF("k", "t", "tid")

  test("inclusive: equal-time rights attach; ties pick the largest tiebreak") {
    val out = AsOf.joinAsOf(trades, quotes, "k", "t", "qid",
        Seq("qid", "px"), strict = false)
      .orderBy("tid").collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      1000L -> None,        // nothing at or before t=5
      1001L -> Some(100L),  // quote at the same instant attaches
      1002L -> Some(102L),  // the t=20 tie resolves to the larger qid
      2000L -> Some(200L),
      3000L -> None))       // unmatched key
  }

  test("strict: equal-time rights do NOT attach") {
    val out = AsOf.joinAsOf(trades, quotes, "k", "t", "qid",
        Seq("qid", "px"), strict = true)
      .orderBy("tid").collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      1000L -> None,
      1001L -> None,        // quote at t=10 is simultaneous, excluded
      1002L -> Some(102L),
      2000L -> None,
      3000L -> None))
  }

  test("left columns pass through; payload values ride along") {
    val out = AsOf.joinAsOf(trades, quotes, "k", "t", "qid",
      Seq("qid", "px"), strict = false)
    assert(out.columns.toSeq === Seq("k", "t", "tid", "qid", "px"))
    val px = out.filter(col("tid") === 1002L).head().getDouble(4)
    assert(px === 3.0)
  }

  test("plan: exactly one exchange (the key shuffle), no joins") {
    val out = AsOf.joinAsOf(trades, quotes, "k", "t", "qid",
      Seq("qid", "px"), strict = false)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }
}
