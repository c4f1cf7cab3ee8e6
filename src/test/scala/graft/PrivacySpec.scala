package graft

import graft.ext.Privacy
import org.apache.spark.sql.functions._

/** PII expressions: pseudonym stability/shape, redaction, and exact
  * bucket generalization including negative balances. */
class PrivacySpec extends SparkSpec {

  test("pseudonym: stable, pepper-sensitive, requested width") {
    import spark.implicits._
    val df = Seq("Customer#000000001", "Customer#000000001", "Customer#000000002")
      .toDF("name")
      .select(Privacy.pseudonym(col("name"), "pep").as("p"),
        Privacy.pseudonym(col("name"), "other").as("q"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0)._1 === rows(1)._1)      // equal input, equal pseudonym
    assert(rows(0)._1 !== rows(2)._1)      // distinct inputs diverge
    assert(rows(0)._1 !== rows(0)._2)      // pepper changes the mapping
    assert(rows.forall(r => r._1.length == 16 && r._1.matches("[0-9a-f]+")))
  }

  test("redactDigits: replaces runs ≥ minRun, counts agree") {
    import spark.implicits._
    val df = Seq("a12b345c6789", "no digits", "12 34").toDF("t")
      .select(Privacy.redactDigits(col("t"), 3).as("r"),
        Privacy.countDigitRuns(col("t"), 3).as("n"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows(0) === ("a12b<NUM>c<NUM>", 2L)) // 2-digit run survives
    assert(rows(1) === ("no digits", 0L))
    assert(rows(2) === ("12 34", 0L))
  }

  test("moneyBucketLo: exact $100 buckets across sign boundaries") {
    import spark.implicits._
    val df = Seq(-999.99, -100.0, -0.01, 0.0, 99.99, 100.0, 9999.99)
      .toDF("v")
      .select(col("v"), Privacy.moneyBucketLo(col("v"), 100).as("lo"))
    val got = df.collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(got(-999.99) === -1000L)
    assert(got(-100.0) === -100L)
    assert(got(-0.01) === -100L)
    assert(got(0.0) === 0L)
    assert(got(99.99) === 0L)
    assert(got(100.0) === 100L)
    assert(got(9999.99) === 9900L)
  }
}
