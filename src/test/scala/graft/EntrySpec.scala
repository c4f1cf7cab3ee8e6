package graft

import org.apache.spark.sql.functions._

/** Driver-contract smoke: entry() and every queries() member runs at
  * sf0.001 and returns rows. */
class EntrySpec extends SparkSpec {

  test("entry returns k=10 recommendations with total deterministic order") {
    val r1 = SparkEntry.entry(spark).collect()
    assert(r1.length === 10)
    val r2 = SparkEntry.entry(spark).collect()
    assert(r1.map(_.getLong(0)).toSeq === r2.map(_.getLong(0)).toSeq)
  }

  test("every queries entry runs and yields rows at sf0.001") {
    // q06 (customers with no orders) is legitimately empty at this SF —
    // empty-vs-empty still hash-matches the oracle.
    val mayBeEmpty = Set("q06_anti_join")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf()).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every queries key has an oracle or documented rows-only status") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
  }
}
