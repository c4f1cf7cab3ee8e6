package graft

import graft.ext.Interval

/** Interval join: window boundaries (half-open), bucket-boundary pairs,
  * key isolation, no duplicate matches from the 2× replication. */
class IntervalSpec extends SparkSpec {
  import spark.implicits._

  test("joinWithin: (t−w, t] window, bucket boundaries, no dup matches") {
    // window 10: right at t'=0 matches left t=10 (Δ=10 ≤ w? half-open:
    // t' > t−w means 0 > 0 is FALSE — exactly w-old does NOT match)
    val left = Seq(
      (1L, 10L, 100L), // matches r@5, r@10; NOT r@0 (exactly w old)
      (1L, 25L, 101L), // bucket 2; matches r@16 (bucket 1) — cross-bucket
      (2L, 10L, 200L)) // other key: only its own right rows
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 0L, 900L), (1L, 5L, 901L), (1L, 10L, 902L), (1L, 16L, 903L),
      (2L, 9L, 904L))
      .toDF("k", "t", "rid")
    val out = Interval.joinWithin(left, right, "k", "t", window = 10L,
        payload = Seq("rid"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out === Map(
      100L -> Seq(901L, 902L),
      101L -> Seq(903L),
      200L -> Seq(904L)))
  }
}
