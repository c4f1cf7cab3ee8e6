package graft

import graft.ext.Stats

/** Discrete quantiles: hand-checked ranks, duplicate values, singleton
  * groups, q=1 (max). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantilesDisc picks the ceil(q·n) ranked value per group") {
    val df = Seq(
      // group a: values 10,20,30,40 → median = rank ceil(2)=2 → 20; p90 → rank 4 → 40
      ("a", 10.0, 1L), ("a", 20.0, 2L), ("a", 30.0, 3L), ("a", 40.0, 4L),
      // group b: duplicate values — tiebreak keeps the order total
      ("b", 5.0, 1L), ("b", 5.0, 2L), ("b", 7.0, 3L),
      // group c: singleton
      ("c", 99.0, 1L))
      .toDF("g", "v", "id")
    val out = Stats.quantilesDisc(df, "g", "v", "id", Seq((1, 2), (9, 10), (1, 1)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(out === Set(
      ("a", 0.5, 20.0), ("a", 0.9, 40.0), ("a", 1.0, 40.0),
      ("b", 0.5, 5.0),  ("b", 0.9, 7.0),  ("b", 1.0, 7.0),
      ("c", 0.5, 99.0), ("c", 0.9, 99.0), ("c", 1.0, 99.0)))
  }
}
