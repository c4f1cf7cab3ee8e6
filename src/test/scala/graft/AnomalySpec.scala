package graft

import graft.ext.Anomaly
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Double)],
      win: Int = 20, minN: Int = 5): Map[Long, (Long, Boolean)] =
    Anomaly.zFlags(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", win = win, minN = minN)
      .select(col("event_id"), col("cents"), col("is_anomaly"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("a spike after a stable window flags; the stable events don't") {
    val rows = (1L to 10L).map(i => (1L, i, i, 10.00 + (i % 2) * 0.02)) :+
      (1L, 11L, 11L, 500.00)
    val got = run(rows)
    assert(got(11L)._2, "spike must flag")
    assert((1L to 10L).forall(i => !got(i)._2), "stable series must not flag")
  }

  test("warm-up suppression: a key's first minN events never flag") {
    // huge jump at event 3, but the PRIOR window holds only 2 events
    val rows = Seq((1L, 1L, 1L, 1.00), (1L, 2L, 2L, 1.00), (1L, 3L, 3L, 9999.00))
    assert(run(rows).values.forall(!_._2))
  }

  test("constant prior window flags any deviation (zero variance)") {
    val rows = (1L to 8L).map(i => (1L, i, i, 42.00)) :+ (1L, 9L, 9L, 42.01)
    val got = run(rows)
    assert(got(9L)._2, "any deviation from a constant history flags")
    assert((1L to 8L).forall(i => !got(i)._2))
  }

  test("the window trails per key: another user's spike is invisible") {
    val rows = (1L to 10L).map(i => (1L, i, i, 10.00)) ++
      (1L to 10L).map(i => (2L, i, 100L + i, 10.00)) :+
      (2L, 11L, 111L, 999.00)
    val got = run(rows)
    assert(got(111L)._2)
    assert((1L to 10L).forall(i => !got(i)._2)) // user 1 untouched
  }

  test("cents lift is exact DECIMAL, and flags are partition-independent") {
    val rows = (1L to 30L).map(i =>
      (i % 3, i, i, 10.01 * ((i % 7) + 1))) :+ (0L, 31L, 31L, 777.77)
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def all(p: org.apache.spark.sql.DataFrame) =
      Anomaly.zFlags(p, "user_id", "ts", "event_id", "value")
        .orderBy("event_id").collect().toSeq
    assert(all(df.repartition(7)) === all(df.coalesce(1)))
    // 10.01 * 6 = 60.06 → 6006 cents exactly (a double multiply would
    // round differently on some values; DECIMAL must not)
    val cents = all(df).map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(cents(6L) === 7007L)
  }
}
