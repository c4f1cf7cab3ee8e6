package graft

import graft.ext.Funnel
import org.apache.spark.sql.DataFrame

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  /** Naive frontier replay: first qualifying occurrence per step. */
  private def naive(
      rows: Seq[(Long, Long, String)], steps: Seq[String],
      within: Option[Long]): Seq[Long] = {
    val byKey = rows.groupBy(_._1)
    var frontier: Map[Long, Long] = byKey.flatMap { case (k, es) =>
      es.filter(_._3 == steps.head).map(_._2).minOption.map(k -> _)
    }
    steps.drop(1).scanLeft(frontier) { (f, t) =>
      byKey.flatMap { case (k, es) =>
        f.get(k).flatMap { s =>
          es.filter(e => e._3 == t && e._2 > s &&
              within.forall(w => e._2 <= s + w))
            .map(_._2).minOption.map(k -> _)
        }
      }
    }.map(_.size.toLong)
  }

  private def run(df: DataFrame, steps: Seq[String], within: Option[Long] = None) =
    Funnel.funnel(df, "k", "o", "ty", steps, within).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getLong(2))).toSeq

  test("funnel: hand-checked reach with strictly-after semantics") {
    val rows: Seq[(Long, Long, String)] = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), // completes
      (2L, 1L, "a"), (2L, 2L, "b"),                // stops at b
      (3L, 5L, "b"), (3L, 6L, "a"),                // b BEFORE a: no step 2
      (4L, 1L, "b"), (4L, 2L, "a"), (4L, 3L, "b"), (4L, 4L, "c")) // late b counts
    val got = run(rows.toDF("k", "o", "ty"), Seq("a", "b", "c"))
    assert(got === Seq(("a", 4L), ("b", 3L), ("c", 2L)))
    assert(got.map(_._2) === naive(rows, Seq("a", "b", "c"), None))
  }

  test("funnel: within-window variant cuts slow conversions; random ≡ naive") {
    val rows: Seq[(Long, Long, String)] = Seq(
      (1L, 1L, "a"), (1L, 3L, "b"),   // gap 2 ≤ w=2: converts
      (2L, 1L, "a"), (2L, 10L, "b"))  // gap 9 > 2: cut
    assert(run(rows.toDF("k", "o", "ty"), Seq("a", "b"), Some(2L))
      === Seq(("a", 2L), ("b", 1L)))
    val rnd = new scala.util.Random(31)
    val types = Vector("a", "b", "c")
    val rand = Seq.fill(400)(
      (rnd.nextInt(50).toLong, rnd.nextInt(100).toLong, types(rnd.nextInt(3))))
    Seq(None, Some(10L)).foreach { w =>
      assert(run(rand.toDF("k", "o", "ty"), types, w).map(_._2)
        === naive(rand, types, w), s"within=$w")
      assert(run(rand.toDF("k", "o", "ty").repartition(7), types, w)
        === run(rand.toDF("k", "o", "ty"), types, w))
    }
  }

  test("retention: hand-checked cohorts and naive replay") {
    import graft.ext.Funnel
    import org.apache.spark.sql.functions.{col, to_date}
    // day numbers as dates via epoch-day strings
    val rnd = new scala.util.Random(37)
    val rows = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextInt(20))) ++
      Seq((100L, 3), (100L, 3), (100L, 5), (101L, 4)) // dupes + singleton
    val df = rows.toDF("k", "dayNum")
      .withColumn("day", to_date(org.apache.spark.sql.functions.expr(
        "date_add('1970-01-01', dayNum)")))
    val got = Funnel.retention(df, "k", "day").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    val byKey = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val fmt = java.time.LocalDate.ofEpochDay(_: Long).toString
    val naive = byKey.toSeq.flatMap { case (_, days) =>
      val c = days.min
      days.toSeq.map(d => (fmt(c.toLong), (d - c).toLong))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === naive)
    assert(got((fmt(4L), 0L)) >= 1L) // the singleton user 101 cohort
  }
}
