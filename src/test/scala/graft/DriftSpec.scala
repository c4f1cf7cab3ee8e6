package graft

import graft.ext.Drift
import org.apache.spark.sql.DataFrame

class DriftSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-threaded replay of the exact drift formulas. */
  private def naiveDrift(
      rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long, Long, Long)] = {
    val valid = rows.filter(r => r._3 == 0L || r._3 == 1L)
    valid.groupBy(_._1).flatMap { case (g, rs) =>
      val n1 = rs.count(_._3 == 0L).toLong
      val n2 = rs.count(_._3 == 1L).toLong
      if (n1 == 0L || n2 == 0L) None
      else {
        val bins = rs.map(_._2).distinct
        val rates = bins.map { b =>
          val c1 = rs.count(r => r._2 == b && r._3 == 0L).toLong
          val c2 = rs.count(r => r._2 == b && r._3 == 1L).toLong
          (c1 * 1000000L / n1, c2 * 1000000L / n2)
        }
        val tv = rates.map { case (r1, r2) => math.abs(r1 - r2) }.sum / 2L
        val chi2 = rates.map { case (r1, r2) =>
          (r1 - r2) * (r1 - r2) / (r1 + r2 + 1L)
        }.sum
        Some(g -> (n1, n2, bins.size.toLong, tv, chi2))
      }
    }
  }

  private def run(df: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
    Drift.score(df, "grp", "bin", "p")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("hand-checked: identical distributions drift zero, a moved bin scores") {
    // group "flat": both periods put 2 rows in each of bins 0,1 → no drift.
    // group "moved": period 0 is all bin 0 (4 rows), period 1 all bin 1 (4).
    val rows =
      Seq.fill(2)(("flat", 0L, 0L)) ++ Seq.fill(2)(("flat", 1L, 0L)) ++
      Seq.fill(2)(("flat", 0L, 1L)) ++ Seq.fill(2)(("flat", 1L, 1L)) ++
      Seq.fill(4)(("moved", 0L, 0L)) ++ Seq.fill(4)(("moved", 1L, 1L))
    val got = run(rows.toDF("grp", "bin", "p"))
    assert(got("flat") === ((4L, 4L, 2L, 0L, 0L)))
    // moved: r1=(1e6,0), r2=(0,1e6) per bin → tv = (1e6+1e6)/2 = 1e6 (total
    // shift); chi2 per bin = 1e12/(1e6+1) = 999999 → 1999998 over 2 bins
    assert(got("moved") === ((4L, 4L, 2L, 1000000L, 1999998L)))
    assert(got === naiveDrift(rows))
  }

  test("groups missing a period are dropped; periods outside {0,1} ignored") {
    val rows = Seq(("only_p0", 0L, 0L), ("only_p0", 1L, 0L),
      ("ok", 0L, 0L), ("ok", 0L, 1L),
      ("ok", 3L, 2L), ("ok", 3L, -1L)) // stray periods must not count
    val got = run(rows.toDF("grp", "bin", "p"))
    assert(!got.contains("only_p0"))
    assert(got("ok") === ((1L, 1L, 1L, 0L, 0L)))
    assert(got === naiveDrift(rows))
  }

  test("random data ≡ naive, partition-independent") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(600)((
      s"g${rnd.nextInt(4)}", rnd.nextInt(6).toLong,
      (rnd.nextInt(4) - 1).toLong)) // periods in {-1,0,1,2}
    val want = naiveDrift(rows)
    val a = run(rows.toDF("grp", "bin", "p").repartition(7))
    assert(a === run(rows.toDF("grp", "bin", "p").coalesce(1)))
    assert(a === want)
  }
}
