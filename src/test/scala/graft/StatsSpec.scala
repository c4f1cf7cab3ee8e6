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

  private val qs = Seq((1, 4), (1, 2), (9, 10), (1, 1))

  /** (group, q) -> value as raw bits, so −0.0 ≠ +0.0 and NaN == NaN. */
  private def byKey(df: org.apache.spark.sql.DataFrame): Map[(Option[String], Double), Long] =
    df.collect().map { r =>
      val g = if (r.isNullAt(0)) None else Some(r.get(0).toString)
      val v = r.get(2) match {
        case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
        case l: java.lang.Long   => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case o => sys.error(s"unexpected value type $o")
      }
      (g, r.getDouble(1)) -> v
    }.toMap

  test("quantilesDiscSelect ≡ quantilesDisc on longs over the full 2^63 range") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { i =>
      val g: String = rnd.nextInt(4) match {
        case 0 => "a"; case 1 => "b"; case 2 => null; case _ => "null"
      }
      // mix magnitudes: small dups, > 2^53 (double-unsafe), full-range
      val v = rnd.nextInt(3) match {
        case 0 => rnd.nextInt(5).toLong
        case 1 => (1L << 53) + rnd.nextInt(1000) * (if (rnd.nextBoolean()) 1 else -1)
        case _ => rnd.nextLong()
      }
      (g, v, i.toLong)
    } ++ Seq(("a", Long.MaxValue, 400L), ("a", Long.MinValue, 401L),
      ((null: String), Long.MaxValue - 1, 402L))
    val df = rows.toDF("g", "v", "id")
    val want = byKey(Stats.quantilesDisc(df, "g", "v", "id", qs))
    val got = byKey(Stats.quantilesDiscSelect(df, "g", "v", qs))
    assert(got === want)
  }

  test("quantilesDiscSelect ≡ quantilesDisc on doubles incl. -0.0/NaN/±Inf") {
    val rnd = new scala.util.Random(7)
    val special = Array(-0.0, 0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, -Double.MinPositiveValue)
    val rows = Seq.tabulate(400) { i =>
      val g: String = if (rnd.nextInt(5) == 0) null else ("g" + rnd.nextInt(3))
      val v = rnd.nextInt(4) match {
        case 0 => special(rnd.nextInt(special.length))
        case 1 => rnd.nextInt(4).toDouble // duplicates
        case _ => (rnd.nextDouble() - 0.5) * 1e12
      }
      (g, v, i.toLong)
    }
    val df = rows.toDF("g", "v", "id")
    val want = byKey(Stats.quantilesDisc(df, "g", "v", "id", qs))
    val got = byKey(Stats.quantilesDiscSelect(df, "g", "v", qs))
    assert(got === want)
  }

  test("SortedLowerBound: codegen binary search ≡ count of cuts below v") {
    import org.apache.spark.sql.GraftExpressionBridge
    import org.apache.spark.sql.functions.{col, filter, size, typedlit}
    val cutSets = Seq(
      Seq.empty[Long], Seq(0L), Seq(-5L, 0L, 7L),
      (0L until 1024L).map(_ * 3 - 512).toSeq,
      Seq(Long.MinValue, -1L, 0L, Long.MaxValue))
    val vs = Seq(Long.MinValue, -513L, -1L, 0L, 1L, 6L, 7L, 8L, 1535L,
      Long.MaxValue)
    val df = vs.toDF("v")
    cutSets.foreach { cuts =>
      val cutsCol = typedlit(cuts)
      val got = df.select(GraftExpressionBridge.column(
        graft.functions.expressions.SortedLowerBound(
          GraftExpressionBridge.expression(cutsCol),
          GraftExpressionBridge.expression(col("v")))))
        .collect().map(_.getInt(0)).toSeq
      val want = df.select(size(filter(cutsCol, c => c < col("v"))))
        .collect().map(_.getInt(0)).toSeq
      assert(got === want, s"cuts=$cuts")
    }
  }

  test("quantilesDiscSelect narrow-fanout path (fanout=2, many passes)") {
    val df = Seq.tabulate(100)(i => ("x", (i * 37 % 101).toLong, i.toLong))
      .toDF("g", "v", "id")
    val want = byKey(Stats.quantilesDisc(df, "g", "v", "id", qs))
    val got = byKey(Stats.quantilesDiscSelect(df, "g", "v", qs, fanout = 2))
    assert(got === want)
  }

  test("dimStats ≡ naive over random vectors (negative sums), partition-independent") {
    val rnd = new scala.util.Random(47)
    // bias negative so some dims exercise the sign-folded mean
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(8)((rnd.nextFloat() - 0.7f) * 2f)))
    val w = vecs.map { case (_, v) =>
      v.map(x => math.floor(x.toDouble * 1000000.0).toLong) }
    val want = (0 until 8).map { d =>
      val xs = w.map(_(d))
      val s = xs.sum
      val mean = if (s < 0) -((-s) / xs.size) else s / xs.size
      d.toLong -> (xs.size.toLong, s, mean, xs.min, xs.max,
        xs.map(x => x * x).sum)
    }.toMap
    assert(want.values.exists(_._2 < 0), "fixture grew no negative-sum dim")
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.dimStats(df, "embedding").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
    val a = run(vecs.toDF("vec_id", "embedding").repartition(7))
    assert(a === run(vecs.toDF("vec_id", "embedding").coalesce(1)))
    assert(a === want)
  }
}
