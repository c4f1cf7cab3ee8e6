package graft

import org.apache.spark.sql.functions._

/** q59's sketch profile: approximate answers must sit within their
  * advertised error of the exact ones. The raw sketches are
  * engine-specific encodings, so the shipped q59 is the envelope AUDIT
  * (exact side + 1/0 flags, hash-checked by the oracle); this spec
  * bounds the raw profile values directly and pins the audit's flags. */
class SketchSpec extends SparkSpec {

  test("envelope audit: every flag true, exact side matches a naive replay") {
    val rows = SparkEntry.queries("q59_sketch_profile")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) == 1L, s"${r.getString(0)} hll_ok")
      assert(r.getLong(4) == 1L, s"${r.getString(0)} p50_ok")
      assert(r.getLong(5) == 1L, s"${r.getString(0)} p95_ok")
    }
    val exact = Tables.load(spark, sf(), "events").groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (r <- rows)
      assert((r.getLong(1), r.getLong(2)) == exact(r.getString(0)))
  }

  test("envelope audit property: flags hold on random skewed frames") {
    // randomised replay of the audit's contract: for groups small enough
    // that both sketches are exact-by-construction (HLL regwidth covers
    // the cardinality; approx_percentile buffers < accuracy rows), every
    // flag must come back 1 and the exact side must match a naive count —
    // including groups with one row, ties everywhere, negative values,
    // and nulls
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val rows = (1 to 2000).map { i =>
        val t = s"t${rnd.nextInt(4)}"
        val u = rnd.nextInt(200).toLong
        val v: java.lang.Double =
          if (rnd.nextInt(20) == 0) null
          else (rnd.nextInt(9) - 4).toDouble // heavy ties, negatives
        (t, u, v)
      } :+ (("lonely", 1L, 0.5: java.lang.Double)) :+
        // NULL group KEY: a plain equi-join inside the audit would drop
        // this group while an oracle GROUP BY retains it — the audit
        // joins null-safely (<=>) so the group must survive with flags
        ((null: String, 7L, 1.0: java.lang.Double)) :+
        ((null: String, 8L, null: java.lang.Double))
      val df = rows.toDF("event_type", "user_id", "value")
      val got = graft.ext.Sketches.envelopeAudit(df).collect()
      assert(got.nonEmpty, s"trial $trial empty")
      for (r <- got) {
        assert(r.getLong(3) == 1L && r.getLong(4) == 1L && r.getLong(5) == 1L,
          s"trial $trial ${r.getString(0)} flags ${r.toSeq}")
      }
      val naive = rows.groupBy(_._1).map { case (t, rs) =>
        t -> (rs.size.toLong, rs.map(_._2).distinct.size.toLong)
      }
      for (r <- got)
        assert((r.getLong(1), r.getLong(2)) == naive(r.getString(0)),
          s"trial $trial ${r.getString(0)} exact side")
    }
  }

  test("HLL distinct and approx percentiles sit within advertised error of exact") {
    val approx = graft.ext.Sketches
      .profile(Tables.load(spark, sf(), "events"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    val events = Tables.load(spark, sf(), "events")
    val exact = events.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // exact rank neighbourhood for the percentile assert: the sketch
    // guarantees RANK error <= 1/accuracy, so compare against the exact
    // values at q +/- 0.01 instead of the point estimate
    val bounds = events.groupBy("event_type").agg(
        expr("percentile(value, 0.49)").as("p50lo"),
        expr("percentile(value, 0.51)").as("p50hi"),
        expr("percentile(value, 0.94)").as("p95lo"),
        expr("percentile(value, 0.96)").as("p95hi"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    assert(approx.keySet === exact.keySet)
    for ((t, (n, users, p50, p95)) <- approx) {
      val (en, eu, _, _) = exact(t)
      assert(n === en, s"$t exact count must be exact")
      // rsd 0.01 -> assert a generous 5% envelope
      assert(math.abs(users - eu).toDouble / eu <= 0.05,
        s"$t approx_users=$users exact=$eu")
      val (l50, h50, l95, h95) = bounds(t)
      assert(p50 >= l50 && p50 <= h50, s"$t p50=$p50 not in [$l50,$h50]")
      assert(p95 >= l95 && p95 <= h95, s"$t p95=$p95 not in [$l95,$h95]")
    }
  }
}
