package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling: partition-independence, per-stratum caps,
  * seed sensitivity, and the WindowGroupLimit plan shape. */
class SamplingSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf(), "events")
    .select(col("event_id"), col("event_type"))

  test("stratified: ≤k per stratum, partition-independent, seeded") {
    val s1 = Sampling.stratified(events, "event_type", "event_id", 50, 7L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = Sampling.stratified(events.repartition(17), "event_type", "event_id", 50, 7L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 === s2) // same set under a different partitioning
    val perStratum = s1.groupBy(_._2).map(_._2.size)
    assert(perStratum.forall(_ <= 50) && perStratum.exists(_ == 50))
    val s3 = Sampling.stratified(events, "event_type", "event_id", 50, 8L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 !== s3) // different seed, different sample
  }

  test("stratified: plans as WindowGroupLimit (partial top-k before the exchange)") {
    val plan = Sampling.stratified(events, "event_type", "event_id", 50, 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("budgeted: equals the naive per-group cumulative window, any partitioning") {
    import graft.learn.DetRandom
    import org.apache.spark.sql.expressions.Window
    val weighted = events.select(col("event_id"), col("event_type"),
      (col("event_id") % 7 + 1).as("w"))
    val budget = when(col("event_type") === "click", lit(400L)).otherwise(lit(150L))
    def naive(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("event_type")
        .orderBy(DetRandom.uniform(col("event_id"), col("event_id"), 7L), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("cum_w", sum(col("w")).over(w)).filter(col("cum_w") <= budget)
    }
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "cum_w").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = asSet(naive(weighted))
    assert(want.nonEmpty)
    assert(asSet(Sampling.budgeted(weighted, "event_type", "event_id", "w",
      budget, 7L)) === want)
    // partitioning-independent: same admissions from a reshuffled input
    assert(asSet(Sampling.budgeted(weighted.repartition(13), "event_type",
      "event_id", "w", budget, 7L)) === want)
  }

  test("bernoulli: deterministic subset, roughly the requested fraction") {
    val n = events.count()
    val b1 = Sampling.bernoulli(events, "event_id", 0.2, 7L)
    val b2 = Sampling.bernoulli(events.repartition(13), "event_id", 0.2, 7L)
    assert(b1.collect().map(_.getLong(0)).toSet === b2.collect().map(_.getLong(0)).toSet)
    val k = b1.count()
    assert(math.abs(k.toDouble / n - 0.2) < 0.05)
  }

  test("prioritySample: exact naive replay, weight bias, partition independence") {
    import graft.learn.DetRandom
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (0L until 500L).map(i => (i, 1L + rng.nextInt(50).toLong))
    val df = rows.toDF("id", "w")
    def naive(seed: Long): Seq[(Long, Long, Long)] = rows
      .map { case (i, w) =>
        (i, w, w * DetRandom.M / (DetRandom.mixLong(i, i, seed) + 1)) }
      .sortBy { case (i, _, p) => (-p, i) }.take(40)
    val got = Sampling.prioritySample(df, "id", "w", k = 40, seed = 3L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === naive(3L))
    val got13 = Sampling.prioritySample(df.repartition(13), "id", "w",
      k = 40, seed = 3L).as[(Long, Long, Long)].collect().toSeq
    assert(got13 === got)
    // inclusion tracks weight: across seeds, heavy rows survive the cut
    // far more often than light ones
    val heavy = rows.filter(_._2 >= 40).map(_._1).toSet
    val light = rows.filter(_._2 <= 10).map(_._1).toSet
    val counts = (0L until 20L).flatMap(s => naive(s).map(_._1))
      .groupBy(identity).view.mapValues(_.size).toMap
    val heavyRate = heavy.toSeq.map(counts.getOrElse(_, 0)).sum.toDouble / heavy.size
    val lightRate = light.toSeq.map(counts.getOrElse(_, 0)).sum.toDouble / light.size
    assert(heavyRate > 3 * lightRate,
      s"weighting lost: heavy $heavyRate vs light $lightRate")
    // a zero-weight row never appears
    val withZero = ((500L, 0L) +: rows).toDF("id", "w")
    assert(!Sampling.prioritySample(withZero, "id", "w", 500, 3L)
      .as[(Long, Long, Long)].collect().exists(_._1 == 500L))
  }
}
