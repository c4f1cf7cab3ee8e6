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

  test("bernoulli: deterministic subset, roughly the requested fraction") {
    val n = events.count()
    val b1 = Sampling.bernoulli(events, "event_id", 0.2, 7L)
    val b2 = Sampling.bernoulli(events.repartition(13), "event_id", 0.2, 7L)
    assert(b1.collect().map(_.getLong(0)).toSet === b2.collect().map(_.getLong(0)).toSet)
    val k = b1.count()
    assert(math.abs(k.toDouble / n - 0.2) < 0.05)
  }
}
