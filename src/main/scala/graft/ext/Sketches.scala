package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Profiling sketches and their error-envelope audit (q59).
  *
  * [[profile]] is the 100 TB production shape: per event type, HLL++
  * approximate distinct users (Heule et al. 2013, rsd 1%) and
  * KLL/GK-style approximate p50/p95 of `value` (rank error ≤
  * 1/accuracy), plus the exact row count — ONE partial-aggregable pass
  * with constant per-group state, where exact distinct/quantiles over
  * 100 TB would shuffle the world.
  *
  * [[envelopeAudit]] is the correctness gate for that pass: it computes
  * the exact answers NEXT TO the sketches and emits integer flags
  * asserting each sketch sits inside its advertised envelope — HLL
  * within 5% of exact distinct (5× the configured rsd), each percentile
  * inside the exact rank neighbourhood q ± 0.01 (the sketch guarantees
  * rank error ≤ 1/accuracy = 10⁻⁴; ±10⁻² is the same 100× slack
  * SketchSpec uses). The flags and the exact columns are
  * engine-replayable integers, so the audit hash-verifies against a
  * second engine that cannot decode the sketches themselves — a
  * machine-checked bounds comparison instead of a rows-only shrug.
  * The audit's exact side is the deliberate price of certification: run
  * it at audit scale (a sampled slice, a holdout day); ship [[profile]]
  * at corpus scale. */
object Sketches {

  /** Per event type: exact n, approximate distinct users, approximate
    * p50/p95 — constant state per group, one pass. */
  def profile(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
      expr("approx_percentile(value, 0.5, 10000)").as("value_p50"),
      expr("approx_percentile(value, 0.95, 10000)").as("value_p95"))

  /** Per event type: exact n and distinct users, plus 1/0 flags that
    * every sketch in [[profile]] sits within its documented error —
    * hash-exact against an engine that can only compute the exact side
    * (the oracle emits the exact columns and literal-true flags; a
    * sketch outside its envelope flips a flag to 0 and fails the hash). */
  def envelopeAudit(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users_exact"),
        approx_count_distinct(col("user_id"), 0.01).as("__au"),
        expr("approx_percentile(value, 0.5, 10000)").as("__p50"),
        expr("approx_percentile(value, 0.95, 10000)").as("__p95"),
        expr("percentile(value, 0.49)").as("__l50"),
        expr("percentile(value, 0.51)").as("__h50"),
        expr("percentile(value, 0.94)").as("__l95"),
        expr("percentile(value, 0.96)").as("__h95"))
      .select(
        col("event_type"), col("n"), col("users_exact"),
        when(abs(col("__au") - col("users_exact")) * 100 <=
          col("users_exact") * 5, 1L).otherwise(0L).as("hll_ok"),
        when(col("__p50") >= col("__l50") && col("__p50") <= col("__h50"),
          1L).otherwise(0L).as("p50_ok"),
        when(col("__p95") >= col("__l95") && col("__p95") <= col("__h95"),
          1L).otherwise(0L).as("p95_ok"))
}
