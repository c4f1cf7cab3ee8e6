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
    * sketch outside its envelope flips a flag to 0 and fails the hash).
    *
    * The percentile check is the two-sided RANK condition (robust to
    * ties): writing nv = non-null count, a value x is an acceptable
    * q-quantile within rank error ε iff `count(< x) ≤ (q+ε)·nv` and
    * `count(≤ x) ≥ (q−ε)·nv`. That costs one broadcast join of the
    * 5-row sketch frame back onto the scan and a map-side-combined
    * conditional count — fully parallel codegen — where an exact
    * `percentile()` would sort each group inside a single object-agg
    * task (measured 6.7 s vs ~2 s at sf0.1). The exact distinct stays:
    * it IS the certification of the HLL. */
  def envelopeAudit(events: DataFrame): DataFrame = {
    val sk = events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("users_exact"),
      approx_count_distinct(col("user_id"), 0.01).as("__au"),
      expr("approx_percentile(value, 0.5, 10000)").as("__p50"),
      expr("approx_percentile(value, 0.95, 10000)").as("__p95"))
    // joins are NULL-SAFE (<=>): a plain equi-join would silently drop a
    // NULL event_type group that the oracle's GROUP BY retains — a latent
    // hash mismatch the moment the fixture ever carries a null key
    val cnts = events
      .join(broadcast(sk.select(col("event_type").as("__et"), col("__p50"),
        col("__p95"))), col("event_type") <=> col("__et"))
      .groupBy("event_type").agg(
        sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("nv"),
        sum(when(col("value") <= col("__p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("__p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("__p95"), 1L).otherwise(0L)).as("le95"),
        sum(when(col("value") < col("__p95"), 1L).otherwise(0L)).as("lt95"))
    sk.join(cnts.withColumnRenamed("event_type", "__et2"),
        col("event_type") <=> col("__et2"))
      .select(
        col("event_type"), col("n"), col("users_exact"),
        when(abs(col("__au") - col("users_exact")) * 100 <=
          col("users_exact") * 5, 1L).otherwise(0L).as("hll_ok"),
        when(col("nv") === 0L ||
          (col("le50") * 100 >= col("nv") * 49 &&
            col("lt50") * 100 <= col("nv") * 51), 1L).otherwise(0L)
          .as("p50_ok"),
        when(col("nv") === 0L ||
          (col("le95") * 100 >= col("nv") * 94 &&
            col("lt95") * 100 <= col("nv") * 96), 1L).otherwise(0L)
          .as("p95_ok"))
  }
}
