package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-shaped anomaly detection over an event log: flag events
  * whose value deviates from the entity's own trailing window by more
  * than `theta` standard deviations — the per-user outlier gate a
  * telemetry/quality pipeline runs before events feed training
  * aggregates (and the batch twin of the alerting rule a monitor runs).
  *
  * The window is the `win` events STRICTLY BEFORE the current one — the
  * current value is judged against its own history, never against
  * itself. (A self-inclusive window caps the reachable z² at (n−1)²∕n:
  * one outlier inflates the variance it is tested against, so a lone
  * spike in a constant window could mathematically never flag at θ = 3
  * until n ≥ 11. The exclusive frame has no such cap, and is the
  * semantics a monitor means by "deviates from its history".)
  *
  * Exactness: the z-test runs entirely in integer arithmetic. With the
  * value lifted to exact integer cents `x` and prior-window sums
  * `s1 = Σx, s2 = Σx²` over those `n` events,
  *
  *   `z² > θ²  ⟺  (n·x − s1)² > θ² · (n·s2 − s1²)`
  *
  * — both sides exact 64-bit integers, no division, no square root, so
  * the flag is bit-replayable by a second engine ([[graft.SparkEntry]]
  * q88's DuckDB oracle) where a float mean/stddev never hashes. A
  * constant prior window (zero variance) flags any deviation, the
  * textbook degenerate case, and histories shorter than `minN` never
  * flag (warm-up suppression). Overflow bound: `(n·x)² < 2⁶³` needs
  * `|cents| < 3×10⁸ ∕ n` — values to ~$150k at the default window of 20;
  * larger domains size the cent scale down.
  *
  * Scale shape: one shuffle on the entity key, then a single window
  * pass computes count, `Σx` and `Σx²` over `ROWS win−1 PRECEDING`
  * in one frame traversal — per-entity history never leaves its
  * partition, hot entities cost their own event count, nothing is
  * driver-side. The streaming twin is
  * [[graft.streaming.EventStream.anomalyFlags]] — a
  * `flatMapGroupsWithState` ring buffer per key, parity-proved in
  * StreamingSpec. */
object Anomaly {

  /** Per-event trailing-window z-test flags. Input must provide an
    * entity key, an event-time ordering column (ties broken by
    * `tiebreakCol`, which must be unique per key), and a 2-decimal
    * value column (lifted to exact cents via DECIMAL — never float
    * multiplication). Returns every event with its prior-window
    * population `n_win` (0 for a key's first event), the deviation and
    * variance test terms, and the flag: `(keyCol, tiebreakCol, cents,
    * n_win, dev_sq, var_thresh, is_anomaly)`. */
  def zFlags(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      tiebreakCol: String,
      valueCol: String,
      win: Int = 20,
      minN: Int = 5,
      theta: Long = 3L): DataFrame = {
    require(win >= 2, s"win must be >= 2: $win")
    require(minN >= 2 && minN <= win, s"need 2 <= minN <= win: $minN")
    require(theta >= 1, s"theta must be >= 1: $theta")
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col(tiebreakCol))
      .rowsBetween(-win, -1)
    events
      .select(col(keyCol), col(timeCol), col(tiebreakCol),
        (col(valueCol).cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s1", sum(col("cents")).over(w))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w))
      .select(col(keyCol), col(tiebreakCol), col("cents"), col("n_win"),
        expr("(n_win * cents - s1) * (n_win * cents - s1)").as("dev_sq"),
        expr(s"${theta * theta}L * (n_win * s2 - s1 * s1)").as("var_thresh"),
        (col("n_win") >= minN &&
          expr("(n_win * cents - s1) * (n_win * cents - s1)") >
            expr(s"${theta * theta}L * (n_win * s2 - s1 * s1)")).as("is_anomaly"))
  }
}
