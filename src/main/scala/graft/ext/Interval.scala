package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed interval join — the "all right rows within the last W" sibling
  * of [[AsOf]]'s "latest right row" (feature windows, burst detection,
  * attribution windows).
  *
  * A raw range predicate (`r.t BETWEEN l.t − w AND l.t`) gives Spark no
  * equi-key beyond the join key, so per-key it degenerates to a nested
  * loop over hot keys. This implementation BUCKETIZES time by the window
  * width: a right row at time t' can only match left rows in buckets
  * `⌊t'/w⌋` and `⌊t'/w⌋+1`, so the right side replicates exactly 2× into
  * those buckets and the join runs as a plain equi-join on
  * `(key, bucket)` with the exact range predicate as a residual filter —
  * one shuffle, bounded fan-out, AQE-skew-splittable, no nested loop.
  */
object Interval {

  /** All (left row, right payload) pairs with equal `key` and
    * `right.time ∈ (left.time − window, left.time]` — half-open so a row
    * exactly `window` old no longer matches, closed at the left row's own
    * instant (pass the left frame itself as `right` for self-joins; a row
    * then matches itself — filter on payload columns to exclude).
    *
    * @param window  window width in `time`'s own units (must be > 0)
    * @param payload right-side columns to attach, in output order
    * @return        left columns + payload columns, one row PER MATCH
    *                (left rows with no match are dropped — aggregate with
    *                a left join against the left frame to keep them)
    */
  def joinWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      window: Long,
      payload: Seq[String]): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val leftCols = left.columns.toSeq
    // Bucket by FLOOR DIVISION IN LONG ARITHMETIC: `floor(t / w)` would
    // divide as DOUBLE, and beyond 2^53 (e.g. nanosecond epochs) the
    // rounded quotient can land left and right rows in buckets differing
    // by 2 — a silently dropped true match, unrecoverable by the residual
    // range filter. `t - pmod(t, w)` is an exact multiple of w, so the
    // integral `div` equals floor for negative times too.
    def bucket(t: Column): Column =
      call_function("div", t - pmod(t, lit(window)), lit(window))
    val l = left
      .withColumn("__b", bucket(col(time)))
    val r = right.select(
        col(key).as("__rk"), col(time).as("__rt"),
        struct(payload.map(col): _*).as("__p"))
      .withColumn("__b",
        explode(array(bucket(col("__rt")), bucket(col("__rt")) + 1)))
    l.join(r,
        col(key) === col("__rk") && l("__b") === r("__b") &&
          col("__rt") > col(time) - window && col("__rt") <= col(time))
      .select(leftCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
