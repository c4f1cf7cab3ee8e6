package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization of an embedding column — the index-
  * compression step every billion-vector ANN deployment applies before
  * serving (an int8 codebook is 4× smaller than float32 and SIMD-dots
  * faster), here over graft's shift-free scaled-long image
  * (`floor(x·10^6)`, the q45/q68 convention) so the whole codec is
  * exact integer arithmetic and a DuckDB oracle replays it bit-for-bit.
  *
  * Per vector: `amax = max(1, max_i |w_i|)` (the 1-floor makes the
  * all-zero vector quantize to zeros instead of dividing by zero), and
  * per element the quantized code and its reconstruction error
  *
  *   `q_i   = sign(w_i) · (|w_i| · 127 div amax)`          ∈ [−127, 127]
  *   `err_i = |w_i − sign(q_i) · (|q_i| · amax div 127)|`
  *
  * Both divisions run on non-negative operands with the sign reapplied
  * outside — Spark's `div` truncates toward zero while DuckDB's `//`
  * floors, so signed division would diverge on negative codes; the
  * sign-folded form is identical in both engines (the
  * [[Stats.quantilesDiscSelect]] / q91 trade).
  *
  * Scale shape: one row-local codegen projection over the scan — the
  * per-vector reduce (`aggregate`) and map (`transform`) never leave
  * the row — then a `posexplode` to (vector, dim) rows. No exchange,
  * no join, no window: at 100 TB this is a pure map over the corpus,
  * embarrassingly parallel at any executor count. */
object Quantize {

  /** One row per (vector, dimension): `(idCol, i, q, amax, err)`. */
  def int8Rows(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), expr(
        s"transform($vecCol, x -> cast(floor(x * 1000000.0) as bigint))")
        .as("w"))
      .withColumn("amax",
        greatest(expr("aggregate(w, 0L, (a, x) -> greatest(a, abs(x)))"),
          lit(1L)))
      .select(col(idCol), col("amax"), posexplode(expr(
        "transform(w, x -> named_struct(" +
          "'w', x," +
          "'q', if(x < 0, -((-x) * 127L div amax), (x * 127L) div amax)))")))
      .select(col(idCol), col("pos").cast("long").as("i"),
        col("col.q").as("q"), col("amax"),
        abs(col("col.w") - expr(
          "if(col.q < 0, -((-col.q) * amax div 127L), col.q * amax div 127L)"))
          .as("err"))
}
