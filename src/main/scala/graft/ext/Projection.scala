package graft.ext

import graft.learn.DetRandom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection with ±1 signs (Achlioptas
  * 2003, "Database-friendly random projections" — the sparse-sign
  * family that needs no Gaussian sampling), over graft's shift-free
  * scaled-long image `w_i = floor(x_i·10^6)`: the dimensionality-
  * reduction step a pipeline runs before shipping embeddings into a
  * cheaper prefilter (8-dim sketches for candidate pruning, cluster
  * routing, locality keys). With ±1 entries the projection is pure
  * integer arithmetic — `out_j = Σ_i w_i · s_ij` with
  * `s_ij = 1 − 2·(mix(i, j, seed) mod 2)` from [[DetRandom]] — so the
  * whole transform replays bit-for-bit in a second engine (q98's
  * oracle embeds the SAME sign matrix as SQL literals, generated from
  * [[DetRandom.mixLong]], the driver-side twin of the column hash).
  *
  * |out_j| ≤ dims·10^6, far inside 2^63 (and inside double's exact-
  * integer range, which is what lets DuckDB's list arithmetic replay
  * it).
  *
  * Scale shape: the sign matrix is `dims × outDims` CONSTANTS folded
  * into the expression tree — no join, no broadcast variable, no
  * shuffle; the projection is one row-local codegen projection over
  * the scan (`zip_with` + `aggregate` per output dim), then a
  * `posexplode` to (vector, out-dim) rows. Embarrassingly parallel at
  * any corpus scale, like [[Quantize]]. */
object Projection {

  /** The ±1 sign matrix, row-major by output dim: `signs(j)(i)`. */
  def signMatrix(dims: Int, outDims: Int, seed: Long): Seq[Seq[Long]] =
    Seq.tabulate(outDims)(j =>
      Seq.tabulate(dims)(i => 1L - 2L * (DetRandom.mixLong(i, j, seed) % 2L)))

  /** One row per (vector, output dim): `(idCol, j, proj_fp)`.
    *
    * A vector whose length differs from `dims` RAISES at runtime
    * rather than silently diverging: `zip_with` pads the shorter side
    * with nulls, so a short vector would yield a NULL projection here
    * while the oracle (which sums only its `dims` literal terms) would
    * return a finite number for a long one — a size guard turns that
    * engine divergence into a loud error. */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      outDims: Int,
      seed: Long): DataFrame = {
    val signs = signMatrix(dims, outDims, seed)
    val outs = signs.map { sj =>
      s"aggregate(zip_with(__w, array(${sj.mkString("L,")}L)," +
        " (x, s) -> x * s), 0L, (a, y) -> a + y)"
    }
    df.select(col(idCol),
        when(size(col(vecCol)) === dims, expr(
          s"transform($vecCol, x -> cast(floor(x * 1000000.0) as bigint))"))
          .otherwise(raise_error(concat(
            lit(s"Projection.project: $vecCol has size "),
            // a NULL vector reaches this branch too (NULL condition picks
            // otherwise); coalesce keeps the diagnostic readable instead of
            // letting concat() null out the whole error message
            coalesce(size(col(vecCol)).cast("string"), lit("NULL")),
            lit(s", expected $dims"))))
          .as("__w"))
      .select(col(idCol), posexplode(expr(s"array(${outs.mkString(",")})")))
      .select(col(idCol), col("pos").cast("long").as("j"),
        col("col").as("proj_fp"))
  }
}
