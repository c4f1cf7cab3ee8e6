package graft.learn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-independent deterministic pseudo-randomness.
  *
  * The reference gets reproducibility from global seeding of
  * torch/numpy/random (`setup.py:7-21`). Spark's `rand(seed)` is seeded
  * *per partition*, so its output changes with partitioning — it would
  * break the t2 requirement that split/negative-sample hashes be identical
  * across `spark.sql.shuffle.partitions` settings (FIXTURES.md §A.6,
  * SURVEY.md §7.4 hard part 2). Instead: a multiplicative-mix hash over the
  * edge's own key columns, pure column arithmetic — same value for a row no
  * matter where it is computed, expressible 1:1 in the DuckDB oracle's SQL,
  * and ANSI-safe (all intermediates bounded < 2^63).
  */
object DetRandom {
  /** Modulus (prime). */
  val M: Long = 1000000007L
  /** Multipliers, both < M so `(x % M) * A` stays < ~1.1e18 < 2^63. */
  val A: Long = 1103515245L
  val B: Long = 40503L

  /** Deterministic value in [0, M) mixed from two key columns + seed.
    * Two-stage: the linear combine alone is order-preserving under seed
    * shifts (seed+1 just rotates every value by 1/M, leaving per-group
    * rankings intact); the second multiply-mod scrambles so nearby seeds
    * produce unrelated orderings. All intermediates < ~1.1e18 < 2⁶³. */
  def mix(a: Column, b: Column, seed: Long): Column = {
    val x = (pmod(a.cast("long"), lit(M)) * lit(A)
      + pmod(b.cast("long"), lit(M)) * lit(B)
      + lit(seed % M)) % lit(M)
    (x * lit(A) + lit(seed % M)) % lit(M)
  }

  /** Deterministic uniform in [0, 1). */
  def uniform(a: Column, b: Column, seed: Long): Column =
    mix(a, b, seed).cast("double") / lit(M.toDouble)

  /** Driver-side twin of [[mix]] for CONSTANT inputs (e.g. the
    * [[graft.ext.Projection]] sign matrix, whose cells depend only on
    * literal (dim, out-dim) indices): identical arithmetic over plain
    * longs, so a value computed here, by the Column expression, and by
    * [[mixSql]] in DuckDB is the same number — ProjectionSpec asserts
    * the three-way parity. */
  def mixLong(a: Long, b: Long, seed: Long): Long = {
    def pm(x: Long): Long = ((x % M) + M) % M
    val x = (pm(a) * A + pm(b) * B + seed % M) % M
    (x * A + seed % M) % M
  }

  /** The same expression as ANSI SQL text, for DuckDB oracle parity. */
  def mixSql(a: String, b: String, seed: Long): String = {
    val x = s"(((($a) % $M + $M) % $M) * $A + ((($b) % $M + $M) % $M) * $B + ${seed % M}) % $M"
    s"(($x) * $A + ${seed % M}) % $M"
  }

  def uniformSql(a: String, b: String, seed: Long): String =
    s"CAST(${mixSql(a, b, seed)} AS DOUBLE) / $M.0"
}
