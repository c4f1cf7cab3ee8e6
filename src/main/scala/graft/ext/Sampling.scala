package graft.ext

import graft.learn.DetRandom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-set assembly.
  *
  * Sampling for ML pipelines must be REPRODUCIBLE across partitionings
  * and engines — Spark's `rand(seed)`/`TABLESAMPLE` are partition-seeded,
  * so the selected set changes with `spark.sql.shuffle.partitions`. These
  * operators rank rows by the partition-independent [[DetRandom]] mix of
  * the row's own id, making the sample a pure function of (data, seed)
  * and 1:1 expressible in ANSI SQL.
  */
object Sampling {

  /** Up to `k` rows per stratum, selected by the seeded [[DetRandom]]
    * ranking of the id column (ties broken by id — total order, so the
    * selection is unique).
    *
    * Scale shape: one shuffle on the stratum key; the `row_number ≤ k`
    * filter plans as Spark 4's `WindowGroupLimit`, which keeps only k
    * rows per stratum per MAP partition before the exchange — hot strata
    * never materialise, the shuffle carries ≤ k×partitions rows per
    * stratum. */
  def stratified(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      k: Int,
      seed: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(DetRandom.mix(col(idCol), col(idCol), seed), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic Bernoulli-style sample: keep rows whose seeded
    * [[DetRandom]] uniform falls below `fraction` — the exact-SQL twin of
    * `df.sample(fraction, seed)` without its partition dependence. */
  def bernoulli(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      seed: Long): DataFrame =
    df.filter(DetRandom.uniform(col(idCol), col(idCol), seed) < fraction)
}
