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

  /** Budget-filling admission (data mixing): keep each group's rows, in
    * seeded [[DetRandom]] admission order, while the running `weightCol`
    * sum stays within `budget` (a per-row expression over `groupCol`) —
    * the training-mixture constructor that fills per-source token
    * budgets. Returns the input columns plus `cum_w`, the admission-order
    * running sum INCLUDING the row (a row is admitted iff `cum_w` ≤ its
    * group's budget; integer weights make membership engine-exact).
    *
    * Scale shape — the same trick as the dense-id ranker, NOT one
    * cumulative window per group (which would funnel a whole group — a
    * language, at corpus scale — through one task): range-partition by
    * (group, admission rank), compute per-(partition, group) weight
    * totals (a tiny frame: partitions × groups rows), prefix-sum those
    * per group, broadcast the offsets back, and finish with a LOCAL
    * cumulative window per (partition, group) — every window partition
    * is one task's slice of one group, so hot groups parallelise across
    * the cluster. The result equals the naive global window exactly
    * (offset + local running sum = global running sum in admission
    * order, independent of where the range bounds fall);
    * SamplingSpec asserts the equivalence. */
  def budgeted(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      budget: org.apache.spark.sql.Column,
      seed: Long): DataFrame = {
    val r = DetRandom.mix(col(idCol), col(idCol), seed)
    val ranked = df
      .repartitionByRange(col(groupCol), r, col(idCol))
      .withColumn("__r", r)
      .withColumn("__pid", spark_partition_id())
    val totals = ranked.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(weightCol)).as("__w"))
      .withColumn("__off",
        coalesce(sum(col("__w")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(groupCol), col("__off"))
    val localW = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(col("__r"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.join(broadcast(totals), Seq("__pid", groupCol))
      .withColumn("cum_w", col("__off") + sum(col(weightCol)).over(localW))
      .filter(col("cum_w") <= budget)
      .drop("__r", "__pid", "__off")
  }
}
