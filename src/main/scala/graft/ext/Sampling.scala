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
    runningSum(df, Seq(groupCol), Seq(r, col(idCol)), weightCol, "cum_w")
      .filter(col("cum_w") <= budget)
  }

  /** Deterministic weighted PRIORITY SAMPLE (Duffield, Lund & Thorup,
    * "Priority sampling", JACM 2007): the top-`k` rows by priority
    * `w/u` with `u` seeded-uniform — inclusion probability tracks the
    * weight (a 100× heavier document is ~100× likelier to survive the
    * cut), the weighted corpus-subsampling step between q48's
    * stratified draw (no weights) and q64's budget fill (hard quotas).
    * Reproducible bit-for-bit from (data, seed): the priority ships as
    * the exact integer image `(w·M) div (mix+1)` with mix ∈ [0, M), so
    * both engines rank identical numbers and the deterministic
    * (priority DESC, id) cut is hash-exact.
    *
    * Scale shape: one row-local projection + `TakeOrderedAndProject` —
    * no global sort, no shuffle beyond the top-k combine. Rows with
    * weight < 1 are excluded (zero-weight rows can't carry mass). */
  def prioritySample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    df.filter(col(weightCol) >= 1)
      .withColumn("__u",
        DetRandom.mix(col(idCol), col(idCol), seed) + lit(1L))
      .withColumn("priority_fp",
        expr(s"($weightCol * ${DetRandom.M}L) div __u"))
      .drop("__u")
      .orderBy(desc("priority_fp"), asc(idCol))
      .limit(k)
  }

  /** Scale-safe grouped running sum — the shared kernel behind
    * [[budgeted]] and [[Packing.concatChunk]]. Computes, for every row,
    * the running `weightCol` sum over rows of the same `groupCols` value
    * that sort ≤ it under `order` (inclusive of the row), WITHOUT one
    * cumulative window per group: range-partition by (group, order),
    * aggregate per-(partition, group) weight totals (a tiny frame —
    * partitions × groups rows), prefix-sum those per group on the driver
    * side of a broadcast, and finish with a LOCAL cumulative window per
    * (partition, group) — every window partition is one task's slice of
    * one group, so hot groups (or with `groupCols = Nil`, the single
    * global sequence) parallelise across the cluster. Equal to the naive
    * global window exactly; SamplingSpec and PackingSpec assert it.
    *
    * `order` must be a total order per group (pass a tiebreak column);
    * `weightCol` must be integral (LONG running sums, engine-exact).
    *
    * CORRECTNESS PIN (r15): `ranked` is consumed by two branches — the
    * per-(partition, group) totals and the offset join — and both must
    * observe the SAME physical range partitioning, because `__pid` is
    * `spark_partition_id()`. Lazily un-pinned, that only holds while
    * Catalyst plans ONE reused exchange under both branches; a wide
    * input column used by just one branch lets column pruning push
    * DIFFERENT projections below the exchange, the subtrees stop being
    * identical, reuse is lost, and the two exchanges sample range
    * boundaries independently (RangePartitioner seeds by rddId) — the
    * offset join then drops rows SILENTLY wherever the two samplings
    * disagree (observed: shardSequences lost half its corpus at sf0.1;
    * small inputs are sampled exactly, so fixtures pass by luck). The
    * lazy localCheckpoint pins one evaluated RDD for both branches —
    * partition labels become facts, not plan coincidences. The price is
    * one materialisation of the input; keep kernel inputs pruned to
    * (group, order, weight, carried keys) so the pinned frame is a slim
    * ledger, and join payloads back downstream ([[Packing
    * .shardSequences]] does exactly this). */
  private[ext] def runningSum(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[org.apache.spark.sql.Column],
      weightCol: String,
      out: String): DataFrame = {
    val g = groupCols.map(col)
    val ranked = df
      .repartitionByRange((g ++ order): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false) // see CORRECTNESS PIN above
    val totals = ranked.groupBy(col("__pid") +: g: _*)
      .agg(sum(col(weightCol)).as("__w"))
      .withColumn("__off",
        coalesce(sum(col("__w")).over(
          Window.partitionBy(g: _*).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid") +: g :+ col("__off"): _*)
    val localW = Window.partitionBy(col("__pid") +: g: _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.join(broadcast(totals), "__pid" +: groupCols)
      .withColumn(out, col("__off") + sum(col(weightCol)).over(localW))
      .drop("__pid", "__off")
  }
}
