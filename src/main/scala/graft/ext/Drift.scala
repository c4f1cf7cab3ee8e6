package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift scoring between two periods of the same stream —
  * the monitor a training-data pipeline runs before admitting a new
  * crawl/period into the mix (the PSI/chi-square drift check of every
  * production feature store, in graft's exact-integer form so q95's
  * DuckDB oracle replays it bit-for-bit).
  *
  * For each group (e.g. event type), the per-bin rates of the two
  * periods in ppm — `r_p(bin) = c_p(bin)·10^6 div n_p` — and two
  * divergences over the shared bin set:
  *
  *   `tv_ppm`  = (Σ_bins |r1 − r2|) div 2        — total variation, ppm
  *   `chi2_fp` = Σ_bins (r1 − r2)² div (r1+r2+1) — χ²-shaped divergence
  *
  * Total variation is the exact half-L1 distance between the two rate
  * vectors (the bound every mixture-shift argument quotes); the χ²
  * form squares the per-bin gap against its pooled mass, so one moved
  * hot bin outweighs many jittering cold ones (the +1 floors the empty-
  * bin division; the classical PSI needs `ln` and so can never
  * hash-verify — this pair covers the same decision with exact
  * integers, the q62/q75 trade). Groups missing from either period are
  * dropped (no rates to compare — the caller sees absence itself as
  * the drift signal).
  *
  * Scale shape: one map-side-combined `groupBy(group, bin)` with
  * conditional counts for both periods in the same pass (the input is
  * scanned ONCE), then one `groupBy(group)` over the |groups|·|bins|
  * count frame — at any corpus scale the second exchange moves only
  * the histogram, never rows. No window, no join on data rows. */
object Drift {

  /** @param periodCol integer column: 0 = baseline period, 1 = current;
    *   rows with any other value are ignored (the caller's period
    *   arithmetic may produce a partial trailing period — q95 does). */
  def score(
      df: DataFrame,
      groupCol: String,
      binCol: String,
      periodCol: String): DataFrame = {
    val counts = df
      .filter(col(periodCol).isin(0, 1))
      .groupBy(col(groupCol).as("grp"), col(binCol).as("bin"))
      .agg(
        sum(when(col(periodCol) === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col(periodCol) === 1, 1L).otherwise(0L)).as("c2"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp")
    counts
      .withColumn("n1", sum(col("c1")).over(w))
      .withColumn("n2", sum(col("c2")).over(w))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("grp"), col("n1"), col("n2"),
        expr("c1 * 1000000L div n1").as("r1"),
        expr("c2 * 1000000L div n2").as("r2"))
      .groupBy("grp")
      .agg(
        first(col("n1")).as("n1"),
        first(col("n2")).as("n2"),
        count(lit(1)).as("n_bins"),
        expr("sum(abs(r1 - r2)) div 2").as("tv_ppm"),
        sum(expr("(r1 - r2) * (r1 - r2) div (r1 + r2 + 1)")).as("chi2_fp"))
  }
}
