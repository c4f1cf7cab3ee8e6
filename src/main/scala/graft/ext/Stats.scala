package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics for corpus analysis.
  *
  * `percentile_approx` sketches are partition-order dependent and can
  * never hash-verify; interpolating exact percentiles are float
  * arithmetic that differs across engines. The DISCRETE quantile — the
  * element whose rank is ⌈q·n⌉ in a total order — is engine-independent:
  * integer rank arithmetic selects an actual data value, so results are
  * exactly reproducible and ANSI-expressible.
  */
object Stats {

  /** Discrete quantiles per group: for each `(num, den)` with
    * 0 < num ≤ den, the value at rank `⌈num·n/den⌉` of the group's
    * `(value, tiebreak)` order (n = group size; the tiebreak makes the
    * order total, so selection is unique even under duplicate values).
    *
    * Scale shape: ONE exchange on the group key and one in-partition
    * sort; `row_number` and the group count run as window passes over
    * the same sort, every requested quantile filters from the same
    * ranked frame. Quantile ranks use exact integer ceiling arithmetic
    * (`(num·n + den − 1) div den`) — no float rank rounding.
    *
    * @return one row per (group, quantile): groupCol, `q` (num/den as
    *         double, label only), `value`
    */
  def quantilesDisc(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tiebreakCol: String,
      quantiles: Seq[(Int, Int)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tiebreakCol))
    val ranked = df
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    quantiles.map { case (num, den) =>
      require(num > 0 && num <= den, s"quantile $num/$den out of (0,1]")
      ranked
        .filter(col("__rk") === expr(s"($num * __n + ${den - 1}) div $den"))
        .select(col(groupCol),
          (lit(num).cast("double") / den).as("q"),
          col(valueCol).as("value"))
    }.reduce(_ unionByName _)
  }
}
