package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over per-key event streams — the product-
  * analytics staple: how many keys (users) reach step 1, then step 2
  * AFTER their step-1 time, then step 3 after that, … Strictly-after
  * semantics with the FIRST qualifying occurrence per step (the
  * classic "unordered events, ordered funnel" definition); optionally
  * each step must land within `within` of the previous (same units as
  * the order column). Returns one row per step:
  * `(step_idx, step, n_keys)` — exact counts, replayed by q81's oracle.
  *
  * Scale shape: per step one equi-join of that step's events against
  * the |keys|-sized frontier (pushed type filter prunes the scan) and
  * one map-side-combined min-aggregate; the result rows are 1-row
  * aggregates unioned — no windows over the whole stream, no
  * driver-side data. Funnel depth bounds the stage count, exactly like
  * the fixed-round propagation family. */
object Funnel {

  def funnel(
      events: DataFrame,
      keyCol: String,
      orderCol: String,
      typeCol: String,
      steps: Seq[String],
      within: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    def stageCount(frontier: DataFrame, idx: Int): DataFrame =
      frontier.agg(count(lit(1)).as("n_keys"))
        .select(lit(idx + 1L).as("step_idx"), lit(steps(idx)).as("step"),
          col("n_keys"))
    def ofType(t: String): DataFrame = events
      .filter(col(typeCol) === t)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"))
    var frontier = ofType(steps.head).groupBy("__k").agg(min("__o").as("__s"))
    var out = stageCount(frontier, 0)
    steps.drop(1).zipWithIndex.foreach { case (t, i) =>
      val bound: Column = within
        .map(w => col("__o") <= col("__s") + lit(w)).getOrElse(lit(true))
      frontier = ofType(t)
        .join(frontier.select(col("__k"), col("__s")), Seq("__k"))
        .filter(col("__o") > col("__s") && bound)
        .groupBy("__k").agg(min("__o").as("__s"))
      out = out.unionByName(stageCount(frontier, i + 1))
    }
    out
  }

  /** Cohort retention — the other product-analytics staple: bucket every
    * key by its FIRST-activity calendar day (the cohort), then count how
    * many of each cohort's keys are active again `offset` days later:
    * `(cohort_day 'yyyy-MM-dd', day_offset, n_users)`, exact counts
    * (q82's oracle). `dayCol` must already be a date column — the caller
    * owns the timestamp→date convention (q82 converts the nanos-long
    * fixture column in UTC, matching the oracle's CAST(ts AS DATE)).
    *
    * Scale shape: one distinct (key, day) exchange (map-side combined),
    * a per-key min for the cohort, one key-equi-join back, and the final
    * (cohort, offset) count — activity is deduped per day FIRST, so the
    * join and count move |keys|·|active days| rows, not raw events. */
  def retention(
      events: DataFrame,
      keyCol: String,
      dayCol: String): DataFrame = {
    val ud = events.select(col(keyCol).as("__k"), col(dayCol).as("__d"))
      .distinct()
    val cohort = ud.groupBy("__k").agg(min("__d").as("__c"))
    ud.join(cohort, Seq("__k"))
      .groupBy(
        date_format(col("__c"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("__d"), col("__c")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
