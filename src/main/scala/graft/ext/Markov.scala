package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition statistics over per-key event sequences
  * — the behavioural-modelling companion of the sessionization tier
  * (q15): for every observed `(src → dst)` event-type transition, its
  * count and the row-normalised transition probability in exact scaled
  * integers, `p_fp = n·scale div Σ_dst n` — bit-replayable by q80's
  * DuckDB oracle (a float normalisation could drift across engines).
  * Sequence order is `(orderCol, tieCol)` within each key; the explicit
  * tie-break makes the chain deterministic under equal timestamps, the
  * same contract the as-of join (q47) and dedup tie-breaks use.
  *
  * Scale shape: ONE exchange — the per-key window (each key's events
  * sort within its partition, the standard sessionization constraint);
  * the `(src, dst)` count combines map-side into a model-sized frame
  * (|types|² rows), and the row normalisation joins model-side only.
  * Skewed keys concentrate a single key's events, not the corpus. */
object Markov {

  def transitions(
      events: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      typeCol: String,
      scale: Long = 1000000L): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
    val c = events
      .select(col(keyCol), col(orderCol), col(tieCol), col(typeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n_trans"))
    val tot = c.groupBy("src").agg(sum(col("n_trans")).as("tot"))
    c.join(tot, Seq("src"))
      .select(col("src").as("src_type"), col("dst").as("dst_type"),
        col("n_trans"), expr(s"n_trans * ${scale}L div tot").as("p_fp"))
  }
}
