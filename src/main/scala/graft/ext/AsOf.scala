package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the temporal-feature operator every
  * training-data pipeline needs (attach the latest prior measurement /
  * label / event to each example) and Spark has no native form of.
  *
  * For each left row, attaches the payload of the LATEST right row with
  * the same key and an earlier time (strictly earlier in `strict` mode,
  * `≤` otherwise; ties among right rows at one time resolved by the
  * largest `tiebreak`).
  *
  * Scale shape: the naive formulation is a range join — O(|L|·|R|) per
  * key — or, via Spark's own join planner, a BroadcastNestedLoopJoin.
  * This implementation instead UNIONS both sides into one narrow tagged
  * frame and runs a single `last(payload, ignoreNulls)` window pass:
  * ONE shuffle on the key, one in-partition sort, linear work — the
  * merge-join shape a time-series database would pick, expressed in
  * pure DataFrame operators so Catalyst/AQE still handle partition
  * coalescing and skew. Window functions keep whole rows in codegen;
  * payloads ride in a struct so the union stays two data columns wide
  * regardless of payload width.
  */
object AsOf {

  /** @param left      rows to enrich
    * @param right     rows providing the payload
    * @param key       equality key column (both sides)
    * @param time      event-time column (both sides, any orderable type)
    * @param tiebreak  right-side column ordering simultaneous right rows
    *                  (the largest wins)
    * @param payload   right-side columns to attach, in output order
    * @param strict    true = attach only STRICTLY earlier right rows
    *                  (e.g. self-joins that must not match their own row);
    *                  false = right rows at the left row's exact time
    *                  attach too
    * @return          the left frame's columns plus `payload` columns
    *                  (null where no right row qualifies)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tiebreak: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    // side ordering at equal time decides inclusive vs strict: rights
    // sorting BEFORE lefts are visible to them, rights sorting AFTER are
    // not. last(_, ignoreNulls) skips the left rows' null payloads, so a
    // frame ending at CURRENT ROW is correct in both modes.
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val leftCols = left.columns.toSeq
    val leftStructT = org.apache.spark.sql.types.StructType(
      left.schema.fields)
    val payloadStructT = org.apache.spark.sql.types.StructType(
      right.select(payload.map(col): _*).schema.fields)
    val l = left.select(
      col(key).as("__k"), col(time).as("__t"),
      lit(leftSide).as("__side"),
      lit(null).cast(right.select(col(tiebreak)).schema.head.dataType).as("__tb"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(payloadStructT).as("__p"))
    val r = right.select(
      col(key).as("__k"), col(time).as("__t"),
      lit(rightSide).as("__side"),
      col(tiebreak).as("__tb"),
      lit(null).cast(leftStructT).as("__l"),
      struct(payload.map(col): _*).as("__p"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carried", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide && col("__l").isNotNull)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
