package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming ingest over the `events` fixture — the extension
  * surface SURVEY.md §2.10 plans (the reference is batch-only; its closest
  * analogue is the request/response graph mutation, `inference.py:44-76`).
  *
  * All transforms take/return DataFrames so each works identically on a
  * batch frame (`spark.read`) and a stream (`spark.readStream`) — the spec
  * asserts batch/stream parity on the same rows. Watermarks bound state:
  * at production rates the windowed aggregations keep one state row per
  * (window, event_type), evicted `watermark` past the window end.
  */
object EventStream {

  /** The fixture's file schema (`ts` is parquet TIMESTAMP(NANOS) read as
    * raw nanos — see Tables.load). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTime(spark.readStream.schema(eventsSchema).parquet(dir))
  }

  /** Nanos long → proper event-time timestamp column `ts_utc`. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts_utc",
      timestamp_micros(floor(col("ts") / lit(1000L)).cast("long")))

  /** Tumbling-window counts/sums per event type (the streaming twin of
    * SparkEntry q13). DECIMAL accumulation for order-independent sums. */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("total"))

  /** Sliding-window event rate. */
  def slidingAgg(events: DataFrame, window_ : String = "1 hour",
      slide: String = "15 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Declarative sessionization: events within `gap` of each other per
    * user merge into one session row (Spark's native `session_window`). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(session_window(col("ts_utc"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup: drop events whose `idCol` was already seen,
    * with state bounded by the watermark (Spark's
    * `dropDuplicatesWithinWatermark` — late duplicates beyond the
    * watermark age out of the state store instead of accumulating
    * forever). The streaming twin of the batch hash-dedup (q30).
    * Note: rows are only EMITTED once the watermark passes their event
    * time (observed behaviour on 4.1 — plan on a watermark's worth of
    * output latency, not immediate pass-through). */
  def dedupStream(events: DataFrame, idCol: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .dropDuplicatesWithinWatermark(Seq(idCol))

  /** Custom keyed state (the `mapGroupsWithState` surface, SURVEY.md
    * §2.10): cumulative per-user event count + value total maintained
    * across micro-batches. Emits the updated running totals each batch. */
  final case class UserTotals(user_id: Long, n_events: Long, total: Double)

  /** Streaming twin of the batch as-of join (ext.AsOf / q47): attach each
    * event to the user's latest STRICTLY-prior purchase, carrying one
    * state row per user — (ts, id, value) of the best purchase so far —
    * across micro-batches instead of re-scanning history. Within a batch
    * the group's rows sort by (ts, event_id); each row is emitted against
    * the state BEFORE any same-row purchase updates it, which reproduces
    * the batch operator's strict semantics exactly.
    *
    * Correctness contract: per-user event-time order must hold ACROSS
    * micro-batches (state only moves forward) — true for replayed logs
    * and time-ordered sources; out-of-order arrivals need the watermarked
    * buffering variant, which this fixture doesn't require. */
  final case class Attribution(
      event_id: Long, user_id: Long,
      prior_purchase_id: Option[Long], prior_purchase_value: Option[Double])

  def purchaseAttribution(
      events: DataFrame)(implicit spark: SparkSession): Dataset[Attribution] = {
    import spark.implicits._
    events
      .select(col("event_id").cast("long"), col("ts").cast("long"),
        col("user_id").cast("long"), col("event_type"),
        col("value").cast("double"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[(Long, Long, Double), Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[(Long, Long, Double)]) =>
          var cur = state.getOption // (ts, event_id, value) of latest purchase
          val out = rows.toSeq.sortBy(r => (r._2, r._1)).map {
            case (eid, ts, _, typ, v) =>
              val a = Attribution(eid, uid, cur.map(_._2), cur.map(_._3))
              if (typ == "purchase") cur = Some((ts, eid, v))
              a
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  def runningUserTotals(
      events: DataFrame)(implicit spark: SparkSession): Dataset[UserTotals] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserTotals](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[(Long, Double)]) =>
          val (n0, t0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var t = t0
          rows.foreach { case (_, v) => n += 1; t += v }
          state.update((n, t))
          UserTotals(uid, n, t)
      }
  }
}
