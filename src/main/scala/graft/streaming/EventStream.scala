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
    * the group's rows sort by (ts, event_id) and purchases fold into the
    * state only after every row AT THE SAME ts has been emitted, so a
    * same-timestamp purchase never attaches (the batch operator's strict
    * semantics, including duplicate (user_id, ts) rows).
    *
    * Correctness contract: per-user event-time order must hold ACROSS
    * micro-batches (state only moves forward) — true for replayed logs
    * and time-ordered sources; out-of-order arrivals need
    * [[purchaseAttributionLate]], the watermark-buffered variant. */
  final case class Attribution(
      event_id: Long, user_id: Long,
      prior_purchase_id: Option[Long], prior_purchase_value: Option[Double])

  /** Emit `rows` (sorted by (ts, event_id)) against `best0`, the latest
    * strictly-prior purchase from earlier batches. Purchases at timestamp
    * T become visible only to rows with ts > T (strict as-of); among
    * same-ts purchases the highest event_id wins (max (ts, event_id)
    * order, matching the batch window's last_value). The `p.ts < row.ts`
    * guard keeps a beyond-watermark straggler from being attributed to a
    * purchase that happened AFTER it — such rows degrade to a missing
    * attribution, never a wrong one.
    * @return (attributions, updated best purchase) */
  private def emitOrdered(
      uid: Long,
      rows: Seq[(Long, Long, String, Double)], // (eid, ts, typ, value) sorted
      best0: Option[(Long, Long, Double)]): // (ts, eid, value)
      (Seq[Attribution], Option[(Long, Long, Double)]) = {
    var best = best0
    var pending: Option[(Long, Long, Double)] = None // latest purchase at curTs
    var curTs = Long.MinValue
    val out = rows.map { case (eid, ts, typ, v) =>
      if (ts != curTs) {
        pending.foreach(p => best = Some(p)); pending = None; curTs = ts
      }
      val b = best.filter(_._1 < ts)
      val a = Attribution(eid, uid, b.map(_._2), b.map(_._3))
      if (typ == "purchase") pending = Some((ts, eid, v))
      a
    }
    pending.foreach(p => best = Some(p))
    (out, best)
  }

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
          val sorted = rows.toSeq.sortBy(r => (r._2, r._1))
            .map(r => (r._1, r._2, r._4, r._5))
          val (out, best) = emitOrdered(uid, sorted, state.getOption)
          best.foreach(state.update)
          out.iterator
      }
  }

  /** Per-user buffered state for [[purchaseAttributionLate]]. */
  final case class AsOfBuffer(
      buffer: Seq[(Long, Long, String, Double)], // (eid, ts nanos, typ, value)
      purchase: Option[(Long, Long, Double)])    // (ts, eid, value)

  /** Out-of-order-tolerant streaming as-of: rows buffer in per-user state
    * and emit only once the event-time watermark passes them — any
    * arrival order within the watermark delay yields EXACTLY the batch
    * result (StreamingSpec shuffles rows across micro-batches to prove
    * it). The flush trigger is twofold: new rows for the user, or an
    * event-time timeout parked at the earliest buffered row, so a user
    * whose stream goes quiet still drains as the global watermark moves.
    *
    * Emission rule: a buffered row is final when `floor(ts/1e6) <
    * watermarkMs` — later arrivals all carry event time ≥ the watermark,
    * which is strictly later in micros and therefore in (ts, event_id)
    * order. State per user is O(rows inside the watermark window), the
    * price of reordering; the in-order variant keeps O(1).
    *
    * Scale shape: one hash exchange on user_id (inherent to per-user
    * state), state-store-backed like every flatMapGroupsWithState — no
    * driver involvement, partitions independent. */
  def purchaseAttributionLate(
      events: DataFrame, watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[Attribution] = {
    import spark.implicits._
    withEventTime(events)
      .withWatermark("ts_utc", watermark)
      // ts_utc must survive the projection: the watermark-tagged
      // attribute has to reach the stateful operator or the planner
      // rejects the event-time timeout
      .select(col("event_id").cast("long"), col("ts").cast("long"),
        col("user_id").cast("long"), col("event_type"),
        col("value").cast("double"), col("ts_utc"))
      .as[(Long, Long, Long, String, Double, java.sql.Timestamp)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[AsOfBuffer, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[AsOfBuffer]) =>
          val st = state.getOption.getOrElse(AsOfBuffer(Nil, None))
          val buf = st.buffer ++
            rows.map(r => (r._1, r._2, r._4, r._5))
          // (r._6, the watermark carrier ts_utc, is otherwise unused)
          val wmMs = state.getCurrentWatermarkMs()
          val (ready, keep) = buf.partition(_._2 / 1000000L < wmMs)
          val (out, best) =
            emitOrdered(uid, ready.sortBy(r => (r._2, r._1)), st.purchase)
          state.update(AsOfBuffer(keep, best))
          if (keep.nonEmpty)
            // park the timeout at the earliest unemitted row (must sit
            // strictly past the current watermark or Spark rejects it)
            state.setTimeoutTimestamp(
              math.max(keep.map(_._2 / 1000000L).min, wmMs + 1))
          out.iterator
      }
  }

  /** One emitted flag row of [[anomalyFlags]] — the streaming image of
    * [[graft.ext.Anomaly.zFlags]]'s schema (None where the batch window
    * frame is empty and SQL yields NULL). */
  final case class ZFlag(
      user_id: Long, event_id: Long, cents: Long, n_win: Long,
      dev_sq: Option[Long], var_thresh: Option[Long], is_anomaly: Boolean)

  /** Streaming twin of the batch trailing-window z-test
    * ([[graft.ext.Anomaly.zFlags]], q88): per-user ring buffer of the
    * last `win` cent values in `flatMapGroupsWithState`, every incoming
    * event tested against its buffered history with the same
    * division-free integer inequality — bit-identical flags to the
    * batch operator on in-order input (StreamingSpec proves parity on
    * the fixture stream). Same in-order contract as
    * [[purchaseAttribution]]: rows within a micro-batch sort by
    * (ts, event_id); cross-batch reordering needs the watermark-buffered
    * pattern of [[purchaseAttributionLate]].
    *
    * State is O(win) longs per user — constant — and the plan is one
    * hash exchange on user_id feeding the state store, the same shape
    * as the batch operator's single window exchange. The cents lift
    * happens in DataFrame-land (DECIMAL cast) so stream and batch share
    * the exact same rounding. */
  def anomalyFlags(
      events: DataFrame, win: Int = 20, minN: Int = 5, theta: Long = 3L)(
      implicit spark: SparkSession): Dataset[ZFlag] = {
    import spark.implicits._
    require(win >= 2 && minN >= 2 && minN <= win && theta >= 1,
      s"bad params: win=$win minN=$minN theta=$theta")
    events
      .select(col("user_id").cast("long"), col("ts").cast("long"),
        col("event_id").cast("long"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[Long], ZFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[Vector[Long]]) =>
          var buf = state.getOption.getOrElse(Vector.empty[Long])
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).map {
            case (_, _, eid, x) =>
              val n = buf.size.toLong
              val s1 = buf.sum
              val s2 = buf.iterator.map(c => c * c).sum
              val dev = if (n >= 1) Some { val d = n * x - s1; d * d } else None
              val vt = if (n >= 1) Some(theta * theta * (n * s2 - s1 * s1))
                else None
              val flag = n >= minN && dev.get > vt.get
              buf = (buf :+ x).takeRight(win)
              ZFlag(uid, eid, x, n, dev, vt, flag)
          }
          state.update(buf)
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
