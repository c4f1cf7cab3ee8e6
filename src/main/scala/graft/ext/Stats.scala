package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

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

  /** [[quantilesDisc]] without the per-group sort — the 100 TB tier.
    *
    * `quantilesDisc`'s window funnels EVERY row of a group through one
    * task's sort; with languages or event types as groups, a 100 TB
    * corpus puts terabytes through a handful of tasks. This variant is
    * the classic distributed selection: the value at rank k is the
    * smallest v with |{x ≤ v}| ≥ k, found by iterative histogram
    * refinement — each pass is ONE map-side-combinable aggregation
    * (counts per (group, quantile, bucket), ≤ `fanout` buckets, constant
    * state per task) and the driver narrows each quantile's value
    * interval by the bucket its rank falls in. Buckets are explicit
    * boundary lists compared with `<` (no float bucket arithmetic), so
    * the narrowing is exact; passes ≈ log_fanout(value range). Every
    * pass re-scans the (persisted) value frame, so fanout trades
    * per-task aggregation state (groups × quantiles × fanout counters)
    * against scan count: the default 1024 needs ~6.4 passes for the
    * worst-case full 2⁶⁴ sign-folded double bit range and 2-3 for
    * realistic integer columns, at ~8 KB of counter state per target.
    *
    * Same result as [[quantilesDisc]] (the rank-k order statistic is
    * tiebreak-independent), asserted bit-exactly in StatsSpec's
    * equivalence property (random groups × long/double values, −0.0/NaN,
    * |v| > 2⁵³, null groups). Integral and float/double value columns are
    * supported; floating values traverse the selection as their
    * order-isomorphic long bit-image (exact, no rounding; −0.0 orders
    * just below +0.0, NaN greatest — Spark's sort order) and integrals
    * stay `long` end-to-end (never widened through double, so the full
    * 2⁶³ range is exact). Null GROUP values form a normal group, as in a
    * SQL window partition; null VALUES are ignored, matching a rank over
    * a NOT NULL filter.
    *
    * The per-pass `collect()` moves only (groups × quantiles × fanout)
    * counters — driver-side METADATA, like the dense-PK probe, never
    * row data. */
  def quantilesDiscSelect(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      quantiles: Seq[(Int, Int)],
      fanout: Int = 1024): DataFrame = {
    require(fanout >= 2, s"fanout $fanout must be >= 2")
    quantiles.foreach { case (num, den) =>
      require(num > 0 && num <= den, s"quantile $num/$den out of (0,1]") }
    val spark = df.sparkSession
    val floating = df.schema(valueCol).dataType match {
      case DoubleType | FloatType => true
      case _                      => false
    }
    // order-isomorphic long image of the value column: identity for
    // integrals; the sign-folded IEEE bit pattern for floats/doubles
    // (codegen [[graft.functions.expressions.DoubleSortableBits]])
    val vAsLong: Column =
      if (!floating) col(valueCol).cast("long")
      else org.apache.spark.sql.GraftExpressionBridge.column(
        graft.functions.expressions.DoubleSortableBits(
          org.apache.spark.sql.GraftExpressionBridge.expression(
            col(valueCol).cast("double"))))
    val mapped0 = df.select(col(groupCol).as("g"), vAsLong.as("v"))
    val mapped = mapped0.filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 0: group sizes and value ranges — one aggregation
      val base = mapped.groupBy("g")
        .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
        .collect()
      // one selection target per (group, quantile): find smallest v in
      // [lo, hi] whose cumulative count reaches k (k counted within the
      // current interval — rows below lo are already accounted)
      final case class Target(g: Any, qIdx: Int, var lo: Long, var hi: Long,
          var k: Long, var done: Boolean)
      val targets = (for {
        row <- base
        ((num, den), qi) <- quantiles.zipWithIndex
      } yield {
        val n = row.getLong(1)
        val k = (num.toLong * n + den - 1) / den // ceil(num·n/den), exact
        Target(row.get(0), qi, row.getLong(2), row.getLong(3), k,
          done = row.getLong(2) == row.getLong(3))
      }).toSeq
      // group key for driver-side maps and the broadcast state join:
      // Option-wrapped string (None = SQL NULL group; the join below is
      // null-safe `<=>`, so the null group selects like any other)
      def gkey(g: Any): Option[String] = Option(g).map(_.toString)
      var pending = targets.filterNot(_.done)
      while (pending.nonEmpty) {
        // driver-chosen EXPLICIT boundaries per target (BigInt arithmetic:
        // hi−lo may overflow a long for sign-folded doubles)
        val cutsOf: Map[(Option[String], Int), Seq[Long]] = pending.map { t =>
          val loB = BigInt(t.lo); val hiB = BigInt(t.hi)
          val span = hiB - loB + 1
          val cuts =
            if (span <= fanout) (t.lo until t.hi).toSeq // width-1 buckets
            else (1 until fanout).map(i => (loB + span * i / fanout).toLong)
              .distinct.filter(c => c >= t.lo && c < t.hi)
          (gkey(t.g), t.qIdx) -> cuts
        }.toMap
        import spark.implicits._
        val stateDf = pending.map { t =>
          (gkey(t.g).orNull, t.qIdx, t.lo, t.hi, cutsOf((gkey(t.g), t.qIdx)))
        }.toDF("gs", "qi", "lo", "hi", "cuts")
        // bucket(v) = #cuts strictly below v — pure long comparisons,
        // binary-searched in codegen (SortedLowerBound; the interpreted
        // `size(filter(...))` lambda was O(fanout) per row and capped
        // useful fanout at ~64)
        def lowerBound(cuts: Column, v: Column): Column =
          org.apache.spark.sql.GraftExpressionBridge.column(
            graft.functions.expressions.SortedLowerBound(
              org.apache.spark.sql.GraftExpressionBridge.expression(cuts),
              org.apache.spark.sql.GraftExpressionBridge.expression(v)))
        val counts = mapped
          .join(broadcast(stateDf), col("g").cast("string") <=> col("gs"))
          .filter(col("v") >= col("lo") && col("v") <= col("hi"))
          .groupBy(col("gs"), col("qi"),
            lowerBound(col("cuts"), col("v")).as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .groupBy(r => (Option(r.getString(0)), r.getInt(1)))
          .map { case (key, rows) =>
            key -> rows.map(r => r.getInt(2) -> r.getLong(3)).toMap }
        pending.foreach { t =>
          val key = (gkey(t.g), t.qIdx)
          val cuts = cutsOf(key)
          val byBucket = counts.getOrElse(key, Map.empty)
          // walk buckets; bucket b spans (cuts(b−1), cuts(b)] in value
          // space with bucket 0 starting at lo and the last ending at hi
          var cum = 0L
          var b = 0
          while (!t.done && b <= cuts.size) {
            val c = byBucket.getOrElse(b, 0L)
            if (cum + c >= t.k) {
              val newLo = if (b == 0) t.lo else cuts(b - 1) + 1
              val newHi = if (b == cuts.size) t.hi else cuts(b)
              t.k -= cum
              t.lo = newLo; t.hi = newHi
              if (newLo == newHi) t.done = true
              b = cuts.size + 1 // break
            } else { cum += c; b += 1 }
          }
          assert(t.done || t.hi > t.lo,
            s"quantile selection failed to narrow for group ${t.g}")
        }
        pending = pending.filterNot(_.done)
      }
      // assemble (group, q, value) — group values round-trip through the
      // original frame (distinct g), so the group column keeps its type.
      // The selected value rides as the raw long image: integrals stay
      // exact over the full 2⁶³ range (no double widening); the floating
      // branch inverts the sign-fold driver-side (bit manipulation, exact)
      import spark.implicits._
      val sel = targets.map { t =>
        val (num, den) = quantiles(t.qIdx)
        val vd = if (floating) java.lang.Double.longBitsToDouble(
          if (t.lo >= 0) t.lo else t.lo ^ Long.MaxValue) else 0.0
        (gkey(t.g).orNull, num.toDouble / den, vd, t.lo)
      }.toDF("gs", "q", "value_d", "value_l")
      val groups = df.select(col(groupCol)).distinct()
      val out = groups.join(sel, col(groupCol).cast("string") <=> col("gs"))
        .select(col(groupCol), col("q"),
          (if (floating) col("value_d")
           else col("value_l")).cast(df.schema(valueCol).dataType).as("value"))
      out
    } finally mapped.unpersist()
  }

  /** Per-dimension corpus statistics over an embedding column — the
    * feature-audit pass a pipeline runs before clustering/quantizing
    * (dead dimensions, scale imbalance, outlier ranges), on the
    * shift-free scaled-long image `w_i = floor(x_i·10^6)` so every
    * statistic is an exact integer the oracle replays: per dimension
    * `n`, `sum_fp`, `mean_fp` (sum div n with the sign folded out of the
    * division — truncation toward zero, identical in both engines where
    * a signed floor/truncate would diverge), `min_fp`,
    * `max_fp`, and `ss_fp = Σ w_i²` (the raw second moment; |w| ≤ ~10^6
    * keeps the squared sum < 2^63 up to ~10^6-row corpora per dim — at
    * larger scale lift to DECIMAL(38,0), same plan shape).
    *
    * Scale shape: one `posexplode` to (dim, w) followed by one
    * map-side-combined `groupBy(i)` — the exchange moves
    * O(dims × partitions) partial rows, never the corpus; the result is
    * |dims| rows. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(expr(
        s"transform($vecCol, x -> cast(floor(x * 1000000.0) as bigint))")))
      .select(col("pos").cast("long").as("i"), col("col").as("w"))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(col("w")).as("sum_fp"),
        min(col("w")).as("min_fp"),
        max(col("w")).as("max_fp"),
        sum(col("w") * col("w")).as("ss_fp"))
      .select(col("i"), col("n"), col("sum_fp"),
        expr("if(sum_fp < 0, -((-sum_fp) div n), sum_fp div n)").as("mean_fp"),
        col("min_fp"), col("max_fp"), col("ss_fp"))
}
