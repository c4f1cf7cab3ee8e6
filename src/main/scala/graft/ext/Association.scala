package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (Agrawal & Srikant 1994's support/
  * confidence frame, pairs-only tier) over (basket, item) rows: for every
  * unordered item pair `{a < b}` co-occurring in at least `minSupport`
  * baskets, the co-occurrence support and both rule directions' confidence
  * plus lift, all in exact scaled integers so q79's DuckDB oracle replays
  * them bit-for-bit:
  *
  *   `supp(a,b)`  = # baskets containing both
  *   `conf_ab_fp` = supp·scale div cnt(a)     (a → b)
  *   `conf_ba_fp` = supp·scale div cnt(b)     (b → a)
  *   `lift_fp`    = supp·N·scale div (cnt(a)·cnt(b))
  *
  * with `cnt(x)` = # baskets containing x and `N` = # baskets. Lift > 1
  * (i.e. `lift_fp > scale`) marks positively associated pairs — the
  * co-purchase/co-occurrence signal used for recommendation candidates
  * and for weighting co-occurrence graph edges (the unweighted variant
  * feeds q74-q78's analytics).
  *
  * Scale shape: items dedupe per basket (one map-side-combined exchange),
  * per-basket pairs expand with fan-out bounded by basket size (the
  * self-join on the basket key — never a global cross), the pair count is
  * one map-side-combined `groupBy(a, b)`, item counts are one aggregate
  * of the deduped frame, the basket total rides a 1-row broadcast cross
  * join, and both `cnt` joins key on the pair's items. Nothing driver-side.
  *
  * Overflow bound: `lift_fp` needs `supp·N·scale < 2^63` — at the default
  * `scale = 10^6`, fine to ~3·10^6 baskets with supp ≈ N; for corpus-scale
  * basket counts pass a smaller scale or pre-filter to rarer items (supp
  * is bounded by the rarer item's count, so in practice the product is
  * far below the worst case). */
object Association {

  /** @param pairSupports optional precomputed co-occurrence counts
    *   `(a < b, w)` over the SAME (basket, item) relation — the shared-
    *   build hook ([[graft.graph.Analytics.triangleStats]]'s `tris`
    *   pattern): q79 and q83 ride one session-memoised frame instead of
    *   each paying the basket self-join. Item counts and the basket
    *   total still derive from the deduped (basket, item) frame. */
  def pairRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L,
      scale: Long = 1000000L,
      pairSupports: Option[DataFrame] = None): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val bi = baskets.select(
        col(basketCol).cast("long").as("bk"),
        col(itemCol).cast("long").as("it"))
      .distinct()
    val n = bi.select(countDistinct(col("bk")).as("n"))
    val cnt = bi.groupBy(col("it")).agg(count(lit(1)).as("cnt"))
    val pairs = pairSupports
      .map(_.select(col("a"), col("b"), col("w").as("supp")))
      .getOrElse(
        bi.join(bi.select(col("bk"), col("it").as("it2")), Seq("bk"))
          .filter(col("it") < col("it2"))
          .groupBy(col("it").as("a"), col("it2").as("b"))
          .agg(count(lit(1)).as("supp")))
      .filter(col("supp") >= minSupport)
    pairs
      .join(cnt.select(col("it").as("a"), col("cnt").as("ca")), Seq("a"))
      .join(cnt.select(col("it").as("b"), col("cnt").as("cb")), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("supp"),
        expr(s"supp * ${scale}L div ca").as("conf_ab_fp"),
        expr(s"supp * ${scale}L div cb").as("conf_ba_fp"),
        expr(s"supp * n * ${scale}L div (ca * cb)").as("lift_fp"))
  }
}
