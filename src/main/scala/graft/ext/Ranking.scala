package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-style term ranking over a document corpus: BM25 (Robertson &
  * Spärck Jones's probabilistic weighting in the Okapi formulation) with
  * every factor in exact scaled-integer arithmetic, so the scores are
  * bit-replayable by a second engine ([[graft.SparkEntry]] q85's DuckDB
  * oracle) — the corpus-indexing tier that sits next to the TF-IDF
  * feature (q49) in a training-data pipeline: score the terms that make
  * a document distinctive, weight retrieval-augmented mixes, or build
  * the keyword index a dedup/decontamination audit queries.
  *
  * The classical formula is
  * `idf(t) × tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with float idf
  * `ln((N−df+0.5)/(df+0.5))`. Graft's exactness contract replaces the
  * libm-dependent log with the same scaled integer idf the TF-IDF tier
  * uses — `idf_fp = (N×10⁶) div df`, monotone in the true idf — and
  * evaluates the tf saturation as one exact rational with floored
  * divisions at documented points (`k1 = 6/5`, `b = 3/4`):
  *
  *   `r_fp  = (dl·D×10⁶) div T`                 (dl/avgdl, avgdl = T/D)
  *   `tfc   = (22·tf×10¹²) div (10·tf×10⁶ + 3×10⁶ + 9·r_fp)`
  *   `score = (idf_fp · tfc) div 10⁶`
  *
  * Monotone in tf, decreasing in document length — BM25's shape, exact
  * in any engine and any order. Overflow bounds: `22·tf×10¹² < 2⁶³`
  * needs `tf < 4×10⁵` occurrences of one term in one document;
  * `idf_fp·tfc` needs `N·tfc < 2.2×10⁶·N×10⁶ < 2⁶³`, i.e. corpora to
  * ~4×10⁶ docs at these scales — size the two 10⁶ factors down together
  * for bigger corpora (the oracle carries them symbolically).
  *
  * Scale shape — TF-IDF's plan with the corpus pass made explicit: the
  * tokenise+explode runs ONCE into the compact `(doc, term, tf)` frame
  * (map-side-combined; materialised behind an eager localCheckpoint —
  * FOUR consumers derive from it: dl, df, the corpus scalars, and the
  * scoring join, and lazily each would re-run the corpus scan), the
  * O(|vocab|) df aggregate broadcasts back, and the per-doc top-k
  * plans as `WindowGroupLimit` (partial top-k before the exchange, so
  * hot documents never materialise their full term list). The corpus
  * scalars (N, D, T) are one tiny aggregate cross-joined in — at
  * 100 TB nothing shuffles beyond the tf exchange. */
object Ranking {

  /** Top-`k` terms per document by exact-integer BM25; ties break
    * lexicographically. Returns `(idCol, term, score, rk)`.
    * `dl` counts ALL token occurrences of the document (the BM25
    * length), tokens are [[Dedup.tokens]]'s `[a-z0-9]+` runs.
    * `checkpointTf=false` keeps the pipeline lazy (plan audits). */
  def bm25TopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      checkpointTf: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val terms = docs.select(col(idCol),
      explode(Dedup.tokens(col(textCol))).as("term"))
    val tfRaw = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tf = if (checkpointTf) tfRaw.localCheckpoint(eager = true) else tfRaw
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // corpus scalars: N = docs (for idf), D = non-empty docs / T = tokens
    // (for avgdl) — dl derives from tf so D counts docs with ≥1 token,
    // and the oracle counts them the same way
    val nDocs = docs.count()
    val corpus = dl.agg(count(lit(1)).as("d_cnt"), sum(col("dl")).as("t_cnt"))
    val scored = tf
      .join(dl, Seq(idCol))
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(corpus))
      .select(col(idCol), col("term"),
        expr(s"((${nDocs}L * 1000000L) div df) * " +
          "((22L * tf * 1000000000000L) div " +
          "(10L * tf * 1000000L + 3000000L + 9L * ((dl * d_cnt * 1000000L) div t_cnt))) " +
          "div 1000000L").as("score"))
    val w = Window.partitionBy(idCol).orderBy(desc("score"), asc("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("score"),
        col("rk").cast("long").as("rk"))
  }

  /** Collocation mining over adjacent token bigrams — the phrase-
    * extraction pass (Church & Hanks 1990's association-ratio frame,
    * here as the log-free LIFT `n_12·N·scale div (n_1·n_2)`, the exact
    * monotone image of pointwise mutual information at fixed pair
    * frequency — the same trade as q75/q79: `ln` never hash-verifies,
    * the ratio does). Marginals are SLOT counts (`n_1` = bigrams with
    * w1 on the left, `n_2` = w2 on the right), the textbook bigram
    * normalisation — they sum to N exactly, so lift is a true
    * probability ratio. Pairs below `minCount` are dropped (PMI's
    * low-frequency pathology: a hapax pair maxes the score).
    *
    * Bound: `n_12·N·scale < 2^63` needs N·scale ≲ 9·10^18/n_12 — at
    * scale 10^6 that holds to ~10^6-bigram corpora even for the
    * hottest pair (n_12 ≤ N); larger corpora lower `scale` or lift to
    * DECIMAL, same plan.
    *
    * Scale shape: ONE tokenise+explode pass into the (w1, w2, n_12)
    * count frame (map-side combined, checkpointed behind
    * `checkpointTf` like [[bm25TopTerms]]'s tf); the slot marginals
    * and the corpus total are O(vocab) aggregates OVER that frame —
    * the corpus is never re-scanned — and the final scoring joins are
    * model-sized with the 1-row total broadcast. */
  def collocations(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 5L,
      scale: Long = 1000000L,
      checkpointTf: Boolean = true): DataFrame = {
    val toks = docs.select(Dedup.tokens(col(textCol)).as("__ts"))
    val fullRaw = toks.filter(size(col("__ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__ts) - 2)," +
          " i -> struct(__ts[i] AS w1, __ts[i + 1] AS w2))")).as("__b"))
      .groupBy(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .agg(count(lit(1)).as("n_12"))
    val full = if (checkpointTf) fullRaw.localCheckpoint(eager = true)
      else fullRaw
    val c1 = full.groupBy("w1").agg(sum(col("n_12")).as("n_1"))
    val c2 = full.groupBy("w2").agg(sum(col("n_12")).as("n_2"))
    val nn = full.agg(sum(col("n_12")).as("n"))
    full.filter(col("n_12") >= minCount)
      .join(c1, Seq("w1")).join(c2, Seq("w2"))
      .crossJoin(broadcast(nn))
      .select(col("w1"), col("w2"), col("n_12"), col("n_1"), col("n_2"),
        expr(s"n_12 * n * ${scale}L div (n_1 * n_2)").as("lift_fp"))
  }
}
