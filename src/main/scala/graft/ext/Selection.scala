package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection for training-corpus construction: importance weights in
  * the DSIR shape (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", 2023) — score every document by how much its
  * hashed-unigram profile looks like a TARGET slice of the corpus versus
  * the corpus as a whole, then resample/threshold on the score upstream
  * of training (q64's budgeted admission is the natural consumer).
  *
  * The paper's estimator is a log-ratio of hashed n-gram probabilities;
  * this is the log-free exact-integer variant: per hash bin b,
  * `w(b) = ((target(b)+1) × 10⁶) div (raw(b)+1)` (add-one smoothing, the
  * ratio in scaled integer arithmetic), and a document scores
  * `Σ_b tf(b)·w(b)` with a per-token normalisation. Monotone in the
  * paper's ratio bin-wise, deterministic, and — like every graft scoring
  * rule — bit-replayable by a second engine ([[graft.SparkEntry]] q70's
  * DuckDB oracle), where a float log-sum could never hash-match.
  *
  * Token → bin is the same 31-base polynomial char hash the rolling
  * fingerprint tier uses (q39), mod `bins` — expressible in both engines
  * exactly. At 100 TB: the corpus is tokenised+hashed ONCE into the
  * per-doc bin counts (one map-side-combinable exchange; ≤ `bins` rows
  * per doc), from which the O(bins) weight table derives in a tiny
  * second aggregate and broadcasts into the scoring join — nothing else
  * shuffles beyond the per-doc aggregate. The per-token HOF hash
  * interprets its lambda — at extreme scale swap in a JIT kernel like
  * [[Dedup]]'s `prepUdf` (same hash, same plan). */
object Selection {

  /** 31-base polynomial hash of a token mod `bins` — nonnegative, so
    * `%` and `pmod` agree across engines. */
  private def tokenBin(tok: Column, bins: Int): Column =
    pmod(
      aggregate(
        transform(sequence(lit(1), length(tok)),
          i => ascii(substring(tok, i, lit(1))).cast("long")),
        lit(0L),
        (acc, c) => (acc * 31L + c) % 1000000007L),
      lit(bins.toLong))

  /** DSIR-shaped importance scores. `targetPred` marks the target slice
    * (e.g. `col("lang") === "en"`); every non-empty document gets
    * `(idCol, n_tok, score, score_per_tok)`, all exact integers.
    *
    * The corpus is tokenised and hashed exactly ONCE: the per-doc bin
    * counts `(doc, tgt, bin, tf)` — at most `bins` rows per document,
    * far smaller than the token stream — are materialised behind an
    * eager localCheckpoint and feed BOTH the O(bins) weight aggregate
    * and the scoring join (lazy, both would re-run the explode+hash
    * pass; `checkpointTf=false` keeps the pipeline lazy for plan
    * audits). */
  def dsirWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      bins: Int = 64,
      checkpointTf: Boolean = true): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val binned = docs
      .select(col(idCol), targetPred.as("__tgt"),
        explode(Dedup.tokens(col(textCol))).as("__tok"))
      .select(col(idCol), col("__tgt"), tokenBin(col("__tok"), bins).as("__bin"))
    val tfRaw = binned.groupBy(col(idCol), col("__tgt"), col("__bin"))
      .agg(count(lit(1)).as("__tf"))
    val tf = if (checkpointTf) tfRaw.localCheckpoint(eager = true) else tfRaw
    val w = tf.groupBy(col("__bin"))
      .agg(sum(col("__tf")).as("__raw"),
        sum(when(col("__tgt"), col("__tf")).otherwise(lit(0L))).as("__tgtc"))
      .select(col("__bin"),
        expr("(__tgtc + 1L) * 1000000L div (__raw + 1L)").as("__w"))
    // every bin in tf is in w (w derives from tf), so the inner join
    // keeps every row and sum(__tf) recovers the doc's token count —
    // empty-token docs vanish at the explode, matching the n_tok > 0
    // contract without a second corpus scan
    tf.join(broadcast(w), Seq("__bin"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tok"),
        sum(col("__tf") * col("__w")).as("score"))
      .select(col(idCol), col("n_tok"), col("score"),
        expr("score div n_tok").as("score_per_tok"))
  }
}
