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
  * exactly. At 100 TB: the explode feeds two map-side-combinable counts
  * ((doc,bin) and (bin)); the weight table is O(bins) rows and
  * broadcasts; nothing else shuffles beyond the per-doc aggregate. The
  * per-token HOF hash interprets its lambda — at extreme scale swap in a
  * JIT kernel like [[Dedup]]'s `prepUdf` (same hash, same plan). */
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
    * `(idCol, n_tok, score, score_per_tok)`, all exact integers. */
  def dsirWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      bins: Int = 64): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val toks = docs
      .select(col(idCol), targetPred.as("__tgt"),
        Dedup.tokens(col(textCol)).as("__ts"))
      .withColumn("__n", size(col("__ts")).cast("long"))
      .filter(col("__n") > 0)
    val binned = toks
      .select(col(idCol), col("__tgt"), explode(col("__ts")).as("__tok"))
      .select(col(idCol), col("__tgt"), tokenBin(col("__tok"), bins).as("__bin"))
    val tf = binned.groupBy(col(idCol), col("__bin"))
      .agg(count(lit(1)).as("__tf"))
    val raw = binned.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__raw"))
    val tgt = binned.filter(col("__tgt"))
      .groupBy(col("__bin")).agg(count(lit(1)).as("__tgtc"))
    val w = raw.join(tgt, Seq("__bin"), "left")
      .select(col("__bin"),
        expr("(coalesce(__tgtc, 0L) + 1L) * 1000000L div (__raw + 1L)").as("__w"))
    val score = tf.join(broadcast(w), Seq("__bin"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf") * col("__w")).as("score"))
    toks.select(col(idCol), col("__n").as("n_tok"))
      .join(score, Seq(idCol))
      .withColumn("score_per_tok", expr("score div n_tok"))
  }
}
