package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-rule TRAINING (Sennrich, Haddow & Birch,
  * "Neural machine translation of rare words with subword units", ACL
  * 2016) — the tokenizer-training step of an LLM data pipeline. q56's
  * vocabulary top-k counts whole tokens; this learns the merge table a
  * subword tokenizer actually ships: `merges` rounds of "find the
  * most frequent adjacent symbol pair, fuse it everywhere".
  *
  * Exactly the paper's (and HuggingFace's) scale design: the corpus is
  * tokenised ONCE into a word-frequency table, and every round operates
  * on the distinct-word symbol table weighted by word frequency — corpus
  * size stops mattering after the first pass; vocabulary size is the
  * unit of round cost.
  *
  * Fully deterministic and oracle-replayable (q110): the winning pair is
  * the total order (count DESC, left ASC, right ASC), and the fuse step
  * is the run-parity closed form of the greedy left-to-right merge —
  * for a self-pair (a,a) a maximal run of a's fuses at even offsets
  * only ("aaa" → "aa","a"), for a ≠ b matches can never overlap, so a
  * flag expression over two window passes reproduces the sequential
  * scan exactly. Both engines unroll the same recurrence.
  *
  * Scale shape: one corpus tokenise pass (map-side-combined word count);
  * per round one hash(word) exchange serving all window passes (pair
  * lead, run grouping, fuse flags, position renumbering — all partition
  * by the word), one map-side-combined pair-count aggregate, and a
  * 1-row winner that joins back as a broadcast (TakeOrderedAndProject,
  * never a global sort). Rounds are bounded like the propagation
  * family's. */
object Bpe {

  /** The learned merge table: `(round, lhs, rhs, cnt)` — merge #round
    * fused adjacent pair (lhs, rhs) whose frequency-weighted adjacent
    * count was `cnt`. Symbols start as single characters of the
    * lowercased `[a-z0-9]+` word tokens (no end-of-word marker — a
    * documented simplification; the marker would just be one more
    * initial symbol). */
  def trainMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int = 5): DataFrame =
    trainCore(docs, idCol, textCol, merges)._1.reduce(_ union _)

  /** The trained tokenizer APPLIED to its corpus: the top-`topK`
    * subword tokens by frequency-weighted corpus count after `merges`
    * fusion rounds — the encode-side witness of [[trainMerges]] (a
    * word's segmentation is fully determined by the merge table, so the
    * corpus subword histogram certifies the apply step without
    * re-walking raw documents; q56 is this table at merges = 0, whole
    * words). Deterministic (freq DESC, token ASC) cut, planned as
    * TakeOrderedAndProject over one map-side-combined aggregate of the
    * final symbol table. */
  def subwordVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int = 5,
      topK: Int = 100): DataFrame =
    trainCore(docs, idCol, textCol, merges)._2
      .groupBy(col("sym").as("token")).agg(sum("freq").as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(topK)

  /** The trained tokenizer's SEGMENTATION LEXICON: for the `topK` most
    * frequent corpus words, the ordered subword segmentation the merge
    * table produces (joined with '_' — the table a pipeline ships to
    * encode text without re-running merges per document; HuggingFace
    * tokenizers cache exactly this word → pieces map). A word's
    * segmentation is a pure function of the merge table, so the lexicon
    * is one ordered-collect over the final symbol table — no document
    * is ever re-walked.
    *
    * Deterministic (freq DESC, word ASC) cut, planned as
    * TakeOrderedAndProject over a per-word collect; `n_sub` is the
    * piece count [[tokenCounts]] budgets with. */
  def segmentLexicon(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int = 5,
      topK: Int = 200): DataFrame =
    trainCore(docs, idCol, textCol, merges)._2
      .groupBy("wd", "freq")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, sym))), x -> x.sym), '_')")
          .as("segments"),
        count(lit(1)).as("n_sub"))
      .orderBy(desc("freq"), asc("wd"))
      .limit(topK)

  /** Per-document token counts under the TRAINED tokenizer — the number
    * a pipeline actually budgets with (q38's BPE-ish regex is the
    * pre-training proxy; this is the count the trained merge table
    * produces). A word's segmentation is a pure function of the merge
    * table, so the count is one `(word → subword count)` lookup join
    * over the corpus word stream — the corpus is re-tokenised into
    * words exactly once and never re-segmented per document.
    *
    * Docs with no `[a-z0-9]+` words count 0. Scale shape: one
    * vocab-sized aggregate over the final symbol table, one corpus
    * explode joined on the word key (vocab side is the small side —
    * broadcastable at typical vocab sizes), one map-side-combined
    * per-doc sum. */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int = 5): DataFrame = {
    val perWord = trainCore(docs, idCol, textCol, merges)._2
      .groupBy("wd").agg(count(lit(1)).as("n_sub"))
    val counts = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("wd"))
      .filter(col("wd") =!= "")
      .join(perWord, Seq("wd"))
      .groupBy("doc_id").agg(sum("n_sub").as("n_tokens"))
    docs.select(col(idCol).as("doc_id")).join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Tokenizer FERTILITY per document group (typically language) — the
    * standard tokenizer-eval ratio pieces-per-word (Ács's fertility
    * metric; high fertility flags a group the learned vocabulary
    * under-serves, the number multilingual-tokenizer papers report).
    * Ships as an exact ppm-scaled integer so a second engine
    * hash-matches where a float ratio never could.
    *
    * Scale shape: rides [[trainCore]]'s memoised symbol table — one
    * (word → piece count) vocab-sized aggregate, one corpus word
    * explode joined on the word key (vocab side broadcastable), one
    * map-side-combined per-group sum. */
  def fertility(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      merges: Int = 5): DataFrame = {
    val perWord = trainCore(docs, idCol, textCol, merges)._2
      .groupBy("wd").agg(count(lit(1)).as("n_sub"))
    docs
      .select(col(groupCol).as("grp"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("wd"))
      .filter(col("wd") =!= "")
      .join(perWord, Seq("wd"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
      .select(col("grp"), col("n_words"), col("n_subwords"),
        expr("n_subwords * 1000000 div n_words").as("fertility_ppm"))
  }

  /** Shared trainer core: the per-round winner frames and the final
    * fused symbol table `(wd, freq, pos, sym)` — memoised per (corpus
    * plan, cols, merges) so the merge-table query and the vocab query
    * pay ONE training per session+pass (the per-round checkpoints are
    * the expensive part). */
  private def trainCore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int): (Seq[DataFrame], DataFrame) =
    graft.functions.Memos.getOrElseUpdate(
      docs.sparkSession,
      ("bpe-train", docs.queryExecution.analyzed.canonicalized,
        idCol, textCol, merges))(
      trainCoreUncached(docs, idCol, textCol, merges))

  private def trainCoreUncached(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int): (Seq[DataFrame], DataFrame) = {
    require(merges >= 1, s"merges must be >= 1: $merges")
    val spark = docs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    def pin(df: DataFrame): DataFrame =
      df.coalesce(parts).localCheckpoint(eager = true)
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("wd"))
      .filter(col("wd") =!= "")
      .groupBy("wd").agg(count(lit(1)).as("freq"))
    // Spark's split("") can emit a trailing empty slot; drop it (the
    // remaining positions stay contiguous because only the last goes)
    var cur = pin(words
      .select(col("wd"), col("freq"),
        posexplode(split(col("wd"), "")).as(Seq("pos", "sym")))
      .filter(col("sym") =!= "")
      .select(col("wd"), col("freq"), col("pos").cast("long").as("pos"),
        col("sym")))
    val wdW = Window.partitionBy("wd").orderBy("pos")
    val runW = Window.partitionBy("wd", "run_id")
    val rounds = Seq.newBuilder[DataFrame]
    for (r <- 1 to merges) {
      val withNext = cur.withColumn("nxt", lead("sym", 1).over(wdW))
      val winner = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1)
      rounds += winner.select(lit(r.toLong).as("round"),
        col("a").as("lhs"), col("b").as("rhs"), col("cnt"))
      cur = pin(withNext.crossJoin(broadcast(winner))
        .withColumn("rb", (col("sym") === col("a") &&
          (lag("sym", 1).over(wdW).isNull ||
            lag("sym", 1).over(wdW) =!= col("a"))).cast("long"))
        .withColumn("run_id", sum("rb").over(wdW))
        .withColumn("off", col("pos") - min("pos").over(runW))
        .withColumn("m", col("sym") === col("a") && col("nxt") === col("b"))
        .withColumn("mg", col("m") &&
          (col("a") =!= col("b") || col("off") % 2 === 0))
        .withColumn("cons", coalesce(lag("mg", 1).over(wdW), lit(false)))
        .filter(!col("cons"))
        .select(col("wd"), col("freq"),
          (row_number().over(wdW) - 1).cast("long").as("pos"),
          when(col("mg"), concat(col("a"), col("b")))
            .otherwise(col("sym")).as("sym")))
    }
    (rounds.result(), cur)
  }
}
