package graft.ext

import graft.learn.DetRandom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining batch assembly.
  *
  * Concat-and-chunk (the GPT-style packing the reference's training loop
  * presumes upstream of its dataloader, `train.py`'s fixed-size batches):
  * documents are laid out in one deterministic shuffled order, their token
  * streams conceptually concatenated, and the stream cut every
  * `chunkTokens` tokens — documents straddle chunk boundaries, nothing is
  * padded or dropped. This operator computes the layout (each document's
  * global start offset and the chunk span it lands in) without ever
  * materialising tokens: it only needs each document's token COUNT and a
  * global running sum.
  *
  * Scale shape: the running sum is [[Sampling.runningSum]]'s
  * range-partition + broadcast-offsets kernel with no group column — the
  * single global sequence parallelises across the cluster instead of
  * funnelling 100 TB of rows through one cumulative-window task. The
  * shuffle order is the partition-independent [[DetRandom]] mix, so the
  * layout is a pure function of (data, seed) and replays 1:1 in ANSI SQL
  * (the q65 oracle).
  */
object Packing {

  /** Chunk layout for concat-and-chunk packing.
    *
    * Input: one row per document with an integral token count
    * `weightCol` ≥ 1 (filter empty documents upstream — a 0-count row
    * would get `chunk_last < chunk_first`). Output: the input columns
    * plus `start_off` (exclusive prefix sum of counts in the seeded
    * order — the document's first token's global offset), `chunk_first`
    * / `chunk_last` (the chunk indices of its first and last token at
    * `chunkTokens` tokens per chunk), and `n_chunks` (how many chunks it
    * spans — 1 for most documents, >1 for boundary-straddlers). */
  def concatChunk(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      chunkTokens: Long,
      seed: Long): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val r = DetRandom.mix(col(idCol), col(idCol), seed)
    Sampling.runningSum(df, Nil, Seq(r, col(idCol)), weightCol, "__cum")
      .withColumn("start_off", col("__cum") - col(weightCol))
      .withColumn("chunk_first", expr(s"start_off div $chunkTokens"))
      .withColumn("chunk_last",
        expr(s"(start_off + $weightCol - 1) div $chunkTokens"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
      .drop("__cum")
  }

  /** Fixed-window STRIDE chunking with overlap — the per-document
    * retrieval/context chunker (each document cut into `windowTokens`-
    * token windows starting every `stride` tokens, adjacent windows
    * overlapping by `windowTokens − stride`), the complement of
    * [[concatChunk]]'s corpus-level concat layout. Like concatChunk it
    * operates on token COUNTS only, never materialising tokens: the
    * chunk table is `(doc_id, n_tokens, chunk_id, start_tok,
    * chunk_len)` — the offsets a downstream encode pass slices with.
    *
    * Chunk count is the closed form `1 + max(0, ceil((n − w) / s))`
    * (exact integers; the `greatest(0, …)` clamp also absorbs the
    * truncate-vs-floor division difference on the negative `n < w`
    * branch, so Spark's `div` and ANSI `//` agree). Zero-token
    * documents produce no chunks. Scale shape: one row-local
    * `sequence` + explode, fan-out `⌈n/s⌉` per document — zero
    * exchanges, fully codegen. */
  def strideChunks(
      df: DataFrame,
      idCol: String,
      nTokCol: String,
      windowTokens: Long,
      stride: Long): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1: $windowTokens")
    require(stride >= 1 && stride <= windowTokens,
      s"need 1 <= stride <= windowTokens: $stride")
    df.filter(col(nTokCol) >= 1)
      .withColumn("__nc", lit(1L) + greatest(lit(0L),
        expr(s"($nTokCol - $windowTokens + $stride - 1) div $stride")))
      .select(col(idCol).as("doc_id"),
        col(nTokCol).cast("long").as("n_tokens"),
        explode(expr("sequence(0L, __nc - 1)")).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk_len",
        least(lit(windowTokens), col("n_tokens") - col("start_tok")))
  }

  /** Deterministic SHARD layout for distributed-training data ordering:
    * every document lands in one of `shards` training shards
    * (`mix(id) mod shards` — the seeded, partition-independent draw),
    * is ordered WITHIN its shard by an independent second hash (the
    * deterministic shuffle every epoch-reproducible dataloader wants),
    * and carries its token offsets in that order — `start_off`/`cum_tok`
    * are the byte-offset ledger a trainer worker seeks by. A pure
    * function of (data, seed): re-running on re-arrived data yields the
    * identical layout.
    *
    * Scale shape: the per-shard running totals ride
    * [[Sampling.runningSum]] with `shard` as the group column — range
    * partition over (shard, order-hash), exact per-partition offsets
    * broadcast back — so a shard's sequence parallelises across the
    * cluster instead of funnelling |corpus|/shards rows through one
    * window task. One tokenise pass, one range exchange. */
  def shardLayout(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shards: Int,
      seed: Long): DataFrame = {
    require(shards > 0, s"shards must be > 0: $shards")
    val s = docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"),
          lit(0))).cast("long").as("n_tok"))
      .withColumn("shard",
        DetRandom.mix(col("doc_id"), col("doc_id"), seed) % shards)
      .withColumn("__h", DetRandom.mix(col("doc_id"), col("doc_id"), seed + 1))
    Sampling.runningSum(s, Seq("shard"),
        Seq(col("__h").asc, col("doc_id").asc), "n_tok", "cum_tok")
      .select(col("doc_id"), col("n_tok"), col("shard"),
        (col("cum_tok") - col("n_tok")).as("start_off"), col("cum_tok"))
  }

  /** The MATERIALISED training shards — [[shardLayout]]'s ordering
    * composed with [[concatChunk]]'s packing, evaluated to actual token
    * sequences: within each shard, documents are laid out in the seeded
    * deterministic order, their token streams concatenated, and the
    * stream cut every `seqTokens` tokens into one row per training
    * sequence `(shard, seq_id, n_docs, seq_tok, text_seq)` — documents
    * straddle sequence boundaries, nothing is padded or dropped (the
    * final ragged sequence of each shard is kept). A pure function of
    * (data, shards, seqTokens, seed): the layout arithmetic is exactly
    * [[shardLayout]]'s ledger (same seeds, same running-sum kernel), so
    * the ledger row `(doc_id, shard, start_off)` IS the seek index into
    * these sequences (PackingSpec asserts the composition).
    *
    * Scale shape: the LEDGER goes through the runningSum kernel narrow
    * (exactly [[shardLayout]] — the kernel pins its range exchange, see
    * [[Sampling.runningSum]]'s correctness note, so the pinned frame
    * must stay a slim (id, count, shard, hash) ledger, never the token
    * arrays); the token payload crosses the wire where the job
    * genuinely needs it — (1) the doc_id equi-join attaching tokens to
    * their ledger row; (2) the (shard, seq_id) hash exchange assembling
    * boundary straddlers (rows ≈ documents + straddlers, never
    * per-token — each document contributes ONE pre-sliced span per
    * sequence it touches); (3) the shard-layout hash exchange of the
    * OUTPUT sequences. No window funnels a shard through one task; no
    * per-token row ever crosses the wire. */
  def shardSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shards: Int,
      seqTokens: Long,
      seed: Long): DataFrame = {
    require(shards > 0, s"shards must be > 0: $shards")
    require(seqTokens > 0, s"seqTokens must be positive: $seqTokens")
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
          .as("__ts"))
    // the ledger IS shardLayout — q148's seek index, verbatim (the spec
    // asserts the composition); a second tokenise pass prices cheaper
    // than pinning the token arrays inside the kernel
    val laid = shardLayout(docs, idCol, textCol, shards, seed)
    // one row per (document, sequence it touches): the document's span
    // inside that sequence, sliced row-locally before any shuffle
    val contrib = laid.filter(col("n_tok") > 0)
      .join(toks, Seq("doc_id"))
      .select(col("shard"), col("start_off"), col("n_tok"), col("__ts"),
        explode(expr(s"sequence(start_off div $seqTokens, " +
          s"(start_off + n_tok - 1) div $seqTokens)")).as("seq_id"))
      .withColumn("__lo", greatest(col("seq_id") * seqTokens, col("start_off")))
      .withColumn("__hi",
        least((col("seq_id") + 1) * seqTokens, col("start_off") + col("n_tok")))
      .select(col("shard"), col("seq_id"), col("__lo"),
        (col("__hi") - col("__lo")).as("__len"),
        array_join(slice(col("__ts"),
          (col("__lo") - col("start_off") + 1).cast("int"),
          (col("__hi") - col("__lo")).cast("int")), " ").as("__part"))
    contrib.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__len")).as("seq_tok"),
        array_join(expr("transform(array_sort(" +
          "collect_list(struct(__lo, __part))), x -> x.__part)"), " ")
          .as("text_seq"))
  }

  /** Persist [[shardSequences]] as the terminal TRAINING-SHARD SINK —
    * the pipeline's real deliverable (the reference pins its own
    * terminal artifact the same way: `torch.save` at
    * convert_to_graph.py:271, md5-locked in dvc.lock:40-43): one
    * parquet directory per shard (`outDir/shard=N/`), exactly one file
    * per shard, rows in (shard, seq_id) order. Deterministic bytes: the
    * row→file assignment hashes only the `shard` VALUE and the in-file
    * order is sorted, so re-running on re-arrived data re-writes each
    * shard file byte-identically (PackingSpec asserts it against a
    * differently-partitioned re-read). Returns the READ-BACK of the
    * written artifact — what a trainer actually consumes — with `shard`
    * restored to long (partition-column type inference reads the dir
    * name as int).
    *
    * At real scale the single-file-per-shard layout becomes
    * one-directory-per-shard with size-bounded files: swap the hash
    * `repartition(shard)` for `repartitionByRange(N, shard, seq_id)` to
    * split a shard into seq-contiguous files — same determinism story
    * except range boundaries, which a trainer pins by recording the
    * ledger ([[shardLayout]]) alongside. */
  def writeShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shards: Int,
      seqTokens: Long,
      seed: Long,
      outDir: String): DataFrame = {
    val spark = docs.sparkSession
    shardSequences(docs, idCol, textCol, shards, seqTokens, seed)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "seq_id")
      .write.partitionBy("shard")
      .mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
      .select(col("shard").cast("long").as("shard"), col("seq_id"),
        col("n_docs"), col("seq_tok"), col("text_seq"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * training of language models to fill in the middle"): split each
    * document's token stream at two seeded cut points into
    * (prefix, middle, suffix) — the trainer reassembles PSM/SPM order
    * with sentinel tokens downstream. Cuts are the partition-independent
    * [[DetRandom]] draws over `[0, n]` (both cuts may coincide — an
    * empty middle is the paper's degenerate case and stays in-band), so
    * the transform is a pure function of (data, seed) and replays
    * bit-for-bit in the DuckDB oracle, empty docs included.
    *
    * Scale shape: ZERO exchanges — one tokenise + three row-local
    * slices over one pruned scan. */
  def fimSplit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seed: Long): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
          .as("__ts"))
      .withColumn("n_tok", size(col("__ts")).cast("long"))
      .withColumn("__c1",
        DetRandom.mix(col("doc_id"), lit(1), seed) % (col("n_tok") + 1))
      .withColumn("__c2",
        DetRandom.mix(col("doc_id"), lit(2), seed) % (col("n_tok") + 1))
      .withColumn("cut_lo", least(col("__c1"), col("__c2")))
      .withColumn("cut_hi", greatest(col("__c1"), col("__c2")))
      .select(col("doc_id"), col("n_tok"), col("cut_lo"), col("cut_hi"),
        array_join(slice(col("__ts"), lit(1), col("cut_lo").cast("int")), " ")
          .as("prefix"),
        array_join(slice(col("__ts"), (col("cut_lo") + 1).cast("int"),
          (col("cut_hi") - col("cut_lo")).cast("int")), " ").as("middle"),
        array_join(slice(col("__ts"), (col("cut_hi") + 1).cast("int"),
          (col("n_tok") - col("cut_hi")).cast("int")), " ").as("suffix"))
}
