package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming ingest → near-dedup loop (SURVEY.md §2.10 open idea): a file
  * stream of documents lands through `foreachBatch`, and each micro-batch
  * is near-dedup'd INCREMENTALLY — MinHash signatures are computed for the
  * new documents only and joined against the accumulated signature store
  * via the LSH band index (new × all, never all × all), exact-verified,
  * then appended. At 100 TB/day rates this is the shape that works: per
  * batch the work is |batch| signature computations plus an equi-join
  * keyed on short band keys against a bucketed store; the full corpus is
  * never re-shingled.
  *
  * State lives in three parquet dirs under `storeDir`:
  *   - `sigs`      (doc_id, band, key)  — the LSH index
  *   - `shingles`  (doc_id, sh)         — for the exact verify
  *   - `pairs`     (doc_a, doc_b)       — verified near-dup pairs
  *
  * Every pair involves at least one new document exactly once (old × old
  * pairs were emitted by earlier batches), so appends never duplicate:
  * the accumulated `pairs` equal the batch [[Dedup.nearDupMinhash]] over
  * the same corpus — asserted by StreamingSpec.
  */
object DocIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Start the ingest stream over a directory of documents parquet. */
  def start(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      checkpointDir: String,
      tau: Double = 0.8): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, storeDir, tau)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One micro-batch: signatures for the NEW docs, candidates from the
    * band-key join against (store ∪ new), exact-Jaccard verify, append. */
  def ingestBatch(batch: DataFrame, storeDir: String, tau: Double): Unit = {
    val spark = batch.sparkSession
    val sigs = Dedup.signatures(batch, "doc_id", "text")
      .localCheckpoint(eager = true) // one tokenize+hash pass, read 4×
    if (sigs.isEmpty) return
    val newKeys = sigs.select(col("doc_id"), col("band"), col("key"))
    val newSh = sigs.select(col("doc_id"), col("sh")).distinct()

    def readStore(name: String): Option[DataFrame] =
      if (new java.io.File(s"$storeDir/$name").exists())
        Some(spark.read.parquet(s"$storeDir/$name"))
      else None

    val allKeys = readStore("sigs")
      .map(_.unionByName(newKeys)).getOrElse(newKeys)
    val allSh = readStore("shingles")
      .map(_.unionByName(newSh)).getOrElse(newSh)

    // new × all on the band index; least/greatest orders the pair, and the
    // distinct collapses the both-new double match
    val cand = newKeys.as("x")
      .join(allKeys.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    Dedup.verifyJaccard(cand, allSh, tau)
      .write.mode("append").parquet(s"$storeDir/pairs")

    newKeys.write.mode("append").parquet(s"$storeDir/sigs")
    newSh.write.mode("append").parquet(s"$storeDir/shingles")
  }

  /** The accumulated near-dup pairs (empty frame if nothing ingested). */
  def pairs(spark: SparkSession, storeDir: String): DataFrame =
    if (new java.io.File(s"$storeDir/pairs").exists())
      spark.read.parquet(s"$storeDir/pairs")
    else {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    }
}
