package graft

import graft.ext.Packing
import graft.learn.DetRandom
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: the scale-safe layout equals the naive global
  * cumulative window, is partition-independent, and tiles the token
  * stream exactly. */
class PackingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf(), "documents")
    .select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_tok"))
    .filter(col("n_tok") > 0)

  private def layout(df: org.apache.spark.sql.DataFrame) =
    Packing.concatChunk(df, "doc_id", "n_tok", chunkTokens = 512L, seed = 7L)
      .select("doc_id", "start_off", "chunk_first", "chunk_last", "n_chunks")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("concatChunk: equals the naive global window, any input partitioning") {
    val naiveW = Window
      .orderBy(DetRandom.mix(col("doc_id"), col("doc_id"), 7L), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("start_off", sum(col("n_tok")).over(naiveW) - col("n_tok"))
      .select(col("doc_id"), col("start_off"),
        expr("start_off div 512").as("chunk_first"),
        expr("(start_off + n_tok - 1) div 512").as("chunk_last"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(3) - r.getLong(2) + 1)))
      .toMap
    assert(naive.nonEmpty)
    assert(layout(docs) === naive)
    assert(layout(docs.repartition(13)) === naive)
  }

  test("concatChunk: offsets tile the token stream with no gaps or overlaps") {
    val rows = Packing.concatChunk(docs, "doc_id", "n_tok", 512L, 7L)
      .select("start_off", "n_tok", "n_chunks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // consecutive documents are adjacent: next start = prev start + prev len
    rows.sliding(2).foreach {
      case Array((s1, w1, _), (s2, _, _)) => assert(s1 + w1 === s2)
      case _                              =>
    }
    assert(rows.head._1 === 0L)
    // a document spans ≥1 chunk; starting at worst 1 token before a
    // boundary, its remaining w-1 tokens fill at most (w-2)/512 + 1 more
    rows.foreach { case (_, w, c) =>
      assert(c >= 1L && c <= (w - 1) / 512L + 2L)
    }
    // total stream length is the sum of counts
    val total = rows.map(_._2).sum
    assert(rows.last._1 + rows.last._2 === total)
  }
}
