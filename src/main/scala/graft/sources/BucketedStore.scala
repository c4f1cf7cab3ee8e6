package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet persistence (SURVEY.md §7.5 / the co-located-join leg
  * of the scale posture): two tables bucketed AND sorted by their join key
  * into the same bucket count join with NO exchange on either side — the
  * sort-merge join reads bucket i against bucket i directly. For the
  * graph, bucketing edges by `dst` and embeddings by `id` makes every
  * propagation round's join shuffle-free after one write.
  *
  * Bucketing metadata lives in the session catalog (`saveAsTable`; plain
  * `.parquet(path)` cannot carry it), so this is the deliberate
  * materialisation point for iterated-over data.
  */
object BucketedStore {

  /** Write `df` bucketed+sorted by `key`. The frame is repartitioned on
    * the bucket key FIRST: Spark's bucket id is the same Murmur3 hash a
    * `repartition(buckets, key)` uses, so after the exchange every task
    * holds exactly one bucket and writes ONE file — without it each of
    * the N input tasks writes up to `buckets` files (N×buckets tiny
    * files per table; measured 19.7s → 4.6s for the q55 graph save at
    * sf0.1, and at 100 TB the same N×buckets explosion would melt the
    * namenode). */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
