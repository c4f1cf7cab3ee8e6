package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * Corresponds to the reference's table scans (S4, `convert_to_graph.py:144`)
  * — the reference reads SQLite in-process; here every table is a columnar
  * parquet scan so Catalyst handles column pruning / predicate pushdown
  * automatically (S5, `convert_to_graph.py:169-173` did this manually).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoised per (session, dir, table) via [[graft.functions.Memos]]:
    * every `spark.read.parquet` call runs a one-task schema-inference job
    * (footer read) plus file listing, and one graph build calls `load`
    * ~40 times — a measured ~2.5 s of fixed driver cost per graph-shaped
    * query. Reusing the DataFrame also makes the plans object-identical,
    * so cache/memo lookups keyed on canonicalised plans never drift.
    * Fixture data is immutable for a session. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.functions.Memos.getOrElseUpdate(spark, ("tables", dir, name)) {
      // events.ts arrives as either parquet TIMESTAMP(NANOS) (older
      // fixture generations — Spark 4 rejects it by default, hence the
      // runtime-settable legacy conf to read it as a raw nanos long) or
      // TIMESTAMP(MICROS) (current generation). Either way the engine's
      // contract is a nanos-since-epoch LONG `ts` column: every consumer
      // and every DuckDB oracle equivalence (`ts div 1000` ≡ `epoch_us`)
      // is written against it, so a timestamp-typed read is normalised
      // here, once, instead of in ~10 call sites. All graft sessions pin
      // spark.sql.session.timeZone=UTC, making the NTZ cast below the
      // identity instant mapping DuckDB applies to the same naive value.
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events" &&
          raw.schema("ts").dataType != org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
            * 1000L)
      else raw
    }

  /** Register every fixture table as a temp view so `spark.sql` works over
    * the same names the DuckDB oracle uses (S6, `inference.py:85-92`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
