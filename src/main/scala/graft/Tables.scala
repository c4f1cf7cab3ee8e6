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
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read it as raw nanos-since-epoch long (callers convert with
      // timestamp_micros). Runtime-settable legacy conf, so this works under
      // any session, including the driver's.
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every fixture table as a temp view so `spark.sql` works over
    * the same names the DuckDB oracle uses (S6, `inference.py:85-92`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
