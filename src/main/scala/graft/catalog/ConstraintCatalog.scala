package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A foreign key: `fromCol` on the owning table references `refTable.refCol`.
  *
  * Mirrors the rows of `PRAGMA foreign_key_list(t)` the reference introspects
  * (S3, `convert_to_graph.py:87-94`, `:147-152`).
  */
final case class ForeignKey(fromCol: String, refTable: String, refCol: String)

/** Primary-key/foreign-key metadata for one table.
  *
  * `pkCols` is ordered by PK ordinal — the reference relies on PRAGMA row
  * order to decide junction src/tgt (W1, `convert_to_graph.py:125`); here the
  * ordering is explicit (SURVEY.md §7.4 hard part 4).
  */
final case class TableMeta(
    name: String,
    pkCols: Seq[String],
    fks: Seq[ForeignKey] = Nil)

/** Declared PK/FK metadata for sources that carry none (parquet fixtures).
  *
  * Replaces the reference's runtime introspection (S1-S3,
  * `convert_to_graph.py:62-94`): SQLite exposes PKs/FKs via PRAGMAs; parquet
  * does not, so the port overlays an explicit catalog (SURVEY.md §1.3).
  * Tiny metadata — held driver-side; `pkDf`/`fkDf` expose it as DataFrames
  * for dataflow-style use.
  */
final case class ConstraintCatalog(tables: Seq[TableMeta]) {
  def apply(name: String): TableMeta =
    tables.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"table not in catalog: $name"))

  def tableNames: Seq[String] = tables.map(_.name)

  /** (table, key, pk_ordinal) — the shape of the reference's concatenated
    * `PRAGMA table_info` scan filtered to `pk > 0` (S2/P1/P2,
    * `convert_to_graph.py:66-71`). */
  def pkDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tables.flatMap(t => t.pkCols.zipWithIndex.map { case (c, i) =>
      (t.name, c, i + 1)
    }).toDF("table", "key", "pk_ordinal")
  }

  /** (source_table, from_col, target_table, target_col) — the shape of the
    * reference's `PRAGMA foreign_key_list` scan (S3). */
  def fkDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tables.flatMap(t => t.fks.map(fk =>
      (t.name, fk.fromCol, fk.refTable, fk.refCol)
    )).toDF("source_table", "from_col", "target_table", "target_col")
  }
}

object Catalogs {
  /** Introspect PK/FK metadata from a live JDBC connection — the port of
    * the reference's `PRAGMA table_info` / `foreign_key_list` scans
    * (S1-S3, `convert_to_graph.py:62-94`) for sources that DO carry
    * constraint metadata. `getPrimaryKeys` returns KEY_SEQ (PK ordinal,
    * 1-based) — preserved as the pkCols ordering, which is what the
    * junction src/tgt rule keys on (W1). Tables whose names match
    * `excludeLike` (the reference's `NOT LIKE '%sql%'`, S1/F4) are
    * skipped. Exercised against a live embedded Derby database (the JDBC
    * engine on Spark's own classpath) in JdbcCatalogSpec, including
    * composite-PK KEY_SEQ ordering and the exclusion filter.
    */
  def fromJdbc(
      conn: java.sql.Connection,
      excludeLike: String = "sql"): ConstraintCatalog = {
    val md = conn.getMetaData
    val tables = scala.collection.mutable.ArrayBuffer.empty[String]
    val rs = md.getTables(null, null, "%", Array("TABLE"))
    while (rs.next()) {
      val n = rs.getString("TABLE_NAME")
      if (!n.toLowerCase.contains(excludeLike)) tables += n
    }
    rs.close()
    ConstraintCatalog(tables.toSeq.map { t =>
      val pks = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
      val prs = md.getPrimaryKeys(null, null, t)
      while (prs.next())
        pks += ((prs.getShort("KEY_SEQ"), prs.getString("COLUMN_NAME")))
      prs.close()
      val fks = scala.collection.mutable.ArrayBuffer.empty[ForeignKey]
      val frs = md.getImportedKeys(null, null, t)
      while (frs.next())
        fks += ForeignKey(
          frs.getString("FKCOLUMN_NAME"),
          frs.getString("PKTABLE_NAME"),
          frs.getString("PKCOLUMN_NAME"))
      frs.close()
      TableMeta(t, pks.sortBy(_._1).map(_._2).toSeq, fks.toSeq)
    })
  }

  /** Catalog for the driver's TPC-H-ish fixture (FIXTURES.md §A).
    * lineitem has a composite 2-col PK → classified as a junction, which
    * exercises the reference classifier's documented simplification
    * (`convert_to_graph.py:74-75`). */
  val tpch: ConstraintCatalog = ConstraintCatalog(Seq(
    TableMeta("region", Seq("r_regionkey")),
    TableMeta("nation", Seq("n_nationkey"),
      Seq(ForeignKey("n_regionkey", "region", "r_regionkey"))),
    TableMeta("customer", Seq("c_custkey"),
      Seq(ForeignKey("c_nationkey", "nation", "n_nationkey"))),
    TableMeta("supplier", Seq("s_suppkey"),
      Seq(ForeignKey("s_nationkey", "nation", "n_nationkey"))),
    TableMeta("part", Seq("p_partkey")),
    TableMeta("orders", Seq("o_orderkey"),
      Seq(ForeignKey("o_custkey", "customer", "c_custkey"))),
    TableMeta("lineitem", Seq("l_orderkey", "l_linenumber"),
      Seq(
        ForeignKey("l_orderkey", "orders", "o_orderkey"),
        ForeignKey("l_partkey", "part", "p_partkey"),
        ForeignKey("l_suppkey", "supplier", "s_suppkey"))),
    TableMeta("events", Seq("event_id"),
      Seq(ForeignKey("user_id", "customer", "c_custkey"))),
    TableMeta("documents", Seq("doc_id")),
    TableMeta("embeddings", Seq("vec_id")),
  ))
}
