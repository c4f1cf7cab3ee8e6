package graft

import graft.catalog.{Catalogs, ConstraintCatalog, ForeignKey, TableMeta}
import graft.topology.Topology

/** S1–S3 over a LIVE JDBC database: `Catalogs.fromJdbc` introspects real
  * `DatabaseMetaData` (the port of the reference's PRAGMA scans,
  * `convert_to_graph.py:62-94`) against embedded Apache Derby — the JDBC
  * engine Spark ships for its Hive metastore, so it is always on the
  * classpath. The schema is Chinook-shaped: entity tables with FKs and a
  * composite-PK junction, plus a `%sql%`-named decoy that the exclusion
  * filter must drop (the reference's `NOT LIKE '%sql%'`). */
class JdbcCatalogSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def withDerby[A](f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:graftcat;create=true")
    try f(conn)
    finally {
      conn.close()
      // drop the in-memory db so reruns in one JVM start clean
      try java.sql.DriverManager
        .getConnection("jdbc:derby:memory:graftcat;drop=true")
      catch { case _: java.sql.SQLException => () } // drop always "fails"
    }
  }

  // quoted lowercase identifiers: Derby would otherwise uppercase them,
  // and the parity check is against a lowercase explicit catalog
  private val ddl = Seq(
    """CREATE TABLE "artists" (
      |  "artist_id" INT PRIMARY KEY, "name" VARCHAR(80))""".stripMargin,
    """CREATE TABLE "albums" (
      |  "album_id" INT PRIMARY KEY, "title" VARCHAR(80), "artist_id" INT,
      |  FOREIGN KEY ("artist_id") REFERENCES "artists" ("artist_id"))""".stripMargin,
    """CREATE TABLE "tracks" (
      |  "track_id" INT PRIMARY KEY, "ms" INT, "album_id" INT,
      |  FOREIGN KEY ("album_id") REFERENCES "albums" ("album_id"))""".stripMargin,
    """CREATE TABLE "playlists" (
      |  "playlist_id" INT PRIMARY KEY, "name" VARCHAR(80))""".stripMargin,
    // composite PK declared (playlist_id, track_id) — NOT alphabetical
    // column order ("playlist_id" > "track_id" would sort differently),
    // so a KEY_SEQ-ordering bug in fromJdbc would flip junction src/tgt
    """CREATE TABLE "playlist_track" (
      |  "playlist_id" INT, "track_id" INT,
      |  PRIMARY KEY ("playlist_id", "track_id"),
      |  FOREIGN KEY ("playlist_id") REFERENCES "playlists" ("playlist_id"),
      |  FOREIGN KEY ("track_id") REFERENCES "tracks" ("track_id"))""".stripMargin,
    """CREATE TABLE "sqlite_sequence_like" (
      |  "id" INT PRIMARY KEY)""".stripMargin // name contains 'sql' → excluded
  )

  private val expected = ConstraintCatalog(Seq(
    TableMeta("albums", Seq("album_id"),
      Seq(ForeignKey("artist_id", "artists", "artist_id"))),
    TableMeta("artists", Seq("artist_id")),
    TableMeta("playlist_track", Seq("playlist_id", "track_id"),
      Seq(ForeignKey("playlist_id", "playlists", "playlist_id"),
        ForeignKey("track_id", "tracks", "track_id"))),
    TableMeta("playlists", Seq("playlist_id")),
    TableMeta("tracks", Seq("track_id"),
      Seq(ForeignKey("album_id", "albums", "album_id")))))

  test("fromJdbc ≡ explicit catalog on a live Derby schema (PKs, FKs, KEY_SEQ, %sql% exclusion)") {
    withDerby { conn =>
      val st = conn.createStatement()
      ddl.foreach(st.executeUpdate)
      st.close()
      val cat = Catalogs.fromJdbc(conn)
      val norm = ConstraintCatalog(cat.tables
        .map(t => t.copy(fks = t.fks.sortBy(_.fromCol)))
        .sortBy(_.name))
      assert(norm == expected)
      // composite PK ordinal preserved as declared, not alphabetical/rowset
      assert(norm("playlist_track").pkCols == Seq("playlist_id", "track_id"))
      // the decoy never made it in
      assert(!cat.tableNames.exists(_.contains("sql")))
    }
  }

  test("introspected catalog classifies identically to the explicit twin") {
    withDerby { conn =>
      val st = conn.createStatement()
      ddl.foreach(st.executeUpdate)
      st.close()
      val live = Topology.classify(Catalogs.fromJdbc(conn))
      val twin = Topology.classify(expected)
      assert(live.nodes.map(_.table).toSet == twin.nodes.map(_.table).toSet)
      assert(live.unresolvedJunctions == twin.unresolvedJunctions)
      assert(live.edges.map(e => (e.srcTable, e.dstTable, e.rowsTable)).toSet ==
        twin.edges.map(e => (e.srcTable, e.dstTable, e.rowsTable)).toSet)
    }
  }
}
