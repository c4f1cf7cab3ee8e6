package graft

import graft.catalog.{Catalogs, ConstraintCatalog, ForeignKey, TableMeta}
import graft.topology.{EdgeKey, Topology}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

/** G1-G3 classifier rules (`convert_to_graph.py:60-139`). */
class TopologySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("tpch catalog: 1-PK tables are nodes, 2-PK lineitem is a junction") {
    val topo = Topology.classify(Catalogs.tpch)
    assert(topo.nodes.map(_.table).toSet === Set(
      "region", "nation", "customer", "supplier", "part", "orders",
      "events", "documents", "embeddings"))
    // lineitem resolves via FK metadata: orders--hasl_linenumber?? no:
    // pkCols = (l_orderkey, l_linenumber); l_linenumber has no FK and no
    // node table named by PK col => unresolved
    assert(topo.unresolvedJunctions === Seq("lineitem"))
  }

  test("FK on node table yields exactly one edge spec with correct wiring") {
    val topo = Topology.classify(Catalogs.tpch)
    val e = topo.edges.find(e => e.rowsTable == "orders").get
    assert(e.srcTable === "orders" && e.dstTable === "customer")
    assert(e.srcCol === "o_orderkey" && e.dstCol === "o_custkey")
    assert(e.relation === "haso_custkey")
  }

  test("chinook-shaped junction table derives one edge, ordinal order") {
    val cat = ConstraintCatalog(Seq(
      TableMeta("playlists", Seq("PlaylistId")),
      TableMeta("tracks", Seq("TrackId")),
      TableMeta("playlist_track", Seq("PlaylistId", "TrackId"),
        Seq(ForeignKey("PlaylistId", "playlists", "PlaylistId"),
            ForeignKey("TrackId", "tracks", "TrackId")))))
    val topo = Topology.classify(cat)
    val Seq(e) = topo.edges
    // relation naming: "has" + targetCol.replace("Id","")  (`:181`)
    assert(e === graft.topology.EdgeSpec(
      "playlists", "hasTrack", "tracks", "playlist_track",
      "PlaylistId", "TrackId"))
  }

  test("junction with unresolvable PK column is reported, not mis-derived") {
    val cat = ConstraintCatalog(Seq(
      TableMeta("a", Seq("a_id")),
      TableMeta("j", Seq("a_id", "mystery"))))
    val topo = Topology.classify(cat)
    assert(topo.edges.isEmpty)
    assert(topo.unresolvedJunctions === Seq("j"))
  }

  test("EdgeKey naming and reversal") {
    val k = EdgeKey("playlists", "hasTrack", "tracks")
    assert(k.name === "playlists__hasTrack__tracks")
    assert(k.reversed === EdgeKey("tracks", "REVERSE_hasTrack", "playlists"))
    assert(!k.isSelfType && EdgeKey("a", "x", "a").isSelfType)
  }

  // property: every FK between node tables yields exactly one edge; every
  // fully-FK'd 2-PK table yields exactly one edge (SURVEY.md §5.2)
  test("property: edge count = resolvable FKs + resolvable junctions") {
    val genCat: Gen[ConstraintCatalog] = for {
      nNodes <- Gen.choose(1, 6)
      nodeNames = (0 until nNodes).map(i => s"t$i")
      fkCounts <- Gen.listOfN(nNodes, Gen.choose(0, 2))
      fks = nodeNames.zip(fkCounts).map { case (n, k) =>
        n -> (0 until k).map(j =>
          ForeignKey(s"fk_$j", nodeNames(j % nNodes), s"pk_${j % nNodes}"))
      }.toMap
      nJunc <- Gen.choose(0, 3)
    } yield ConstraintCatalog(
      nodeNames.map(n => TableMeta(n, Seq(s"pk_$n"), fks(n))) ++
      (0 until nJunc).map(j => TableMeta(s"j$j", Seq("ja", "jb"),
        Seq(ForeignKey("ja", nodeNames.head, s"pk_${nodeNames.head}"),
            ForeignKey("jb", nodeNames.last, s"pk_${nodeNames.last}")))))
    check(Prop.forAll(genCat) { cat =>
      val topo = Topology.classify(cat)
      val nFk = cat.tables.filter(_.pkCols.size == 1)
        .flatMap(_.fks).count(fk =>
          cat.tables.exists(t => t.name == fk.refTable && t.pkCols.size == 1))
      val nJ = cat.tables.count(_.pkCols.size == 2)
      topo.edges.size == nFk + nJ && topo.unresolvedJunctions.isEmpty
    })
  }
}
