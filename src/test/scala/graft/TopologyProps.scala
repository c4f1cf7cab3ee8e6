package graft

import graft.catalog.{ConstraintCatalog, ForeignKey, TableMeta}
import graft.topology.Topology
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based classifier invariants (SURVEY.md §5.2): random PK/FK
  * schemas → structural guarantees of G1-G3. Driver-side pure logic, so
  * the full 100-case sweep stays fast. */
object TopologyProps extends Properties("Topology") {

  private val genCatalog: Gen[ConstraintCatalog] = for {
    nNode <- Gen.choose(1, 6)
    nJunction <- Gen.choose(0, 3)
    nWide <- Gen.choose(0, 2) // 3-PK tables: ignored by the classifier
    nodeNames = (0 until nNode).map(i => s"n$i")
    // node tables: single PK "n<i>_id", random FKs to other node tables
    nodes <- Gen.sequence[Seq[TableMeta], TableMeta](nodeNames.map { t =>
      for {
        nFks <- Gen.choose(0, 2)
        refs <- Gen.listOfN(nFks, Gen.oneOf(nodeNames))
      } yield TableMeta(t, Seq(s"${t}_id"),
        refs.zipWithIndex.map { case (r, i) =>
          ForeignKey(s"fk${i}_${r}Id", r, s"${r}_id")
        })
    })
    // junction tables: 2 PK cols, each either FK-resolved to a node table,
    // name-matched to a node PK, or deliberately unresolvable
    junctions <- Gen.sequence[Seq[TableMeta], TableMeta](
      (0 until nJunction).map { j =>
        for {
          modes <- Gen.listOfN(2, Gen.oneOf("fk", "name", "broken"))
          picks <- Gen.listOfN(2, Gen.oneOf(nodeNames))
        } yield {
          val cols = modes.zip(picks).zipWithIndex.map {
            case (("fk", r), i)    => (s"j${j}c$i", Some(ForeignKey(s"j${j}c$i", r, s"${r}_id")))
            case (("name", r), _)  => (s"${r}_id", None)
            case (("broken", _), i) => (s"zz_${j}_$i", None)
          }
          TableMeta(s"j$j", cols.map(_._1), cols.flatMap(_._2))
        }
      })
    wides = (0 until nWide).map(i =>
      TableMeta(s"w$i", Seq(s"w${i}a", s"w${i}b", s"w${i}c")))
  } yield ConstraintCatalog(nodes ++ junctions ++ wides)

  property("nodes are exactly the 1-PK tables") = forAll(genCatalog) { cat =>
    val topo = Topology.classify(cat)
    topo.nodes.map(_.table).toSet ==
      cat.tables.filter(_.pkCols.size == 1).map(_.name).toSet
  }

  property("every node-table FK to a node yields exactly one edge, correctly wired") =
    forAll(genCatalog) { cat =>
      val topo = Topology.classify(cat)
      val nodeSet = topo.nodes.map(_.table).toSet
      val expected = for {
        t <- cat.tables if nodeSet(t.name)
        fk <- t.fks if nodeSet(fk.refTable)
      } yield (t.name, fk.refTable, fk.fromCol)
      val fkEdges = topo.edges.filter(e => e.rowsTable == e.srcTable)
      Prop(fkEdges.size == expected.size) :| s"count ${fkEdges.size} vs ${expected.size}" &&
        Prop(fkEdges.forall(e =>
          expected.contains((e.srcTable, e.dstTable, e.dstCol)) &&
            e.relation == Topology.relationName(e.dstCol)))
    }

  property("2-PK tables partition into junction edges and unresolved") =
    forAll(genCatalog) { cat =>
      val topo = Topology.classify(cat)
      val junctionTables = cat.tables.filter(_.pkCols.size == 2).map(_.name).toSet
      val derived = topo.edges.filter(e => junctionTables(e.rowsTable)).map(_.rowsTable)
      Prop(derived.distinct.size == derived.size) :| "one edge per junction" &&
        Prop((derived.toSet ++ topo.unresolvedJunctions.toSet) == junctionTables) :|
        "derived + unresolved covers all junctions"
    }

  property("junction edges keep PK-ordinal order: src from col 1, dst from col 2") =
    forAll(genCatalog) { cat =>
      val topo = Topology.classify(cat)
      val byName = cat.tables.map(t => t.name -> t).toMap
      topo.edges.filter(e => byName(e.rowsTable).pkCols.size == 2).forall { e =>
        val Seq(c1, c2) = byName(e.rowsTable).pkCols
        e.srcCol == c1 && e.dstCol == c2
      }
    }

  property("3-PK tables contribute neither nodes nor edges") =
    forAll(genCatalog) { cat =>
      val topo = Topology.classify(cat)
      val wide = cat.tables.filter(_.pkCols.size == 3).map(_.name).toSet
      topo.nodes.forall(n => !wide(n.table)) &&
        topo.edges.forall(e => !wide(e.rowsTable)) &&
        topo.unresolvedJunctions.forall(j => !wide(j))
    }
}
