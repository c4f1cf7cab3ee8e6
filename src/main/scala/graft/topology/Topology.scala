package graft.topology

import graft.catalog.{ConstraintCatalog, TableMeta}

/** One node type: a table with exactly one PK column
  * (classifier rule, `convert_to_graph.py:76-84`). */
final case class NodeSpec(table: String, pk: String)

/** One edge type `(srcTable, relation, dstTable)`.
  *
  * `rowsTable` is the table whose rows materialize the edges:
  *  - FK edge (G2, `convert_to_graph.py:87-104`): rowsTable = the FK-owning
  *    node table; srcCol = its own PK, dstCol = the FK column.
  *  - junction edge (G3, `convert_to_graph.py:107-137`): rowsTable = the
  *    junction table; srcCol/dstCol = its two PK columns in ordinal order.
  */
final case class EdgeSpec(
    srcTable: String,
    relation: String,
    dstTable: String,
    rowsTable: String,
    srcCol: String,
    dstCol: String) {
  def key: EdgeKey = EdgeKey(srcTable, relation, dstTable)
}

/** The (srcType, relation, dstType) triple identifying a hetero edge type —
  * same shape as PyG's `HeteroData` edge key (`convert_to_graph.py:208-212`). */
final case class EdgeKey(src: String, rel: String, dst: String) {
  /** Filesystem-safe name for parquet layout (S7, SURVEY.md §1.3). */
  def name: String = s"${src}__${rel}__${dst}"
  def reversed: EdgeKey = EdgeKey(dst, s"REVERSE_$rel", src)
  def isSelfType: Boolean = src == dst
}

final case class TopologyResult(
    nodes: Seq[NodeSpec],
    edges: Seq[EdgeSpec],
    /** Junction tables with a PK column that resolves to no node table —
      * the classifier's documented simplification surfaces here instead of
      * silently mis-deriving an edge (`convert_to_graph.py:74-75`). */
    unresolvedJunctions: Seq[String])

/** Node/junction classification + edge-spec derivation (G1-G3,
  * `convert_to_graph.py:60-139`).
  *
  * The reference runs this as eager Polars dataflow over PRAGMA outputs; the
  * port computes it driver-side over the (by definition tiny) catalog — the
  * data-plane work stays in Spark. Semantics preserved:
  *  - exactly 1 PK column → node table (`:76-84`);
  *  - exactly 2 PK columns → junction → one edge type, first PK ordinal =
  *    source, second = target (W1 parity trick `:125`, made explicit);
  *  - FK on a *node* table → edge type node→referenced (`:87-104`);
  *  - relation naming: `"has" + targetCol.replace("Id","")` (`:181`).
  *
  * One deliberate generalization: a junction PK column resolves to its node
  * table via FK metadata when declared, falling back to the reference's
  * PK-column-name match (`junctions.join(pks, on='key')`, `:119-120`). On
  * Chinook both paths agree; on schemas whose junction PK names differ from
  * the referenced PK names (e.g. lineitem.l_orderkey vs orders.o_orderkey)
  * only the FK path resolves.
  */
object Topology {

  def relationName(targetCol: String): String =
    "has" + targetCol.replace("Id", "")

  def classify(cat: ConstraintCatalog): TopologyResult = {
    val nodes = cat.tables.filter(_.pkCols.size == 1)
      .map(t => NodeSpec(t.name, t.pkCols.head))
    val nodeByTable = nodes.map(n => n.table -> n).toMap
    // reference resolution: junction PK col name == node table's PK col name
    val nodeByPkName = nodes.groupBy(_.pk).collect {
      case (pk, Seq(one)) => pk -> one
    }

    val fkEdges = for {
      t <- cat.tables if nodeByTable.contains(t.name)
      fk <- t.fks if nodeByTable.contains(fk.refTable)
    } yield EdgeSpec(
      srcTable = t.name,
      relation = relationName(fk.fromCol),
      dstTable = fk.refTable,
      rowsTable = t.name,
      srcCol = nodeByTable(t.name).pk,
      dstCol = fk.fromCol)

    val junctions = cat.tables.filter(_.pkCols.size == 2)
    def resolve(j: TableMeta, col: String): Option[NodeSpec] =
      j.fks.find(_.fromCol == col).flatMap(fk => nodeByTable.get(fk.refTable))
        .orElse(nodeByPkName.get(col))

    val (resolvedJ, unresolved) = junctions.partition(j =>
      j.pkCols.forall(c => resolve(j, c).isDefined))

    val junctionEdges = resolvedJ.map { j =>
      val Seq(srcCol, dstCol) = j.pkCols
      EdgeSpec(
        srcTable = resolve(j, srcCol).get.table,
        relation = relationName(dstCol),
        dstTable = resolve(j, dstCol).get.table,
        rowsTable = j.name,
        srcCol = srcCol,
        dstCol = dstCol)
    }

    TopologyResult(nodes, fkEdges ++ junctionEdges, unresolved.map(_.name))
  }
}
