package graft

import graft.catalog.Catalogs
import graft.graph.{GraphBuilder, GraphXBridge}
import graft.learn.Propagate
import org.apache.spark.sql.functions._

/** GraphX bridge: global-id flattening invariants, degree parity with the
  * DataFrame backend, and one propagation round matching meanRounds. */
class GraphXBridgeSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private lazy val g = GraphBuilder
    .build(Catalogs.tpch, n => Tables.load(spark, sf(), n))
    .addDegree

  private lazy val hx = GraphXBridge.toGraphX(g)

  test("flattening: disjoint offsets, vertex/edge counts preserved") {
    val nNodes = g.nodes.values.map(_.count()).sum
    val nEdges = g.edges.values.map(_.count()).sum
    assert(hx.graph.vertices.count() == nNodes)
    assert(hx.graph.edges.count() == nEdges)
    // offsets strictly ordered by sorted type name, ranges disjoint
    val offs = hx.typeOffsets.toSeq.sortBy(_._1).map(_._2)
    assert(offs == offs.sorted && offs.distinct.size == offs.size)
  }

  test("GraphX degrees equal the DataFrame degree feature (minus the +1)") {
    val dfDeg = g.nodes("customer")
      .select(col("id"), (element_at(col("features"), -1).cast("long") - 1)
        .as("degree"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gxDeg = GraphXBridge.degrees(hx).apply("customer")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // isolated nodes don't appear in GraphX degrees; default 0
    assert(dfDeg.forall { case (id, d) => gxDeg.getOrElse(id, 0L) == d })
  }

  test("three Pregel-shaped GraphX rounds match the DataFrame meanRounds") {
    val init = Propagate.degreeInit(g)
    val df = Propagate.meanRounds(g, init, rounds = 3, checkpoint = false)
    val gx = GraphXBridge.meanRounds(hx, init, rounds = 3)
    for (t <- Seq("customer", "orders", "nation")) {
      val a = df(t).select(col("id"), element_at(col("vec"), 1).as("v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = gx(t).select(col("id"), element_at(col("vec"), 1).as("v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(a.keySet == b.keySet, s"$t id sets differ")
      a.foreach { case (id, v) =>
        assert(math.abs(v - b(id)) < 1e-9, s"$t id=$id df=$v gx=${b(id)}")
      }
    }
  }
}
