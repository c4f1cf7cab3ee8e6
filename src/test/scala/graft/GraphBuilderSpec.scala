package graft

import graft.catalog.Catalogs
import graft.graph.{GraphBuilder, HeteroGraph}
import graft.topology.{EdgeKey, Topology}
import org.apache.spark.sql.functions._

/** G4-G8: dense ids, node/edge frames, degree, reverse, self-loops. */
class GraphBuilderSpec extends SparkSpec {

  private def customer = Tables.load(spark, sf(), "customer")
  private def orders = Tables.load(spark, sf(), "orders")

  test("denseIds is a bijection 0..N-1 in PK order, stable across partitioning") {
    val m1 = GraphBuilder.denseIds(customer, "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val n = m1.length
    assert(m1.map(_._2).toSeq === (0L until n))
    // id order == pk order
    assert(m1.map(_._1).toSeq === m1.map(_._1).sorted.toSeq)
    // partitioning-independent (SURVEY.md §7.0 determinism)
    val m2 = GraphBuilder.denseIds(customer.repartition(13), "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(m1.toSeq === m2.toSeq)
  }

  test("nodeFrame: features are numeric non-PK non-FK columns, null→0") {
    val (nodeDf, mapping) = GraphBuilder.nodeFrame(
      customer, Topology.classify(Catalogs.tpch).nodes.find(_.table == "customer").get,
      fkCols = Seq("c_nationkey"))
    assert(nodeDf.count() === customer.count())
    assert(mapping.count() === customer.count())
    // c_custkey (pk) and c_nationkey (fk) excluded; c_acctbal stays
    val width = nodeDf.select(size(col("features"))).head().getInt(0)
    val numericNonKey = customer.schema.fields.count(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        f.name != "c_custkey" && f.name != "c_nationkey")
    assert(width === numericNonKey)
    assert(nodeDf.filter(exists(col("features"), _.isNull)).count() === 0)
  }

  test("edgeFrame drops null FK rows and remaps both endpoints") {
    val spec = Topology.classify(Catalogs.tpch).edges
      .find(_.rowsTable == "orders").get
    val e = GraphBuilder.edgeFrame(orders, spec,
      GraphBuilder.denseIds(orders, "o_orderkey"),
      GraphBuilder.denseIds(customer, "c_custkey"))
    val nNonNull = orders.filter(col("o_custkey").isNotNull).count()
    assert(e.count() === nNonNull)
    val nCust = customer.count()
    assert(e.filter(col("dst") < 0 || col("dst") >= nCust).count() === 0)
  }

  test("build + degree + reverse + selfLoops invariants") {
    val g = GraphBuilder.build(Catalogs.tpch, n => Tables.load(spark, sf(), n))
    val g2 = g.addDegree(spark).withReverseEdges.withSelfLoops
    // |E_rev| = |E| per hetero type (`convert_to_graph.py:243-249`)
    g.edges.foreach { case (k, df) =>
      if (!k.isSelfType)
        assert(g2.edges(k.reversed).count() === df.count(), k.name)
    }
    // self-loop count = node count per type
    g2.nodes.foreach { case (t, df) =>
      assert(g2.edges(EdgeKey(t, "SELF_LOOP", t)).count() === df.count(), t)
    }
    // degree feature: last slot >= 1 everywhere (default 1 for isolated)
    g2.nodes.foreach { case (t, df) =>
      assert(df.filter(element_at(col("features"), -1) < 1f).count() === 0, t)
    }
    // hand-check one node: region 0 degree = (#nations with n_regionkey=0) + 1
    val regionDeg = g2.nodes("region")
      .filter(col("id") === 0).select(element_at(col("features"), -1))
      .head().getFloat(0)
    val firstRegion = Tables.load(spark, sf(), "region")
      .orderBy("r_regionkey").select("r_regionkey").head().get(0)
    val nNat = Tables.load(spark, sf(), "nation")
      .filter(col("n_regionkey") === firstRegion).count()
    assert(regionDeg === nNat + 1f)
  }

  test("denseIds dense fast path rejects duplicated PKs") {
    import spark.implicits._
    // {1,2,2,4}: max-min+1 == count but pks collide — the probe's
    // countDistinct guard must route to the general distinct path
    val dup = Seq(1L, 2L, 2L, 4L).toDF("pk_col")
    val m = GraphBuilder.denseIds(dup, "pk_col").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(m.toSeq === Seq((1L, 0L), (2L, 1L), (4L, 2L)))
  }

  test("build() with default probeDense runs zero Spark jobs") {
    // load first: spark.read.parquet runs footer/schema-listing jobs at
    // read time — those belong to the scan, not to the graph build
    val tables = Catalogs.tpch.tableNames
      .map(n => n -> Tables.load(spark, sf(), n)).toMap
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val g = GraphBuilder.build(Catalogs.tpch, tables(_))
        .addDegree(spark).withReverseEdges.withSelfLoops
      assert(g.nodes.nonEmpty && g.edges.nonEmpty)
      // listener events post asynchronously — drain the bus deterministically
      org.apache.spark.ListenerDrain.drain(spark.sparkContext)
      assert(jobs.get() === 0,
        s"graph construction triggered ${jobs.get()} eager Spark job(s)")
      // first actual query pays, and works
      assert(g.nodes("customer").count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("save/load roundtrip preserves schema and counts") {
    val g = GraphBuilder.build(Catalogs.tpch,
      n => Tables.load(spark, sf(), n)).withSelfLoops
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    g.save(dir)
    val g2 = HeteroGraph.load(spark, dir)
    assert(g2.nodes.keySet === g.nodes.keySet)
    assert(g2.edges.keySet === g.edges.keySet)
    assert(g2.nodes("customer").count() === g.nodes("customer").count())
  }

  test("save/load roundtrips a relation name containing the __ separator") {
    import graft.topology.EdgeKey
    import spark.implicits._
    // name-safety parity with the bucketed store: edge names live in the
    // edges_meta file, never parsed out of a directory name
    val nodes = Map(
      "a" -> Seq((0L, Array(1.0f))).toDF("id", "features"),
      "b" -> Seq((0L, Array(2.0f))).toDF("id", "features"))
    val weird = EdgeKey("a", "has__weird__rel", "b")
    val g = graft.graph.HeteroGraph(
      nodes, Map(weird -> Seq((0L, 0L)).toDF("src", "dst")))
    val dir = java.nio.file.Files.createTempDirectory("graft-weird").toString
    g.save(dir)
    val g2 = HeteroGraph.load(spark, dir)
    assert(g2.edges.keySet === Set(weird))
    assert(g2.edges(weird).count() === 1L)
  }
}
