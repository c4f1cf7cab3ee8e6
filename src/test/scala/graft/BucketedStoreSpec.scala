package graft

import graft.sources.BucketedStore
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: same-bucketed tables must join without a
  * shuffle on either side. */
class BucketedStoreSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the in-memory catalog forgets tables across sessions but leaves the
    // managed location behind — remove it or CTAS refuses to re-create
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists())
      scala.reflect.io.Directory(loc).deleteRecursively()
  }

  test("bucketed-by-key tables join with zero exchanges") {
    dropTable("b_orders"); dropTable("b_customer")
    val orders = Tables.load(spark, sf(), "orders")
    val customer = Tables.load(spark, sf(), "customer")
    BucketedStore.writeBucketed(
      orders.withColumn("k", col("o_custkey")), "b_orders", "k", 4)
    BucketedStore.writeBucketed(
      customer.withColumn("k", col("c_custkey")), "b_customer", "k", 4)
    // force the sort-merge path: for a broadcastable dimension Catalyst
    // prefers BHJ and ignores bucketing entirely — the co-location win is
    // for two LARGE sides, which the merge hint simulates here
    val joined = BucketedStore.read(spark, "b_orders").hint("merge")
      .join(BucketedStore.read(spark, "b_customer"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free co-located join, got:\n$plan")
    // and it is still correct
    val n = joined.count()
    val expected = orders.join(customer,
      orders("o_custkey") === customer("c_custkey")).count()
    assert(n == expected)

    // writeBucketed's repartition-first leaves ONE file per bucket even
    // after a REPEATED save (overwrite replaces the file set) — the
    // precondition for the scan to report its declared sortBy
    BucketedStore.writeBucketed(
      orders.withColumn("k", col("o_custkey")), "b_orders", "k", 4)
    for (t <- Seq("b_orders", "b_customer")) {
      val files = Option(new java.io.File(s"spark-warehouse/$t")
        .listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("part-"))
      assert(files <= 4, s"$t: expected at most one file per bucket, got $files")
    }
    // ...and with single-file buckets the SMJ needs NO sort on either
    // side: both scans carry the bucket sort order
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
      case _ => Seq(p) ++ p.children.flatMap(nodes)
    }
    val rejoined = BucketedStore.read(spark, "b_orders").hint("merge")
      .join(BucketedStore.read(spark, "b_customer"), Seq("k"))
    val sorts = nodes(rejoined.queryExecution.executedPlan)
      .filter(_.isInstanceOf[SortExec])
    assert(sorts.isEmpty,
      s"expected sort-free co-located join (bucket sort exploited), got:\n" +
        rejoined.queryExecution.executedPlan)
    assert(rejoined.count() == expected)
  }

  test("bucketed graph store: the propagation-round join is exchange-free after reload") {
    import graft.catalog.Catalogs
    import graft.graph.{GraphBuilder, HeteroGraph}
    // clean BOTH catalog entries and orphaned warehouse dirs: the
    // in-memory catalog forgets tables across JVMs but their managed
    // locations persist, and saveAsTable refuses to overwrite those
    val wh = new java.io.File("spark-warehouse")
    val stale = Option(wh.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("bg_"))
    val known = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("bg_"))
    (stale ++ known).distinct.foreach(dropTable)
    val g = GraphBuilder
      .build(Catalogs.tpch, n => Tables.load(spark, sf(), n), probeDense = true)
      .restrictTo(Set("customer"), hops = 1)
      .addDegree(spark)
    g.saveBucketed("bg", buckets = 4)
    val r = HeteroGraph.loadBucketed(spark, "bg")
    assert(r.nodes.keySet === g.nodes.keySet)
    assert(r.edges.keySet === g.edges.keySet)
    // one propagation round's big join: edges ⨝ src embeddings. Both
    // sides bucketed on the join key (src / id-aliased-to-src), so the
    // sort-merge join must read bucket i against bucket i directly.
    val k = r.edges.keys.find(_.src == "orders").get
    val h = r.nodes("customer") // not the src side; just assert src side co-location
    val src = r.nodes(k.src).select(col("id").as("src"),
      element_at(col("features"), -1).as("h"))
    val joined = r.edges(k).hint("merge").join(src, Seq("src"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free co-located propagation join, got:\n$plan")
    // saveBucketed writes one file per bucket (writeBucketed's
    // repartition-first), so BOTH sides report the bucket sort — the
    // edge scan directly, the node scan through the alias-aware `id AS
    // src` projection — and the SMJ plans without a Sort on either side
    assert(!plan.contains("Sort ["),
      s"expected sort-free co-located propagation join " +
        s"(bucket sort exploited on both sides), got:\n$plan")
    assert(joined.count() === g.edges(k).count())
    val _ = h
  }

  test("saveBucketed refuses to trample a live sibling session's prefix") {
    import graft.catalog.Catalogs
    import graft.graph.{GraphBuilder, HeteroGraph}
    val wh = new java.io.File("spark-warehouse")
    val stale = Option(wh.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("bsib_"))
    val known = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("bsib_"))
    (stale ++ known).distinct.foreach(dropTable)
    val g = GraphBuilder
      .build(Catalogs.tpch, n => Tables.load(spark, sf(), n), probeDense = true)
      .restrictTo(Set("region"), hops = 1)
    g.saveBucketed("bsib", buckets = 2)
    // a sibling session shares the catalog: it may LOAD the prefix...
    val sibling = spark.newSession()
    val viaSibling = HeteroGraph.loadBucketed(sibling, "bsib")
    assert(viaSibling.nodes.keySet === g.nodes.keySet)
    // ...but an overwrite-save from the sibling must refuse while the
    // owner is live (it would delete tables under the owner's graph)
    val gSib = GraphBuilder
      .build(Catalogs.tpch, n => Tables.load(sibling, sf(), n), probeDense = true)
      .restrictTo(Set("region"), hops = 1)
    val ex = intercept[IllegalStateException](gSib.saveBucketed("bsib", buckets = 2))
    assert(ex.getMessage.contains("live sibling"))
    // the owner itself may re-save (overwrite of its own prefix is fine)
    g.saveBucketed("bsib", buckets = 2)
    assert(HeteroGraph.loadBucketed(spark, "bsib").nodes.keySet === g.nodes.keySet)
  }

  test("non-bucketed baseline DOES shuffle (sanity of the assertion)") {
    val orders = Tables.load(spark, sf(), "orders")
    val customer = Tables.load(spark, sf(), "customer")
    // force a sort-merge path for comparability with the bucketed plan
    val joined = orders.hint("merge")
      .join(customer, orders("o_custkey") === customer("c_custkey"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
  }
}
