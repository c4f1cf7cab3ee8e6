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
