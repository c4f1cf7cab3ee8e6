package graft

import graft.functions.{GraftExtensions, Skew}
import org.apache.spark.sql.functions._

/** Skew utilities + SQL function registration. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain groupBy agg, spreads one hot key") {
    // 10k rows of one hot key + scattered others
    val df = spark.range(10000).select(
      when($"id" < 9000, lit(1L)).otherwise($"id").as("k"),
      ($"id" % 7).cast("double").as("v"),
      $"id".as("rowid"))
    val salted = Skew.saltedAgg(df, "k", "v", salt = 8, entropy = Seq("rowid"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
    // the hot key genuinely spreads over several salt buckets
    val buckets = df.filter($"k" === 1)
      .select(Skew.saltCol(8, $"rowid")).distinct().count()
    assert(buckets > 4)
  }

  test("replicatedJoin equals plain join on a skewed fact key") {
    val fact = spark.range(5000).select(
      when($"id" < 4500, lit(3L)).otherwise($"id" % 10).as("k"),
      $"id".as("rowid"))
    val dim = spark.range(10).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val a = Skew.replicatedJoin(fact, dim, "k", salt = 4, factEntropy = Seq("rowid"))
      .groupBy("k", "name").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = fact.join(dim, Seq("k")).groupBy("k", "name").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("graft_dot registers as a SQL function") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }
}
