package graft

import graft.ext.{Dedup, Filters}
import org.apache.spark.sql.functions._

/** Gopher table-A1 composite quality gate (ext/Filters.scala): naive
  * per-document recomputation, genuine discrimination, zero-exchange
  * plan. */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("gopherGate: equals a naive recomputation and discriminates") {
    val fixture = Tables.load(spark, sf(), "documents")
    val got = Filters.gopherGate(fixture, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (1 to 9).map(r.getLong).toVector)
      .toMap

    val rows = fixture
      .select($"doc_id", lower($"text").as("lt"), Dedup.tokens($"text").as("ts"))
      .collect().map { r =>
        val lt = r.getString(1)
        val ts = r.getSeq[String](2)
        val n = ts.length.toLong
        val mtl = if (n == 0) 0L else ts.map(_.length.toLong).sum * 1000000L / n
        val alpha = if (lt.isEmpty) 0L
          else lt.count(c => c >= 'a' && c <= 'z').toLong * 1000000L / lt.length
        val stop = Set("the", "a", "of", "and", "to", "in", "is")
        val nStop = ts.distinct.count(stop).toLong
        val fN = if (n >= 50 && n <= 100000) 1L else 0L
        val fM = if (mtl >= 3000000L && mtl <= 10000000L) 1L else 0L
        val fA = if (alpha >= 600000L) 1L else 0L
        val fS = if (nStop >= 2) 1L else 0L
        r.getLong(0) -> Vector(n, mtl, alpha, nStop, fN, fM, fA, fS,
          fN * fM * fA * fS)
      }.toMap
    assert(got === rows)
    val keeps = got.values.map(_.last).toSet
    assert(keeps == Set(0L, 1L),
      "the gate must both admit and reject on the fixture")
  }

  test("gopherGate: zero exchanges — the gate is the scan") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
        case _ => Seq(p) ++ p.children.flatMap(nodes)
      }
      self ++ p.subqueries.flatMap(nodes)
    }
    val plan = Filters.gopherGate(
        Tables.load(spark, sf(), "documents"), "doc_id", "text")
      .queryExecution.executedPlan
    assert(!nodes(plan).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "gopherGate must be row-local (no exchange)")
  }
}
