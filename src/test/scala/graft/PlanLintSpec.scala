package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, LocalTableScanExec}

/** The plan audit, SELF-ENFORCING (r10 brief #2): PLANS.md documents the
  * headline plans, but its currency was habit-enforced and drifted twice
  * (r5, r8). This suite walks the physical plan of EVERY
  * `SparkEntry.queries` entry at sf0.001 and asserts the three invariants
  * the manual audit checks, so a regression fails `sbt test` instead of
  * waiting for a judge pass:
  *
  *  1. No `CartesianProductExec` — an all-pairs join must ride a
  *     broadcast build side (BroadcastNestedLoopJoin) or a real key.
  *  2. No single-partition shuffle of data-scale rows: an
  *     `Exchange SinglePartition` is only acceptable when its subtree has
  *     already bounded the row count (a partial aggregate, a limit, or a
  *     driver-materialised LocalTableScan of model state below it).
  *  3. Every sorted-limit sink plans as `TakeOrderedAndProject` — a
  *     global Sort + Limit pair in its place shuffles the full frame.
  *
  * The sweep inspects `executedPlan` BEFORE execution (AQE's input plan),
  * which is exactly what PLANS.md dumps; fixture-scale row counts don't
  * change these shape invariants. Query construction itself may run
  * driver-side model fits (k-means collects, ingest fixtures) — that cost
  * is the price of sweeping all entries and stays small at sf0.001.
  */
class PlanLintSpec extends SparkSpec {

  /** Every physical node, descending through AQE wrappers and subqueries. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => Seq(a) ++ allNodes(a.inputPlan)
      case _ => Seq(p) ++ p.children.flatMap(allNodes)
    }
    self ++ p.subqueries.flatMap(allNodes)
  }

  /** True when every row reaching this subtree's top is already bounded:
    * an aggregate / limit / top-k below the exchange, or nothing but
    * driver-local model-state scans at the leaves. */
  private def bounded(p: SparkPlan): Boolean = {
    val nodes = allNodes(p)
    nodes.exists {
      case _: BaseAggregateExec | _: GlobalLimitExec | _: LocalLimitExec |
          _: TakeOrderedAndProjectExec => true
      case _ => false
    } || nodes.filter(_.children.isEmpty).forall {
      case _: LocalTableScanExec => true
      case l => l.getClass.getSimpleName.startsWith("Empty")
    }
  }

  /** The sorted-limit shapes in the optimized logical plan that must
    * become TakeOrderedAndProject: GlobalLimit over (projections of) a
    * global Sort. */
  private def sortedLimits(plan: LogicalPlan): Seq[LogicalPlan] = {
    def throughProjections(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, c) => throughProjections(c)
      case LocalLimit(_, c) => throughProjections(c)
      case other => other
    }
    plan.collect {
      case g @ GlobalLimit(_, child) =>
        throughProjections(child) match {
          case s: Sort if s.global => Some(g)
          case _ => None
        }
    }.flatten
  }

  // Queries whose construction needs state the lint sweep must set up are
  // all self-contained; none are exempt today. If a future query needs a
  // documented exception, add it here WITH the justification.
  private val cartesianExempt: Map[String, String] = Map.empty
  private val singlePartitionExempt: Map[String, String] = Map.empty
  private val topKExempt: Map[String, String] = Map.empty

  private lazy val plans: Seq[(String, DataFrame)] = {
    val dir = sf()
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      name -> q(spark, dir)
    }
  }

  test("plan lint: no CartesianProduct anywhere on the board") {
    val bad = plans.filterNot(p => cartesianExempt.contains(p._1)).flatMap {
      case (name, df) =>
        allNodes(df.queryExecution.executedPlan).collect {
          case _: CartesianProductExec => name
        }
    }.distinct
    assert(bad.isEmpty,
      s"CartesianProduct (no broadcast build side) in: ${bad.mkString(", ")}")
  }

  test("plan lint: no single-partition shuffle of unbounded data-scale rows") {
    val bad = plans.filterNot(p => singlePartitionExempt.contains(p._1))
      .flatMap { case (name, df) =>
        allNodes(df.queryExecution.executedPlan).collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning == SinglePartition && !bounded(e.child) =>
            name
        }
      }.distinct
    assert(bad.isEmpty,
      s"unbounded Exchange SinglePartition in: ${bad.mkString(", ")}")
  }

  test("plan lint: every sorted-limit sink is TakeOrderedAndProject") {
    val bad = plans.filterNot(p => topKExempt.contains(p._1)).flatMap {
      case (name, df) =>
        val needs = sortedLimits(df.queryExecution.optimizedPlan)
        val has = allNodes(df.queryExecution.executedPlan).exists {
          case _: TakeOrderedAndProjectExec => true
          case _ => false
        }
        if (needs.nonEmpty && !has) Seq(name) else Nil
    }.distinct
    assert(bad.isEmpty,
      s"sorted limit planned as Sort+Limit (full-frame shuffle) in: ${bad.mkString(", ")}")
  }
}
