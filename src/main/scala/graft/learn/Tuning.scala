package graft.learn

import graft.graph.HeteroGraph
import graft.topology.EdgeKey
import org.apache.spark.sql.SparkSession

/** Hyperparameter search (G16 — the reference's Optuna TPE study driving
  * `dvc exp run` subprocesses, `tuning.py:8-51`): a driver-side loop over
  * configurations of the Spark-native training pipeline, maximising a
  * validation metric. Grid/random search instead of TPE — the search
  * driver is deliberately plain (the reference, too, treats it as an
  * outer-loop orchestration concern, not engine core); each trial is a
  * full distributed [[TrainLR]] run.
  */
final case class TrialConfig(rounds: Int, valFrac: Double, seed: Long)
final case class TrialResult(config: TrialConfig, metrics: Map[String, Double])

object Tuning {

  /** Exhaustive grid over the supplied configurations, returning all
    * trials sorted best-first by `metric`, ties broken by config order
    * (deterministic given deterministic training). */
  def gridSearch(
      g: HeteroGraph,
      target: EdgeKey,
      configs: Seq[TrialConfig],
      metric: String = "accuracy")(
      implicit spark: SparkSession): Seq[TrialResult] = {
    require(configs.nonEmpty, "at least one configuration")
    val trials = configs.map { c =>
      val m = TrainLR.train(g, target, valFrac = c.valFrac,
        rounds = c.rounds, seed = c.seed)
      TrialResult(c, m.valMetrics)
    }
    trials.sortBy(t => (-t.metrics.getOrElse(metric, Double.MinValue),
      configs.indexOf(t.config)))
  }

  /** Seeded random configurations drawn from simple ranges — the budgeted
    * analogue of the reference's 100-trial study (`tuning.py:51`). */
  def randomConfigs(n: Int, seed: Long): Seq[TrialConfig] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)(TrialConfig(
      rounds = 1 + rnd.nextInt(3),
      valFrac = 0.1 + rnd.nextInt(3) * 0.05,
      seed = rnd.nextInt(1000).toLong))
  }
}
