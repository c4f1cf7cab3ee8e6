package graft.serve

import graft.learn.TrainedModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Model-parameter persistence (S10 — the reference's Lightning
  * `ModelCheckpoint` / `load_from_checkpoint`, `train.py:64-68`,
  * `inference.py:30-36`): a trained head is a weight vector + intercept +
  * metrics, stored as one-row parquet so the serving path reloads it with
  * a plain columnar scan.
  */
object ModelStore {

  def save(m: TrainedModel, path: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    Seq((m.weights.toSeq, m.intercept,
        m.valMetrics.keys.toSeq.sorted,
        m.valMetrics.toSeq.sortBy(_._1).map(_._2)))
      .toDF("weights", "intercept", "metric_names", "metric_values")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(path: String)(implicit spark: SparkSession): TrainedModel = {
    val row = spark.read.parquet(path).head()
    TrainedModel(
      row.getSeq[Double](row.fieldIndex("weights")).toArray,
      row.getDouble(row.fieldIndex("intercept")),
      row.getSeq[String](row.fieldIndex("metric_names"))
        .zip(row.getSeq[Double](row.fieldIndex("metric_values"))).toMap)
  }
}
