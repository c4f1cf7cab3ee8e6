package graft.learn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic neighbor sampling (G10 — PyG `LinkNeighborLoader
  * (num_neighbors=[15,…])`, `dataloader.py:24-51`): keep at most `fanout`
  * in-edges per destination node, per layer.
  *
  * The reference samples with torch RNG state; here the rank is a
  * [[DetRandom]] mix of the edge's own endpoints, so the sample is a pure
  * function of (edge, seed): identical across runs, partitionings, and
  * engines (the ranking expression is ANSI-expressible for the oracle).
  *
  * Scale shape: one hash-partitioned window per layer, keyed on dst —
  * the same shuffle a groupBy would need; no driver state. Eval-time
  * full-neighborhood (`[-1]`, `model.py:42-44`) = skip the call.
  */
object NeighborSample {

  def sample(edges: DataFrame, fanout: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy("dst").orderBy(col("u"), col("src"))
    edges
      .withColumn("u", DetRandom.uniform(col("src"), col("dst"), seed))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= fanout)
      .drop("u", "rn")
  }

  /** Layered sampling for an L-round propagation: layer i uses seed+i so
    * rounds draw independent neighborhoods (PyG's per-layer fanouts). */
  def sampleLayers(
      edges: DataFrame, fanouts: Seq[Int], seed: Long): Seq[DataFrame] =
    fanouts.zipWithIndex.map { case (f, i) => sample(edges, f, seed + i) }
}
