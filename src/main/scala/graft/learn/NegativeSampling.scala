package graft.learn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary negative sampling (G11 — `LinkNeighborLoader(neg_sampling=
  * 'binary')`, `dataloader.py:27,34`): for each positive edge draw one
  * random destination, giving a 1:1 positive:negative ratio.
  *
  * Port semantics: the draw is a deterministic hash of the positive edge
  * (partition-independent, oracle-expressible — see [[DetRandom]]);
  * accidental collisions with true edges are removed by an anti-join, so
  * the ratio is ≤ 1:1 by the collision count (the reference's sampler
  * retries; at realistic sparsity the difference is negligible and the
  * determinism is worth it).
  */
object NegativeSampling {

  /** @param positives (src, dst) positive edges
    * @param allEdges  (src, dst) full true-edge set for collision removal
    * @param numDst    size of the destination id space (dense 0..N-1)
    */
  def sample(positives: DataFrame, allEdges: DataFrame, numDst: Long, seed: Long): DataFrame = {
    positives
      .withColumn("dst_neg", DetRandom.mix(col("src"), col("dst"), seed) % lit(numDst))
      .select(col("src"), col("dst_neg").as("dst"))
      .join(allEdges, Seq("src", "dst"), "left_anti")
  }
}
