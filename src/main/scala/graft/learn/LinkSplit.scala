package graft.learn

import graft.graph.HeteroGraph
import graft.topology.EdgeKey
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-level train/validation split for link prediction (G9 — PyG
  * `RandomLinkSplit(num_val=.15, num_test=0)`, `dataloader.py:20-22`,
  * `train.py:23-29`).
  *
  * Semantics preserved from the reference:
  *  - supervision positives are split train/val by ratio;
  *  - validation edges AND their reverse twins are removed from the
  *    message-passing graph (no leakage through `REVERSE_*` types);
  *  - deterministic given the seed — here additionally independent of
  *    partitioning (see [[DetRandom]]).
  */
final case class LinkSplitResult(
    messageGraph: HeteroGraph,
    trainPos: DataFrame,
    valPos: DataFrame)

object LinkSplit {

  def split(g: HeteroGraph, target: EdgeKey, valFrac: Double, seed: Long): LinkSplitResult = {
    val edges = g.edges(target)
    val withU = edges.withColumn("u", DetRandom.uniform(col("src"), col("dst"), seed))
    val valPos = withU.filter(col("u") < valFrac).drop("u")
    val trainPos = withU.filter(col("u") >= valFrac).drop("u")

    val newEdges = g.edges.map {
      case (k, df) if k == target => k -> trainPos
      case (k, df) if k == target.reversed =>
        // drop the reverses of held-out edges (same deterministic predicate,
        // evaluated on the un-reversed endpoint pair)
        k -> df.filter(
          DetRandom.uniform(col("dst"), col("src"), seed) >= valFrac)
      case other => other
    }
    LinkSplitResult(g.copy(edges = newEdges), trainPos, valPos)
  }
}
