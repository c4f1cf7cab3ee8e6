package graft.learn

import graft.functions.ArrayOps
import graft.graph.HeteroGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L-round heterogeneous message passing as a DataFrame-join loop (G12 —
  * the port of the reference's GATv2 `to_hetero(..., aggr='sum')` encoder,
  * `model.py:92-94`, per SURVEY.md §7.4: frozen deterministic propagation
  * producing structural embeddings; a trainable head goes on top, §7.4.1).
  *
  * Round update, per node type `d`:
  * {{{
  *   h'(v) = ( h(v) + Σ_{edge types (s,r,d)} mean_{(u,v) ∈ E_r} h(u) ) / (1 + T_v)
  * }}}
  * where `T_v` = number of edge types that delivered ≥1 message to `v`
  * (PyG's per-type aggregation then cross-type `aggr='sum'`, here averaged
  * with the self embedding so magnitudes stay bounded without training).
  *
  * Scale shape per round: one shuffle join (edges ⨝ src embeddings — both
  * sides partitioned by the join key) + one partial-aggregated groupBy per
  * edge type, then one union + groupBy per node type. `localCheckpoint`
  * after every round truncates the lineage (SURVEY.md §7.4 hard part 3).
  */
object Propagate {

  /** @param init per node type `(id: bigint, vec: array<double>)`, all the
    *             same dimension
    * @return     embeddings of the same shape after `rounds` rounds
    */
  def meanRounds(
      g: HeteroGraph,
      init: Map[String, DataFrame],
      rounds: Int,
      checkpoint: Boolean = true): Map[String, DataFrame] = {
    var h = init
    for (_ <- 1 to rounds) {
      // per edge type: mean of source embeddings per destination
      val perType: Seq[(String, DataFrame)] = g.edges.toSeq.collect {
        case (k, edges) if h.contains(k.src) && h.contains(k.dst) =>
          val src = h(k.src).select(col("id").as("src"), col("vec"))
          val agg = edges.join(src, Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(ArrayOps.vecSumAgg(col("vec")).as("sum_vec"),
                 count(lit(1)).as("n"))
            .select(col("id"),
              expr("transform(sum_vec, x -> x / n)").as("msg"))
          k.dst -> agg
      }
      val byDst = perType.groupBy(_._1)
      h = h.map { case (t, cur) =>
        val updated = byDst.get(t) match {
          case None => cur
          case Some(parts) =>
            val msgs = parts.map(_._2).reduce(_ unionByName _)
              .groupBy("id")
              .agg(ArrayOps.vecSumAgg(col("msg")).as("msg_sum"),
                   count(lit(1)).as("n_types"))
            cur.join(msgs, Seq("id"), "left")
              .select(col("id"),
                when(col("msg_sum").isNull, col("vec"))
                  .otherwise(expr(
                    "zip_with(vec, msg_sum, (a, b) -> (a + b) / (1 + n_types))"))
                  .as("vec"))
        }
        t -> (if (checkpoint) updated.localCheckpoint(eager = false) else updated)
      }
    }
    h
  }

  /** Degree-only initial embeddings: `vec = [last feature]`, which after
    * [[HeteroGraph.addDegree]] is the degree feature — the §7.2 frozen
    * scorer's starting point. Dimension 1 for every type, so hetero types
    * with different raw feature widths propagate together. */
  def degreeInit(g: HeteroGraph): Map[String, DataFrame] =
    g.nodes.map { case (t, df) =>
      t -> df.select(col("id"),
        expr("array(cast(element_at(features, -1) as double))").as("vec"))
    }
}
