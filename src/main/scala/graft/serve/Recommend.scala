package graft.serve

import graft.graph.HeteroGraph
import graft.learn.{Propagate, Scoring, TrainedModel}
import graft.topology.EdgeKey
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Top-k recommendation over a mutated graph — the port of the reference's
  * Streamlit inference flow (`inference.py:44-76`): insert a fresh source
  * node wired to the seed destinations (+ reverse + self-loop, G14),
  * propagate, score every non-seed destination (candidate set = anti-join,
  * J6 `inference.py:68`), return the k best (W4 `.topk`, `inference.py:76`).
  */
object Recommend {

  /** Insert a new node of `srcType` with edges to `seedDst` ids of the
    * target edge type (U4, `inference.py:52-65`). The new node's feature
    * vector is zeros except the trailing degree slot = |seeds| + 1
    * (mirroring `inference.py:48-52`, where the only engineered feature of
    * a fresh playlist is its degree).
    *
    * PRECONDITION: the graph has been through [[HeteroGraph.addDegree]]
    * (the trailing feature is the degree slot) and `srcType` is non-empty;
    * both are `require`d — on a degree-less graph the seed degree would
    * silently overwrite a real engineered feature.
    * @return (mutated graph, new node id) */
  def addSeedNode(
      g: HeteroGraph,
      target: EdgeKey,
      seedDst: Seq[Long])(implicit spark: SparkSession): (HeteroGraph, Long) = {
    import spark.implicits._
    val srcNodes = g.nodes(target.src)
    // one pass for both: max id (null ⇒ empty type) and feature width
    val head = srcNodes
      .agg(max(col("id")).as("mx"), max(size(col("features"))).as("w")).head()
    require(!head.isNullAt(0),
      s"addSeedNode: node type '${target.src}' is empty — nothing to anchor the new id to")
    val newId = head.getLong(0) + 1L
    val width = head.getInt(1)
    require(width >= 1,
      s"addSeedNode: node type '${target.src}' has empty feature vectors — " +
        "call addDegree before mutating (the seed's only feature is its degree)")
    val feats = Array.fill(width)(0f); feats(width - 1) = seedDst.size + 1f
    val newNode = Seq((newId, feats)).toDF("id", "features")
      .withColumn("pk", lit(null).cast(srcNodes.schema("pk").dataType))
      .select(srcNodes.columns.map(col): _*)

    val fwd = seedDst.map(d => (newId, d)).toDF("src", "dst")
    val rev = seedDst.map(d => (d, newId)).toDF("src", "dst")
    val loop = Seq((newId, newId)).toDF("src", "dst")

    var edges = g.edges
    edges += target -> edges(target).unionByName(fwd)
    val revKey = target.reversed
    if (edges.contains(revKey)) edges += revKey -> edges(revKey).unionByName(rev)
    val loopKey = EdgeKey(target.src, "SELF_LOOP", target.src)
    if (edges.contains(loopKey)) edges += loopKey -> edges(loopKey).unionByName(loop)

    (g.copy(nodes = g.nodes + (target.src -> srcNodes.unionByName(newNode))),
      newId)
  }

  /** Full flow: mutate → propagate `rounds` of frozen mean message passing
    * on degree-initialized embeddings → score `(newNode, candidate)` pairs
    * → top-k by (score desc, id asc) — the id tiebreak makes the ranking
    * total and hash-stable.
    *
    * With `model = Some(trained)` the candidates are scored by the TRAINED
    * head over `[h_s ∥ h_d ∥ h_s∘h_d]` (the reference's checkpoint-loaded
    * serving, `inference.py:30-41`); with `None` the frozen §7.2 dot scorer
    * applies. Load a persisted head with [[ModelStore.load]].
    * @return (id, pk, logit, score) of the k best candidates */
  def recommend(
      g: HeteroGraph,
      target: EdgeKey,
      seedDst: Seq[Long],
      k: Int,
      rounds: Int = 2,
      model: Option[TrainedModel] = None)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (mutated, newId) = addSeedNode(g, target, seedDst)
    val emb = Propagate.meanRounds(mutated, Propagate.degreeInit(mutated), rounds)
    val seeds = seedDst.toDF("id")
    // exclude the freshly inserted node from candidates ONLY when src and
    // dst are the same node type: newId lives in the src id space, so for
    // hetero targets comparing it against dst ids would silently drop the
    // unrelated dst node that happens to share the number
    val base = mutated.nodes(target.dst).select(col("id"))
      .join(seeds, Seq("id"), "left_anti")                 // J6
    val candidates =
      (if (target.isSelfType) base.filter(col("id") =!= newId) else base)
        .select(lit(newId).as("src"), col("id").as("dst"))
    // every candidate's src is the constant newId, so the src equi-key
    // constant-folds away; restrict the src side to the one seed row and
    // BROADCAST it — otherwise the planner pairs a data-scale candidate
    // frame with an unhinted 1-row frame as a CartesianProduct
    val seedEmb = broadcast(emb(target.src).filter(col("id") === newId))
    val scored = model match {
      case Some(m) =>
        Scoring.scoreEdgesModel(candidates, seedEmb, emb(target.dst),
          m.weights, m.intercept)
      case None =>
        Scoring.scoreEdges(candidates, seedEmb, emb(target.dst))
    }
    scored
      .join(mutated.nodes(target.dst).select(col("id").as("dst"), col("pk")), Seq("dst"))
      .select(col("dst").as("id"), col("pk"), col("logit"), col("score"))
      .orderBy(desc("logit"), asc("id"))                   // rank by logit:
      .limit(k)                                            // W4 TakeOrderedAndProject
  }
}
