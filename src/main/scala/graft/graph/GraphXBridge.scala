package graft.graph

import graft.topology.EdgeKey
import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GraphX bridge (SURVEY.md §1.3, §7.0): the typed hetero graph flattened
  * into one `Graph[(Byte, Array[Float]), Byte]` over a global Long vertex
  * space — per-type dense ids offset by a prefix sum of type sizes, node
  * and edge types down-coded to Byte tags.
  *
  * This is the scale path for iterative propagation when edge counts
  * outgrow DataFrame joins: GraphX partitions the edge RDD once
  * (`aggregateMessages` reuses the partitioning every round) whereas the
  * DataFrame loop re-shuffles per round per edge type. The DataFrame loop
  * stays the default — it remains inside Catalyst/codegen and
  * hash-matches the oracle; the bridge is for the regime where the edge
  * list dominates memory.
  */
final case class HeteroGraphX(
    graph: Graph[(Byte, Array[Float]), Byte],
    typeTags: Map[String, Byte],
    typeOffsets: Map[String, Long],
    edgeTags: Map[EdgeKey, Byte])

object GraphXBridge {

  /** Flatten. Offsets are a prefix sum over type names in sorted order —
    * deterministic regardless of Map iteration. Requires one max(id) job
    * per node type (the bridge is an explicit materialisation point). */
  def toGraphX(g: HeteroGraph)(implicit spark: SparkSession): HeteroGraphX = {
    val types = g.nodes.keys.toSeq.sorted
    require(types.size <= Byte.MaxValue, "more node types than Byte tags")
    val sizes = types.map(t =>
      t -> (g.nodes(t).agg(max(col("id"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0) + 1L
      }))
    val offsets = sizes.scanLeft(("", 0L)) {
      case ((_, acc), (t, n)) => (t, acc + n)
    }.sliding(2).map { case Seq((_, off), (t, _)) => t -> off }.toMap
    val tags = types.zipWithIndex.map { case (t, i) => t -> i.toByte }.toMap

    val vertices: RDD[(VertexId, (Byte, Array[Float]))] =
      types.map { t =>
        val off = offsets(t); val tag = tags(t)
        g.nodes(t).select(col("id"), col("features")).rdd.map { r =>
          (off + r.getLong(0),
            (tag, r.getSeq[Float](1).toArray))
        }
      }.reduce(_ union _)

    val eKeys = g.edges.keys.toSeq.sortBy(_.name)
    require(eKeys.size <= Byte.MaxValue, "more edge types than Byte tags")
    val eTags = eKeys.zipWithIndex.map { case (k, i) => k -> i.toByte }.toMap
    val edges: RDD[Edge[Byte]] = eKeys.map { k =>
      val so = offsets(k.src); val dOff = offsets(k.dst); val tag = eTags(k)
      g.edges(k).select(col("src"), col("dst")).rdd.map { r =>
        Edge(so + r.getLong(0), dOff + r.getLong(1), tag)
      }
    }.reduce(_ union _)

    HeteroGraphX(Graph(vertices, edges), tags, offsets, eTags)
  }

  /** Total degree per node type `(id, degree)` computed with GraphX —
    * the `aggregateMessages`-family backend for [[HeteroGraph.addDegree]]'s
    * endpoint counting (G6). Degrees here are raw incident-edge counts;
    * the +1/default-1 convention is the caller's. */
  def degrees(hx: HeteroGraphX)(implicit spark: SparkSession): Map[String, DataFrame] = {
    val degs = hx.graph.degrees // VertexRDD[Int]
    byType(hx, degs.mapValues(_.toLong))
  }

  // message accumulator: edgeTag -> (vector partial sum, count) — carries
  // per-edge-tag partials so the per-TYPE mean can be recovered dst-side
  private type Acc = Map[Byte, (Array[Double], Long)]

  private def mergeAcc(a: Acc, b: Acc): Acc =
    (a.keySet ++ b.keySet).map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((va, na)), Some((vb, nb))) =>
          val s = va.clone(); var i = 0
          while (i < s.length) { s(i) += vb(i); i += 1 }
          k -> ((s, na + nb))
        case (Some(x), None) => k -> x
        case (None, Some(x)) => k -> x
        case _ => throw new IllegalStateException
      }
    }.toMap

  /** One superstep over in-graph state: `aggregateMessages` (one pass over
    * the partition-stable edge RDD) + a vertex-local `outerJoinVertices`
    * with the co-partitioned message VertexRDD, matching
    * [[graft.learn.Propagate.meanRounds]] semantics exactly: per edge TYPE
    * the mean of source vectors per destination, summed across types,
    * averaged with the self embedding over (1 + #delivering types). */
  private def step(g: Graph[Array[Double], Byte]): Graph[Array[Double], Byte] = {
    val msgs = g.aggregateMessages[Acc](
      ctx => if (ctx.srcAttr != null)
        ctx.sendToDst(Map(ctx.attr -> ((ctx.srcAttr, 1L)))),
      mergeAcc)
    g.outerJoinVertices(msgs) { (_, vec, accOpt) =>
      if (vec == null) null
      else accOpt match {
        case None => vec
        case Some(acc) =>
          val nTypes = acc.size
          val sum = new Array[Double](vec.length)
          acc.values.foreach { case (s, n) =>
            var i = 0
            while (i < sum.length) { sum(i) += s(i) / n; i += 1 }
          }
          val res = new Array[Double](vec.length)
          var i = 0
          while (i < res.length) {
            res(i) = (vec(i) + sum(i)) / (1 + nTypes); i += 1
          }
          res
      }
    }
  }

  /** L rounds, Pregel-shaped: ONE vertex join brings the init embeddings
    * into the graph, then every round is `aggregateMessages` + a
    * vertex-local message join — the state never leaves the `Graph`, the
    * flattened edge RDD keeps its partitioning across all rounds, and no
    * DataFrame↔RDD round trip happens until the final type split. Each
    * round's graph is materialised + cached and its parent unpersisted
    * (GraphX-Pregel style) so lineage and storage stay O(1) in rounds.
    * Prefer this backend when the edge list dominates cluster memory. */
  def meanRounds(
      hx: HeteroGraphX,
      init: Map[String, DataFrame],
      rounds: Int)(implicit spark: SparkSession): Map[String, DataFrame] = {
    val vecs: RDD[(VertexId, Array[Double])] = init.map { case (t, df) =>
      val off = hx.typeOffsets(t)
      df.select(col("id"), col("vec")).rdd.map(r =>
        (off + r.getLong(0), r.getSeq[Double](1).toArray))
    }.reduce(_ union _)
    var cur: Graph[Array[Double], Byte] =
      hx.graph.outerJoinVertices(vecs) { case (_, _, v) => v.orNull }.cache()
    for (_ <- 1 to rounds) {
      val next = step(cur).cache()
      next.vertices.count() // materialise before dropping the parent
      cur.unpersistVertices(blocking = false)
      cur.edges.unpersist(blocking = false)
      cur = next
    }
    byTypeVec(hx, cur.vertices.filter(_._2 != null), init.keySet)
  }

  /** One round of [[meanRounds]]. */
  def meanRound(
      hx: HeteroGraphX,
      init: Map[String, DataFrame])(
      implicit spark: SparkSession): Map[String, DataFrame] =
    meanRounds(hx, init, rounds = 1)

  private def byType(
      hx: HeteroGraphX, rdd: RDD[(VertexId, Long)])(
      implicit spark: SparkSession): Map[String, DataFrame] = {
    val bounds = typeBounds(hx)
    bounds.map { case (t, (lo, hi)) =>
      val local = rdd.filter { case (vid, _) => vid >= lo && vid < hi }
        .map { case (vid, v) => Row(vid - lo, v) }
      t -> spark.createDataFrame(local, StructType(Seq(
        StructField("id", LongType), StructField("degree", LongType))))
    }
  }

  private def byTypeVec(
      hx: HeteroGraphX, rdd: RDD[(VertexId, Array[Double])],
      types: Set[String])(
      implicit spark: SparkSession): Map[String, DataFrame] = {
    val bounds = typeBounds(hx).filter(b => types(b._1))
    bounds.map { case (t, (lo, hi)) =>
      val local = rdd.filter { case (vid, _) => vid >= lo && vid < hi }
        .map { case (vid, v) => Row(vid - lo, v.toSeq) }
      t -> spark.createDataFrame(local, StructType(Seq(
        StructField("id", LongType),
        StructField("vec", ArrayType(DoubleType)))))
    }
  }

  /** [offset, nextOffset) per type. */
  private def typeBounds(hx: HeteroGraphX): Map[String, (Long, Long)] = {
    val sorted = hx.typeOffsets.toSeq.sortBy(_._2)
    sorted.zipWithIndex.map { case ((t, lo), i) =>
      val hi = if (i + 1 < sorted.size) sorted(i + 1)._2 else Long.MaxValue
      t -> (lo, hi)
    }.toMap
  }
}
