package graft.graph

import graft.topology.EdgeKey
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed heterogeneous property graph — the Spark equivalent of PyG's
  * `HeteroData` (`convert_to_graph.py:191-214`, SURVEY.md §1.3).
  *
  * Per node type one DataFrame `(id: bigint, pk: <original>, features:
  * array<float>)`; per edge type `(src: bigint, dst: bigint)` in the dense
  * per-type id space (COO layout, `convert_to_graph.py:46`).
  */
final case class HeteroGraph(
    nodes: Map[String, DataFrame],
    edges: Map[EdgeKey, DataFrame],
    sizeHints: Map[String, Long] = Map.empty) {

  def nodeCount(t: String): Long = nodes(t).count()
  def edgeCount(k: EdgeKey): Long = edges(k).count()

  /** Size of a node type's dense id space (`max(id)+1`). Served from
    * [[sizeHints]] when the builder's dense-PK probe already knows it
    * (zero Spark jobs); otherwise one column-pruned max aggregation. */
  def idSpaceSize(t: String): Long =
    sizeHints.getOrElse(t, nodes(t).agg(max(col("id"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0) + 1L
    })

  /** Degree feature (G6, `convert_to_graph.py:217-241`): per node type, the
    * number of incident edge endpoints across ALL edge types where the type
    * appears as src or dst, plus 1; isolated nodes get 1
    * (`:231-233`). Appended to `features`.
    *
    * Scale shape: one `groupBy(endpoint).count` per edge type (map-side
    * partial agg), a union, a re-aggregation, then a left join back to the
    * node table — no driver-side state.
    */
  def addDegree(implicit spark: SparkSession): HeteroGraph = {
    val parts: Seq[(String, DataFrame)] =
      edges.toSeq.flatMap { case (k, df) =>
        Seq(
          k.src -> df.groupBy(col("src").as("id")).agg(count("*").as("cnt")),
          k.dst -> df.groupBy(col("dst").as("id")).agg(count("*").as("cnt")))
      }
    val byType = parts.groupBy(_._1).map { case (t, dfs) =>
      t -> dfs.map(_._2).reduce(_ unionByName _)
        .groupBy("id").agg(sum("cnt").as("degree"))
    }
    val newNodes = nodes.map { case (t, nodeDf) =>
      val deg = byType.get(t)
      val joined = deg match {
        case Some(d) => nodeDf.join(d, Seq("id"), "left")
        case None    => nodeDf.withColumn("degree", lit(null).cast("bigint"))
      }
      // degree+1, default 1 (`convert_to_graph.py:231-233`)
      t -> joined
        .withColumn("degree", coalesce(col("degree"), lit(0L)) + 1L)
        .withColumn("features",
          concat(col("features"), array(col("degree").cast("float"))))
        .drop("degree")
    }
    copy(nodes = newNodes)
  }

  /** Reverse edges (G7, `convert_to_graph.py:243-249`): for every edge type
    * whose src and dst types differ, add `(dst, REVERSE_rel, src)`.
    * Self-type edge types are skipped, exactly like the reference
    * (`edge[0] != edge[2]`, `:246`). */
  def withReverseEdges: HeteroGraph = {
    val rev = edges.collect {
      case (k, df) if !k.isSelfType =>
        k.reversed -> df.select(
          col("dst").as("src"), col("src").as("dst"))
    }
    copy(edges = edges ++ rev)
  }

  /** Self-loop edge types (G8, `convert_to_graph.py:252-257`):
    * `(n, SELF_LOOP, n)` for every node of every type. */
  def withSelfLoops: HeteroGraph = {
    val loops = nodes.map { case (t, df) =>
      EdgeKey(t, "SELF_LOOP", t) ->
        df.select(col("id").as("src"), col("id").as("dst"))
    }
    copy(edges = edges ++ loops)
  }

  /** Restrict to the sub-graph that can influence `targets` within `hops`
    * rounds of message passing: keep edge types whose messages reach a
    * needed node type, walking backwards hop by hop. Propagating a 2-hop
    * head over the full heterogeneous graph wastes a shuffle per
    * irrelevant edge type per round — at 100 TB that's the difference
    * between touching two tables and touching all of them. */
  def restrictTo(targets: Set[String], hops: Int): HeteroGraph = {
    var needed = targets
    var keep = Set.empty[EdgeKey]
    for (_ <- 1 to hops) {
      val in = edges.keys.filter(k => needed(k.dst)).toSet
      keep ++= in
      needed ++= in.map(_.src)
    }
    copy(
      nodes = nodes.view.filterKeys(needed).toMap,
      edges = edges.view.filterKeys(keep).toMap)
  }

  /** Persist as a partitioned parquet directory (S7 — the reference's
    * `torch.save(graph,'data/graph.bin')`, `convert_to_graph.py:271`,
    * re-expressed as columnar storage that scales past one machine).
    *
    * Edge directories are INDEX-named (`edges/e_0`, …) with the true
    * `(src, rel, dst)` triples in `edges_meta` — encoding the triple into
    * the directory name (`src__rel__dst`) cannot round-trip a relation
    * that itself contains the separator (same fix as [[saveBucketed]]'s
    * meta table). Node directories stay type-named: the name is read back
    * verbatim, never parsed, so any filesystem-safe type round-trips. */
  def save(path: String): Unit = {
    nodes.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$path/nodes/$t")
    }
    val edgeList = edges.toSeq.sortBy(_._1.name)
    edgeList.zipWithIndex.foreach { case ((_, df), i) =>
      df.write.mode("overwrite").parquet(s"$path/edges/e_$i")
    }
    val spark = nodes.head._2.sparkSession
    import spark.implicits._
    edgeList.zipWithIndex
      .map { case ((k, _), i) => (s"e_$i", k.src, k.rel, k.dst) }
      .toDF("dir", "src", "rel", "dst")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/edges_meta")
  }

  /** Persist bucketed for co-located propagation (the 100 TB layout):
    * node frames bucket+sort by `id`, edge frames by `src`, all with the
    * same bucket count — so each propagation round's big join
    * (edges ⨝ src embeddings) reads bucket i against bucket i with NO
    * exchange on either side after reload (Spark's alias-aware output
    * partitioning carries the node bucketing through the `id AS src`
    * rename). Bucketing by `src` kills the edge-frame shuffle — the
    * frame that is ~|E| and dominates the round; the per-dst aggregation
    * still exchanges, but only map-side-combined message rows (~|V|).
    * Bucket metadata needs the session catalog, hence `saveAsTable`
    * (table names derive from the prefix; [[HeteroGraph.loadBucketed]]
    * reverses them). */
  def saveBucketed(prefix: String, buckets: Int): Unit = {
    // Catalog table names are index-based (`<prefix>_n_0`, `<prefix>_e_1`,
    // …) with the TRUE type/relation names in a `<prefix>_meta` table:
    // encoding names into identifiers would not survive saveAsTable's
    // lowercasing (REVERSE_*/SELF_LOOP relations) or a type containing
    // the `__` separator. Only the prefix itself must be identifier-safe.
    require(prefix.matches("[a-z][a-z0-9_]*") && !prefix.contains("__"),
      s"saveBucketed: prefix '$prefix' must be a lowercase identifier " +
        "without '__' (it becomes a catalog table-name prefix)")
    val spark = nodes.head._2.sparkSession
    // Ownership guard: sessions of one JVM share the warehouse directory
    // (and, under one SparkContext, the external catalog), so overwriting
    // a prefix a LIVE sibling session saved would pull its tables out from
    // under that session's loaded graph. Refuse instead — the caller
    // should loadBucketed from the shared catalog or pick another prefix.
    HeteroGraph.bucketedLiveOwner(spark, prefix).foreach { _ =>
      throw new IllegalStateException(
        s"saveBucketed: prefix '$prefix' belongs to a live sibling session" +
          " — loadBucketed it from the shared catalog or use another prefix")
    }
    // Stale-location cleanup: the in-memory catalog forgets tables across
    // JVMs, but saveAsTable refuses to overwrite their leftover managed
    // directories — drop both for every table of this prefix.
    locally {
      val wh = new java.io.File(
        spark.sessionState.conf.warehousePath.stripPrefix("file:"))
      Option(wh.list()).getOrElse(Array.empty[String])
        .filter(n => n == s"${prefix}_meta" ||
          n.startsWith(s"${prefix}_n_") || n.startsWith(s"${prefix}_e_"))
        .foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $n")
          scala.reflect.io.Directory(new java.io.File(wh, n)).deleteRecursively()
        }
    }
    val nodeList = nodes.toSeq.sortBy(_._1)
    val edgeList = edges.toSeq.sortBy(_._1.name)
    // The per-table CTAS jobs are independent — run them concurrently so
    // the save is bounded by the largest table, not the table count
    // (measured 14.6s → ~6s for the 10-table q55 graph at sf0.1).
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val writes =
        nodeList.zipWithIndex.map { case ((_, df), i) => () =>
          graft.sources.BucketedStore.writeBucketed(df, s"${prefix}_n_$i", "id", buckets)
        } ++
        edgeList.zipWithIndex.map { case ((_, df), i) => () =>
          graft.sources.BucketedStore.writeBucketed(df, s"${prefix}_e_$i", "src", buckets)
        }
      writes.map(w => Future(w())).foreach(f => Await.result(f, Duration.Inf))
    }
    import spark.implicits._
    (nodeList.zipWithIndex.map { case ((t, _), i) =>
      (s"${prefix}_n_$i", "node", t, "", "")
    } ++ edgeList.zipWithIndex.map { case ((k, _), i) =>
      (s"${prefix}_e_$i", "edge", k.src, k.rel, k.dst)
    }).toDF("tbl", "kind", "src_or_type", "rel", "dst")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${prefix}_meta")
    HeteroGraph.claimBucketedPrefix(spark, prefix)
  }

  def cached(): HeteroGraph =
    copy(
      nodes = nodes.map { case (t, d) => t -> graft.functions.Caching.ensureCached(d) },
      edges = edges.map { case (k, d) => k -> graft.functions.Caching.ensureCached(d) })

  /** Truncate every node/edge lineage behind a checkpoint barrier. A built
    * graph's DataFrames embed the whole conversion plan (scan + dense-id
    * windows + remap joins); anything that reuses them — propagation
    * rounds, degree, split, scoring — would otherwise replay that plan per
    * reference. One materialisation, then every consumer reads columnar
    * blocks. Call before multi-pass algorithms. */
  def materialized(): HeteroGraph =
    copy(nodes = nodes.map { case (t, d) => t -> d.localCheckpoint(eager = true) },
         edges = edges.map { case (k, d) => k -> d.localCheckpoint(eager = true) })
}

object HeteroGraph {
  /** Which session of this JVM owns each bucketed-store prefix — the
    * state behind [[HeteroGraph!.saveBucketed]]'s sibling guard. Weak
    * references: ownership must not keep a session alive, and a collected
    * or stopped owner frees its prefix. */
  private val bucketedOwners = scala.collection.concurrent.TrieMap
    .empty[String, java.lang.ref.WeakReference[SparkSession]]

  /** The LIVE session other than `s` that last saved `prefix` in this
    * JVM, if any. Callers use this to reload a sibling's tables from the
    * shared catalog instead of rebuilding over them. */
  def bucketedLiveOwner(s: SparkSession, prefix: String): Option[SparkSession] =
    bucketedOwners.get(prefix).flatMap(r => Option(r.get()))
      .filter(o => (o ne s) && !o.sparkContext.isStopped)

  private[graph] def claimBucketedPrefix(s: SparkSession, prefix: String): Unit =
    bucketedOwners(prefix) = new java.lang.ref.WeakReference(s)

  /** Reload a graph saved by [[HeteroGraph.saveBucketed]] from the
    * session catalog: the `<prefix>_meta` table carries the true
    * type/relation names, so arbitrary names (REVERSE_*, `__`, mixed
    * case) round-trip exactly. */
  def loadBucketed(spark: SparkSession, prefix: String): HeteroGraph = {
    import graft.topology.EdgeKey
    val meta = spark.table(s"${prefix}_meta").collect()
    val nodes = meta.filter(_.getString(1) == "node").map { r =>
      r.getString(2) -> spark.table(r.getString(0))
    }.toMap
    val edges = meta.filter(_.getString(1) == "edge").map { r =>
      EdgeKey(r.getString(2), r.getString(3), r.getString(4)) ->
        spark.table(r.getString(0))
    }.toMap
    HeteroGraph(nodes, edges)
  }

  /** Reload a graph saved by [[HeteroGraph.save]] (S8 — `torch.load`,
    * `train.py:16`). Edge names come from the `edges_meta` file (so a
    * relation containing `__` round-trips exactly); directories written
    * by a pre-meta save fall back to the legacy `src__rel__dst` split. */
  def load(spark: SparkSession, path: String): HeteroGraph = {
    def subdirs(p: String): Seq[String] = {
      val f = new java.io.File(p)
      if (!f.isDirectory) Seq.empty
      else f.listFiles.filter(_.isDirectory).map(_.getName).toSeq.sorted
    }
    val nodes = subdirs(s"$path/nodes")
      .map(t => t -> spark.read.parquet(s"$path/nodes/$t")).toMap
    val edges =
      if (new java.io.File(s"$path/edges_meta").isDirectory)
        spark.read.parquet(s"$path/edges_meta").collect().map { r =>
          EdgeKey(r.getAs[String]("src"), r.getAs[String]("rel"),
              r.getAs[String]("dst")) ->
            spark.read.parquet(s"$path/edges/${r.getAs[String]("dir")}")
        }.toMap
      else
        subdirs(s"$path/edges").map { n =>
          val Array(s, r, d) = n.split("__", 3)
          EdgeKey(s, r, d) -> spark.read.parquet(s"$path/edges/$n")
        }.toMap
    HeteroGraph(nodes, edges)
  }
}
