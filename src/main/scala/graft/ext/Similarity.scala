package graft.ext

import graft.functions.ArrayOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column — the vector half of the
  * LLM-pipeline extension surface (the reference's only vector op is the
  * edge-decode dot product, `model.py:76`).
  *
  * Two tiers:
  *  - brute-force cosine top-k (`SparkEntry` q35): the exact baseline, a
  *    broadcast of the query row against a full scan — linear, but reads
  *    every vector.
  *  - random-hyperplane LSH buckets (this file): signatures are seeded
  *    Rademacher (±1) sign projections, so the whole scheme is
  *    deterministic and reproducible in plain SQL (the hyperplane literals
  *    embed into the oracle); candidates share a bucket in ≥1 table and are
  *    exact-cosine verified. At scale the bucket join replaces the O(n²)
  *    pair space with near-linear bucket-local work, and the signature scan
  *    is one codegen'd projection.
  *
  * Determinism: hyperplanes derive from `java.util.Random(seed)` alone;
  * cosine is accumulated in double left-to-right (ArrayOps.dot), matching
  * sequential SQL summation to ~1 ulp — thresholds must keep a gap wider
  * than that (τ=0.45 on the fixture has ≥5e-4 of clearance).
  */
object Similarity {

  /** `count` Rademacher hyperplanes of dimension `dim`: entries ±1 drawn
    * from `java.util.Random(seed)` in row-major order. Sign-projection LSH
    * with ±1 coordinates preserves angular locality like Gaussian planes
    * (Achlioptas-style sparse projections) while keeping literals compact
    * enough to inline into SQL. */
  def hyperplanes(dim: Int, count: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(count)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Bucket keys, one per table: key_t = t·2³² + Σ_j [dot(vec, plane_{t·b+j}) > 0]·2ʲ.
    * The t·2³² offset keeps keys from different tables disjoint, so a
    * single exploded join column covers all tables. */
  def bucketKeys(
      vec: Column, planes: Array[Array[Double]], tables: Int, bits: Int): Column = {
    require(planes.length >= tables * bits)
    val keys = (0 until tables).map { t =>
      (0 until bits).map { j =>
        val plane = planes(t * bits + j)
        val dot = ArrayOps.dot(vec, typedlit(plane.toSeq))
        when(dot > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _) + lit(t.toLong * 4294967296L)
    }
    array(keys: _*)
  }

  /** All pairs `(id_a < id_b)` with exact cosine ≥ `tau`, candidates from
    * hyperplane-LSH bucket collisions (any of `tables` tables). */
  def nearDupCosine(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      tables: Int = 4,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim = 64, count = tables * bits, seed = seed)
    val sigs = emb.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"),
      explode(bucketKeys(col(vecCol), planes, tables, bits)).as("key"))
      // barrier: the self-join reads this twice, and the signature plan
      // embeds tables×bits 64-double hyperplane literals — checkpointing
      // computes the dots once and keeps the literal-heavy tree out of
      // every downstream optimisation pass
      .localCheckpoint(eager = true)
    val cand = sigs.as("x").join(sigs.as("y"),
        col("x.key") === col("y.key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val vecs = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .filter(ArrayOps.cosine(col("va"), col("vb")) >= tau)
      .select(col("id_a"), col("id_b"))
  }

  /** Approximate top-k neighbours of `queryId`: candidates share ≥1 bucket
    * with the query across the tables, ranked by exact cosine (id
    * tiebreak). The scale path for q35's brute force — the candidate join
    * touches only bucket-mates instead of the full corpus. */
  def annTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int,
      tables: Int = 4,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim = 64, count = tables * bits, seed = seed)
    val sigs = emb.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"),
      explode(bucketKeys(col(vecCol), planes, tables, bits)).as("key"))
    val q = sigs.filter(col("id") === queryId)
      .select(col("key"), col("vec").as("qv"))
    sigs.join(broadcast(q), Seq("key"))
      .filter(col("id") =!= queryId)
      .select(col("id"), ArrayOps.cosine(col("vec"), col("qv")).as("score"))
      .groupBy("id").agg(max("score").as("score"))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select("id")
  }

  /** IVF-style approximate top-k: `nCentroids` centroids are a seeded
    * deterministic sample of the corpus's own vectors (rank by
    * [[graft.learn.DetRandom]] over the id — reproducible in SQL, unlike
    * k-means iterations), every vector is assigned to its max-inner-product
    * centroid, and the query probes the `nProbe` nearest centroid lists,
    * ranking candidates by exact cosine. The inverted-file shape is the
    * point: at corpus scale the assignment is one broadcast-join pass and
    * a query touches ~nProbe/nCentroids of the data instead of all of it.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val s = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val centroids = s
      .withColumn("r", graft.learn.DetRandom.uniform(col("id"), col("id"), seed))
      .orderBy(col("r"), col("id")).limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"))
    ivfSearch(s, centroids, queryId, k, nProbe)
  }

  /** IVF top-k over REAL k-means centroids (Spark ML `KMeans`, seeded) —
    * the quality tier of [[ivfTopK]] behind the same signature: properly
    * fitted centroids partition the corpus by actual density, so at equal
    * `nProbe` the probed lists capture more of the query's true
    * neighbourhood than sampled-vector centroids. The fit is one
    * distributed Lloyd's run (k-means∥ init); float reduction order makes
    * it rows-only territory — the sampled variant stays the hash-exact
    * oracle twin (q42), this one is the production path (q45). */
  /** Fitted spherical-k-means centroids, memoised per (session,
    * canonicalised input plan, params): the fit is the expensive half of
    * [[ivfTopKKMeans]] and is a pure function of its (session-immutable)
    * input — two queries probing the same index (q45 serving, q54 recall
    * measurement) must share one Lloyd's run, exactly as a real IVF index
    * is built once and probed many times. Session-scoped via
    * [[graft.functions.Memos]] (same contract as the propagation/shingle
    * memos). */
  def ivfTopKKMeans(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    // spherical k-means: fit and assign in L2-normalised space, where
    // Euclidean clustering is equivalent to cosine clustering — the final
    // ranking is exact cosine, which normalisation leaves unchanged
    val s = emb.select(col(idCol).cast("long").as("id"),
      ArrayOps.l2normalize(col(vecCol).cast("array<double>")).as("v"))
    val centroids = graft.functions.Memos.getOrElseUpdate(
      emb.sparkSession,
      ("kmeans-centroids",
        emb.queryExecution.analyzed.canonicalized, idCol, vecCol,
        nCentroids, seed)) {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val spark = emb.sparkSession
        import spark.implicits._
        // barrier: each k-means iteration re-reads its input, and an
        // uncached plan would replay the scan + normalise + vector
        // conversion per iteration (Spark ML even warns about it)
        val feats = s.select(array_to_vector(col("v")).as("features"))
          .localCheckpoint(eager = true)
        val model = new KMeans()
          .setK(nCentroids).setSeed(seed).setMaxIter(20)
          .fit(feats)
        model.clusterCenters.toSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c.toArray.toSeq) }
          .toDF("cid", "cv")
      }
    ivfSearch(s, centroids, queryId, k, nProbe)
  }

  /** Shared IVF tail: assign every vector to its max-inner-product
    * centroid (broadcast, argmax via window with centroid-id tiebreak),
    * probe the `nProbe` centroids nearest the query, rank the probed lists
    * by exact cosine. One broadcast-join pass for assignment; a query
    * touches ~nProbe/nCentroids of the corpus. */
  private def ivfSearch(
      s: DataFrame,
      centroids: DataFrame,
      queryId: Long,
      k: Int,
      nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val asgW = Window.partitionBy("id")
      .orderBy(desc("dp"), asc("cid"))
    val assigned = s.crossJoin(broadcast(centroids))
      .withColumn("dp", ArrayOps.dot(col("v"), col("cv")))
      .withColumn("rk", row_number().over(asgW))
      .filter(col("rk") === 1)
      .select(col("id"), col("v"), col("cid"))
    val qv = s.filter(col("id") === queryId).select(col("v").as("qv"))
    val probes = centroids.crossJoin(broadcast(qv))
      .withColumn("dp", ArrayOps.dot(col("cv"), col("qv")))
      .orderBy(desc("dp"), asc("cid")).limit(nProbe)
      .select(col("cid"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("id"), ArrayOps.cosine(col("v"), col("qv")).as("score"))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select("id")
  }

  /** The oracle twin of [[nearDupCosine]]/[[annTopK]]'s bucket step, as a
    * SQL scalar expression list: one key expression per table, over the
    * same seeded planes. `vecExpr` must be a DOUBLE list expression. */
  def bucketKeySql(
      vecExpr: String, tables: Int, bits: Int, seed: Long): Seq[String] = {
    val planes = hyperplanes(dim = 64, count = tables * bits, seed = seed)
    (0 until tables).map { t =>
      val bitsSql = (0 until bits).map { j =>
        val lits = planes(t * bits + j).map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"CASE WHEN list_dot_product($vecExpr, $lits) > 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"(CAST(${t.toLong * 4294967296L} AS BIGINT) + $bitsSql)"
    }
  }
}
