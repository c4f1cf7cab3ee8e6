package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r8.md): scale-confidence run for the CURATION
  * family — the dedup/fuzzy/ANN pipelines whose skew/scale posture was
  * previously spec-scale only. Builds K structure-preserving disjoint
  * copies of the sf0.1 corpus at K = 1, 2, 4 and times each pipeline.
  *
  * Structure preservation per modality (each copy must reproduce the
  * base workload WITHOUT creating cross-copy matches — a naive id-offset
  * copy would make every doc a member of a K-way duplicate class and
  * turn the pair space quadratic in K):
  *
  *  - documents: every `[A-Za-z0-9]+` token of copy i > 0 gets an
  *    alphanumeric suffix `zq<i>`. Token mapping is injective, so
  *    within-copy shingle SETS map injectively and exact Jaccard is
  *    PRESERVED BIT-FOR-BIT (q44's verified pair set is identical per
  *    copy); cross-copy shingle overlap is zero (a base-corpus token
  *    would have to literally end in `zq<i>` to collide — absent from
  *    the fixture). MinHash/SimHash signatures re-randomise per copy
  *    (different strings hash differently) — same family, fresh draw,
  *    which is exactly what distinct-but-alike corpus shards look like.
  *  - embeddings: copy i applies a seeded SIGNED PERMUTATION of the 64
  *    dims — an orthogonal map, so within-copy cosines are preserved
  *    exactly (q40's verified pair set per copy ≡ base) while cross-copy
  *    vectors decorrelate. (Cross-copy cosines are not provably < τ —
  *    chance pairs above 0.4 can add verify rows; counts are printed so
  *    the effect is visible.)
  *  - customer names: copy i appends the 2-char suffix `<i><i>`; edit
  *    distances within a copy are unchanged (shared suffix), and any
  *    cross-copy pair differs in ≥ 2 trailing chars, so q89's
  *    distance-≤1 pair set scales by exactly K.
  *
  * The LSH HOT-BAND case (the skew SkewStressSpec doesn't cover): H
  * near-identical docs (one shared 40-token template + a unique trailing
  * token each) all land in the SAME band buckets — a C(H,2) within-
  * bucket pair explosion concentrated on a handful of keys. Timed
  * against the same corpus without the hot cluster; the printed pair
  * count certifies the ~C(H,2) true positives all survive.
  *
  * Not part of the driver contract. Usage:
  * `runMain graft.CurScaleProbe` (env: SPARK_GRAFT_SF_DIR / _CPUS /
  * _REPS, SKEW_ONLY=1 to run just the hot-band case). */
object CurScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = spark.sessionState.conf.numShufflePartitions
    val off = 1L << 24

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"CURSCALE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }

    val docsBase = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val embBase = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val custBase = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"))

    def docCopies(k: Int): DataFrame =
      (0 until k).map { i =>
        docsBase.select((col("doc_id") + i * off).as("doc_id"),
          if (i == 0) col("text")
          else regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1zq$i")
            .as("text"))
      }.reduce(_ unionByName _).coalesce(parts).localCheckpoint(eager = true)

    def embCopies(k: Int): DataFrame =
      (0 until k).map { i =>
        val v =
          if (i == 0) col("embedding")
          else {
            // seeded signed permutation: orthogonal, cosine-preserving
            val rnd = new scala.util.Random(100 + i)
            val perm = rnd.shuffle((1 to 64).toVector)
            val sign = Vector.fill(64)(if (rnd.nextBoolean()) 1.0f else -1.0f)
            array((0 until 64).map(j =>
              (element_at(col("embedding"), perm(j)) * lit(sign(j)))
                .cast("float")): _*)
          }
        embBase.select((col("vec_id") + i * off).as("vec_id"),
          v.as("embedding"))
      }.reduce(_ unionByName _).coalesce(parts).localCheckpoint(eager = true)

    def custCopies(k: Int): DataFrame =
      (0 until k).map { i =>
        custBase.select((col("c_custkey") + i * off).as("c_custkey"),
          (if (i == 0) col("c_name")
           else concat(col("c_name"), lit(s"$i$i"))).as("c_name"))
      }.reduce(_ unionByName _).coalesce(parts).localCheckpoint(eager = true)

    if (!sys.env.contains("SKEW_ONLY")) {
      for (k <- Seq(1, 2, 4); r <- 1 to reps) {
        graft.functions.Memos.clear(spark)
        val docs = docCopies(k)
        val emb = embCopies(k)
        val cust = custCopies(k)
        println(s"CURSCALE k=$k docs=${docs.count()} emb=${emb.count()} " +
          s"cust=${cust.count()}")
        time(s"k=$k rep$r minhash ")(graft.ext.Dedup.nearDupMinhash(
          docs, "doc_id", "text", bands = 32, rows = 4).count())
        time(s"k=$k rep$r simhash ")(graft.ext.Dedup.nearDupSimhash(
          docs, "doc_id", "text").count())
        time(s"k=$k rep$r jaccard ")(graft.ext.Dedup.nearDupJaccardExact(
          docs, "doc_id", "text").count())
        time(s"k=$k rep$r embdup  ")(graft.ext.Similarity.nearDupCosine(
          emb, "vec_id", "embedding", tau = 0.4).count())
        time(s"k=$k rep$r fuzzy   ")(graft.ext.Fuzzy.editOnePairs(
          cust, "c_custkey", "c_name").count())
      }
    }

    // LSH hot-band skew: H near-identical docs -> one C(H,2) bucket
    locally {
      val h = sys.env.getOrElse("SKEW_H", "1000").toInt
      val template = (1 to 40).map(i => s"tmpl$i").mkString(" ")
      import spark.implicits._
      val hot = spark.range(h).select(
        (col("id") + (1L << 30)).as("doc_id"),
        concat(lit(template + " tail"), col("id").cast("string")).as("text"))
      val base = docCopies(1)
      val withHot = base.unionByName(hot).coalesce(parts)
        .localCheckpoint(eager = true)
      for (r <- 1 to reps) {
        graft.functions.Memos.clear(spark)
        time(s"skew rep$r minhash base    ")(graft.ext.Dedup.nearDupMinhash(
          base, "doc_id", "text", bands = 32, rows = 4).count())
        graft.functions.Memos.clear(spark)
        time(s"skew rep$r minhash hot(H=$h)")(graft.ext.Dedup.nearDupMinhash(
          withHot, "doc_id", "text", bands = 32, rows = 4).count())
      }
    }
    spark.stop()
  }
}
