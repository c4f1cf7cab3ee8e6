package graft

import graft.ext.Similarity
import org.apache.spark.sql.SparkSession

/** Dev harness (r8 verdict item 4): the IVF+PQ recall/cost frontier.
  * q101 certifies PQ recall at ONE operating point (nCodes=16, full ADC
  * scan) and q102 adds probe-list pruning whose recall cost was
  * unmeasured — this probe sweeps nProbe × nCodes over the embeddings
  * fixture and reports, per cell: mean recall@10 against the exact
  * brute-force top-10, and the mean candidate fraction (the cost a
  * query pays at scale — what share of the code store it touches).
  *
  * All MODEL STATE comes from the engine's own fits — scaled image
  * ([[Similarity.scaledImage]]), coarse centroids
  * ([[Similarity.kmeansFixedCentroids]]), per-block codebooks
  * ([[Similarity.pqCodebooksFixed]]), codes
  * ([[Similarity.pqAssignCodes]]) — collected once per config; only the
  * per-query ranking arithmetic (the same integer `2·v·c − ‖c‖²` and
  * ADC sums, exact in Long) runs driver-side so a 5×4×|Q| grid costs
  * seconds, not a Spark job per cell. A RESIDUAL-PQ column is computed
  * alongside: codes fit on `vi − coarse_centroid` re-shifted
  * non-negative (the "second integer shift" FAISS residuals would need
  * here), with the SAME batched-Lloyd's math replayed driver-side —
  * measuring what residual encoding would buy before deciding to build
  * it into the engine.
  *
  * Not part of the driver contract. Usage: `runMain graft.IvfPqProbe`
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS; SPARK_GRAFT_CORPUS=
  * clustered swaps the near-random fixture for the SimilaritySpec-style
  * 16-Gaussian-cluster corpus — the r9 deferral's re-evaluation trigger:
  * residual PQ was measured at +0.00–0.05 recall on the fixture, where
  * PQ recall is corpus-bound; clustered data is where residual coding
  * should shine if it ever does here). */
object IvfPqProbe {

  /** The SimilaritySpec clustered corpus, scaled up: 16 diffuse Gaussian
    * clusters in 64-d (unit centers, per-dim σ=0.18), `n` vectors, same
    * seeded generator family as the spec so the regime matches the suite's
    * "pq on a clustered corpus" scenario. */
  private def clusteredCorpus(
      spark: SparkSession, n: Int, sigma: Double): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(Dim)(rnd.nextGaussian())
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }
    val centers = Seq.fill(NCentroids)(unit())
    (0 until n).map { i =>
      val c = centers(i % NCentroids)
      val noise = Array.fill(Dim)(rnd.nextGaussian() * sigma)
      (i.toLong, c.zip(noise).map { case (a, b) => (a + b).toFloat }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private val Dim = 64
  private val Blocks = 8
  private val Bw = Dim / Blocks
  private val K = 10
  private val NCentroids = 16
  private val Iters = 3
  private val Seed = 42L

  /** argmax of 2·v·c − ‖c‖² over centroids, cid tiebreak — the engine's
    * assignment rule, exact in Long. */
  private def assign(v: Array[Long], cents: Seq[(Long, Array[Long])]): Long =
    cents.map { case (cid, cv) =>
      val dot = dotL(v, cv); (2L * dot - dotL(cv, cv), cid)
    }.maxBy { case (s, cid) => (s, -cid) }._2

  private def dotL(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Driver-side replay of the engine's per-block batched Lloyd's
    * ([[Similarity.pqCodebooksFixed]]'s math) over an arbitrary integer
    * image — used ONLY for the residual variant, which the engine does
    * not (yet) implement. Init ranking uses the same DetRandom uniform
    * the Spark fit ranks by. */
  private def fitBlockCodebooks(
      img: Seq[(Long, Array[Long])], nCodes: Int): Map[Long, Seq[(Long, Array[Long])]] =
    (0 until Blocks).map { b =>
      val slice = img.map { case (id, v) =>
        (id, java.util.Arrays.copyOfRange(v, b * Bw, (b + 1) * Bw))
      }
      val byId = slice.toMap
      val initIds = img.map { case (id, _) =>
        (graft.learn.DetRandom.mixLong(id, id, Seed + b), id)
      }.sorted.take(nCodes).map(_._2)
      var cents: Seq[(Long, Array[Long])] =
        initIds.sorted.map(id => (id, byId(id)))
      for (_ <- 1 to Iters) {
        val grouped = slice.groupBy { case (_, vb) => assign(vb, cents) }
        cents = cents.map { case (cid, cv) =>
          grouped.get(cid) match {
            case Some(members) =>
              val s = new Array[Long](Bw)
              members.foreach { case (_, vb) =>
                var i = 0; while (i < Bw) { s(i) += vb(i); i += 1 } }
              (cid, s.map(x => Math.floorDiv(x, members.size.toLong)))
            case None => (cid, cv)
          }
        }
      }
      b.toLong -> cents
    }.toMap

  private def codeOf(
      v: Array[Long], books: Map[Long, Seq[(Long, Array[Long])]]): Array[Long] =
    (0 until Blocks).map { b =>
      assign(java.util.Arrays.copyOfRange(v, b * Bw, (b + 1) * Bw), books(b.toLong))
    }.map(_.toLong).toArray

  /** ADC top-k among `cands` given codes + books, ranked by (score desc,
    * id asc) — the serving rule. */
  private def adcTopK(
      qv: Array[Long],
      cands: Seq[Long],
      codes: Map[Long, Array[Long]],
      books: Map[Long, Seq[(Long, Array[Long])]]): Seq[Long] = {
    val table: Map[(Long, Long), Long] = books.flatMap { case (b, cs) =>
      val qb = java.util.Arrays.copyOfRange(qv, b.toInt * Bw, (b.toInt + 1) * Bw)
      cs.map { case (cid, cv) => (b, cid) -> (2L * dotL(qb, cv) - dotL(cv, cv)) }
    }
    cands.map { id =>
      val cd = codes(id)
      var s = 0L; var b = 0
      while (b < Blocks) { s += table((b.toLong, cd(b))); b += 1 }
      (s, id)
    }.sortBy { case (s, id) => (-s, id) }.take(K).map(_._2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpusKind = sys.env.getOrElse("SPARK_GRAFT_CORPUS", "fixture")
    val sigma = sys.env.getOrElse("SPARK_GRAFT_SIGMA", "0.18").toDouble
    val emb =
      if (corpusKind == "clustered")
        clusteredCorpus(spark, 2000, sigma).cache()
      else Tables.load(spark, sfDir, "embeddings")
    println(s"IVFPQ corpus=$corpusKind" +
      (if (corpusKind == "clustered") f" sigma=$sigma%.2f" else ""))

    // engine state, collected once
    val si: Seq[(Long, Array[Long])] = Similarity
      .scaledImage(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
      .sortBy(_._1)
    val byId = si.toMap
    val n = si.size
    val cents = Similarity
      .kmeansFixedCentroids(emb, "vec_id", "embedding", NCentroids, Iters, Seed)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val coarse: Map[Long, Long] = si.map { case (id, v) => id -> assign(v, cents) }.toMap
    val lists: Map[Long, Seq[Long]] =
      si.map(_._1).groupBy(coarse).map { case (c, ids) => c -> ids.toSeq }

    // exact brute-force top-10 per query, double cosine (the q101 rule)
    val raw: Map[Long, Array[Double]] = emb
      .selectExpr("cast(vec_id as bigint) AS id", "cast(embedding as array<double>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val queries: Seq[Long] = si.map(_._1).take(50)
    val brute: Map[Long, Set[Long]] = queries.map { q =>
      q -> raw.keys.filter(_ != q).toSeq
        .map(id => (cos(raw(id), raw(q)), id))
        .sortBy { case (s, id) => (-s, id) }.take(K).map(_._2).toSet
    }.toMap

    val nCodesGrid = Seq(8, 16, 32, 64)
    val nProbeGrid = Seq(1, 2, 4, 8, 16)

    println(f"IVFPQ n=$n queries=${queries.size} k=$K nCentroids=$NCentroids blocks=$Blocks")
    println("IVFPQ nCodes | variant  | " +
      nProbeGrid.map(p => f"nProbe=$p%-2d        ").mkString(" | "))
    for (c <- nCodesGrid) {
      // PLAIN: the engine's own fit + coding
      val books = Similarity
        .pqCodebooksFixed(emb, "vec_id", "embedding", Blocks, Dim, c, Iters, Seed)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (b, rows) =>
          b -> rows.map(r => (r.getLong(1), r.getSeq[Long](2).toArray)).toSeq
            .sortBy(_._1) }
      val booksDf = {
        import spark.implicits._
        books.toSeq.flatMap { case (b, cs) =>
          cs.map { case (cid, cv) => (b, cid, cv.toSeq) }
        }.toDF("blk", "cid", "cv")
      }
      val codes: Map[Long, Array[Long]] = Similarity
        .pqAssignCodes(emb, "vec_id", "embedding", booksDf, Blocks, Dim)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

      // RESIDUAL: codes fit on (vi − coarse centroid) + second shift.
      // Element range of the residual is ±2e6; shift by +2e6 keeps every
      // element non-negative for the floor-division convention.
      val resImg: Seq[(Long, Array[Long])] = si.map { case (id, v) =>
        val cv = cents.find(_._1 == coarse(id)).get._2
        id -> v.indices.map(i => v(i) - cv(i) + 2000000L).toArray
      }
      val resBooks = fitBlockCodebooks(resImg, c)
      val resCodes: Map[Long, Array[Long]] =
        resImg.map { case (id, v) => id -> codeOf(v, resBooks) }.toMap

      for (variant <- Seq("plain", "residual")) {
        val cells = nProbeGrid.map { p =>
          var recallSum = 0.0; var candSum = 0.0
          queries.foreach { q =>
            val qv = byId(q)
            val probed = cents.map { case (cid, cv) =>
              (2L * dotL(qv, cv) - dotL(cv, cv), cid) }
              .sortBy { case (s, cid) => (-s, cid) }.take(p).map(_._2).toSet
            val cands = probed.toSeq.flatMap(lists.getOrElse(_, Nil)).filter(_ != q)
            val top = variant match {
              case "plain" => adcTopK(qv, cands, codes, books)
              case _ =>
                // residual ADC: the query's table is per-LIST (its residual
                // against each probed centroid differs), the FAISS shape —
                // scored per candidate against its own list's query residual
                val qRes: Map[Long, Array[Long]] = probed.map { cid =>
                  val cv = cents.find(_._1 == cid).get._2
                  cid -> qv.indices.map(i => qv(i) - cv(i) + 2000000L).toArray
                }.toMap
                // cross-list comparability: score 2·a·b̂ − b̂·b̂ estimates
                // ‖a‖² − ‖a − b̂‖², and ‖a_L‖² (the query's residual norm)
                // VARIES per probed list — subtract it so every candidate
                // is ranked by −‖a_L − b̂‖² ≈ −‖q − x‖², the FAISS rule
                val qrNorm: Map[Long, Long] =
                  qRes.map { case (cid, qr) => cid -> dotL(qr, qr) }
                cands.map { id =>
                  val cd = resCodes(id)
                  val qr = qRes(coarse(id))
                  var s = 0L; var b = 0
                  while (b < Blocks) {
                    val (cid, cv) = resBooks(b.toLong)
                      .find(_._1 == cd(b)).get
                    val qb = java.util.Arrays.copyOfRange(qr, b * Bw, (b + 1) * Bw)
                    s += 2L * dotL(qb, cv) - dotL(cv, cv); b += 1
                  }
                  (s - qrNorm(coarse(id)), id)
                }.sortBy { case (s, id) => (-s, id) }.take(K).map(_._2)
            }
            recallSum += top.toSet.intersect(brute(q)).size.toDouble / K
            candSum += cands.size.toDouble / (n - 1)
          }
          (recallSum / queries.size, candSum / queries.size)
        }
        println(f"IVFPQ $c%6d | $variant%-8s | " + cells.map { case (r, f) =>
          f"r=$r%.3f f=$f%.3f" }.mkString(" | "))
      }
    }
    spark.stop()
  }
}
