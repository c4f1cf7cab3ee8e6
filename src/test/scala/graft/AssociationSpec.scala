package graft

import graft.ext.Association
import org.apache.spark.sql.DataFrame

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  /** Naive support/confidence/lift over in-memory baskets. */
  private def naive(
      rows: Seq[(Long, Long)], minSupport: Long
  ): Map[(Long, Long), (Long, Long, Long, Long)] = {
    val baskets = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val n = baskets.size.toLong
    val cnt = rows.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    baskets.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minSupport)
      .map { case ((a, b), supp) =>
        (a, b) -> (supp,
          supp * 1000000L / cnt(a),
          supp * 1000000L / cnt(b),
          supp * n * 1000000L / (cnt(a) * cnt(b)))
      }.toMap
  }

  private def run(df: DataFrame, minSupport: Long = 2L) =
    Association.pairRules(df, "bk", "it", minSupport).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("pairRules: hand-checked support/confidence/lift") {
    // baskets: {1,2} ×3, {1,3} ×1, {2,3} ×1, {1} alone ×1  (N = 6)
    val rows: Seq[(Long, Long)] = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L), (14L, 2L), (14L, 3L), (15L, 1L))
    val got = run(rows.toDF("bk", "it"))
    // only {1,2} reaches support 2: supp=3, cnt(1)=5, cnt(2)=4, N=6
    assert(got.keySet === Set((1L, 2L)))
    val (supp, cAb, cBa, lift) = got((1L, 2L))
    assert(supp === 3L)
    assert(cAb === 3L * 1000000L / 5L)
    assert(cBa === 3L * 1000000L / 4L)
    assert(lift === 3L * 6L * 1000000L / 20L) // lift < 1 in scaled terms? 900000
    assert(got === naive(rows, 2L))
  }

  test("pairRules: duplicate lineitems count once; random ≡ naive; partition-independent") {
    val rnd = new scala.util.Random(23)
    // duplicates are common (same part twice in one basket)
    val rows = Seq.fill(500)((rnd.nextInt(60).toLong, rnd.nextInt(25).toLong))
    val want = naive(rows, 2L)
    val a = run(rows.toDF("bk", "it").repartition(7))
    assert(a === run(rows.toDF("bk", "it").coalesce(1)))
    assert(a === want)
    assert(a.nonEmpty)
  }

  test("pairRules: a precomputed pairSupports frame ≡ the internal self-join") {
    val rnd = new scala.util.Random(43)
    val rows = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(20).toLong))
    val df = rows.toDF("bk", "it")
    val bi = df.distinct()
    val pw = bi.join(bi.select($"bk", $"it".as("it2")), Seq("bk"))
      .filter($"it" < $"it2")
      .groupBy($"it".as("a"), $"it2".as("b"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
    val viaShared = Association.pairRules(df, "bk", "it", 2L, 1000000L, Some(pw))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(viaShared === run(df))
  }

  test("pairRules: a perfectly co-occurring pair has confidence = lift basis") {
    // items 7 and 8 appear in exactly the same 3 baskets and nowhere else
    val rows: Seq[(Long, Long)] = Seq(
      (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L), (3L, 7L), (3L, 8L), (4L, 9L))
    val got = run(rows.toDF("bk", "it"))
    val (supp, cAb, cBa, lift) = got((7L, 8L))
    assert(supp === 3L && cAb === 1000000L && cBa === 1000000L)
    assert(lift === 3L * 4L * 1000000L / 9L) // N/supp in scaled form
  }
}
