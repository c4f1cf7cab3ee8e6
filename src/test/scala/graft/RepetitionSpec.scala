package graft

import graft.ext.Repetition

/** Gopher n-gram coverage (q143): hand-computed positional-union cases —
  * overlap collapse, deterministic tie-break, short-doc zeros. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(docs: Seq[(Long, String)]) =
    Repetition.ngramCoverage(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 until r.length).map(r.getLong).toVector).toMap

  test("top n-gram coverage is a positional union with overlap collapse") {
    val m = rows(Seq(
      (1L, "a b a b a b c"), // top 2-gram "a b"×3 covers 6 of 7 positions
      (2L, "x x x"),         // "x x"×2 overlaps: union {1,2,3} = all chars
      (3L, "b b a a")))      // three 2-grams tie at 1 → lexicographic "a a"
    // columns: n_chars, top2, top3, top4, dup5..dup10
    assert(m(1L)(0) == 7L && m(1L)(1) == 6L * 1000000L / 7L,
      s"doc 1: ${m(1L)}")
    assert(m(2L)(0) == 3L && m(2L)(1) == 1000000L, s"doc 2: ${m(2L)}")
    assert(m(3L)(1) == 500000L, s"doc 3 tie-break: ${m(3L)}")
  }

  test("duplicated n-gram coverage unions all repeated grams; short docs zero") {
    val m = rows(Seq(
      // "p q r s t" repeats at i=1 and i=7 (separated by "u"): the
      // duplicated 5-gram covers 10 of 11 positions (5 single chars + u)
      (1L, "p q r s t u p q r s t"),
      (2L, "only four tokens here"), // < 5 tokens → every dup ppm 0
      (3L, "")))                     // tokenless → all zeros incl. n_chars
    assert(m(1L)(4) == 10L * 1000000L / 11L, s"doc 1 dup5: ${m(1L)}")
    assert((5 to 10).forall(i => m(2L)(i - 1) == 0L), s"doc 2: ${m(2L)}")
    assert(m(3L).forall(_ == 0L), s"doc 3: ${m(3L)}")
  }
}
