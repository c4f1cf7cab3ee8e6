package graft

import graft.ext.QualityClassifier
import org.apache.spark.sql.functions.col

/** Trained document-quality classifier (q134/q135): frozen-head scores
  * against hand-computed closed forms, and the fit envelope's contract
  * on the fixture corpus. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("scoreFrozen: hand-computed integer scores, including a head-vs-label disagreement") {
    def doc(stops: Int, stopWord: String, others: Int): String =
      (Seq.fill(stops)(stopWord) ++ (1 to others).map(i => s"tok$i"))
        .mkString(" ")
    val docs = Seq(
      (1L, doc(5, "the", 45)), // 50 toks, stop_ppm 100000 → fp  970000, weak 1
      (2L, doc(0, "the", 10)), // 10 toks, stop_ppm      0 → fp -2230000, weak 0
      (3L, doc(1, "a", 59)),   // 60 toks, stop_ppm  16666 → fp  -613348, weak 0
      (4L, doc(2, "the", 43))  // 45 toks, stop_ppm  44444 → fp  -377232, weak 1
    ).toDF("doc_id", "text")
    val got = QualityClassifier.scoreFrozen(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(1L) == ((50L, 100000L, 970000L, 1L, 1L)))
    assert(got(2L) == ((10L, 0L, -2230000L, 0L, 0L)))
    assert(got(3L) == ((60L, 16666L, -613348L, 0L, 0L)))
    // the linear head disagrees with the conjunctive label here — kept as
    // a fixture so nobody "fixes" the head into replaying the label rule
    assert(got(4L) == ((45L, 44444L, -377232L, 0L, 1L)))
  }

  test("calibration: floor bins partition the corpus, rates are exact ppm") {
    val docs = Tables.load(spark, sf(), "documents")
    val rows = QualityClassifier.calibration(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == docs.count(), "bins must partition the corpus")
    assert(rows.forall { case (_, n, p, ppm) =>
      p <= n && ppm == p * 1000000L / n }, "pos_ppm must be exact floor ppm")
    // floor semantics at negative scores: a -613348 score lands in bin -2
    // (floor(-613348/500000) = -2), not the truncation bin -1
    val neg = QualityClassifier.calibration(
      Seq((1L, (Seq.fill(1)("a") ++ (1 to 59).map(i => s"tok$i"))
        .mkString(" "))).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(neg == Map(-2L -> 1L), s"expected bin -2, got $neg")
  }

  test("trainQuality: envelope flags hold and split counts partition the corpus") {
    val docs = Tables.load(spark, sf(), "documents")
    val row = QualityClassifier.trainQuality(docs, "doc_id", "text")
      .collect().head
    val Seq(ntp, ntn, nvp, nvn) = (0 to 3).map(row.getLong)
    assert(ntp + ntn + nvp + nvn == docs.count(),
      "split counts must partition the corpus")
    assert(ntp > 0 && ntn > 0, "both classes must appear in training")
    for (i <- 4 to 7)
      assert(row.getLong(i) == 1L, s"fit flag ${row.schema(i).name} failed")
  }

  test("trainQuality: degenerate corpora fail loudly, not as flag drift") {
    import spark.implicits._
    // single-class weak labels (every doc long + fluent): LR would
    // short-circuit and the envelope would mismatch its oracle with no
    // actionable signal — the guard names the defect instead
    val goodText = (Seq.fill(10)("the") ++ (1 to 50).map(i => s"tok$i"))
      .mkString(" ")
    val oneClass = (1L to 40L).map(i => (i, goodText)).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](
      QualityClassifier.trainQuality(oneClass, "doc_id", "text"))
    assert(e1.getMessage.contains("BOTH weak-label classes"))
    // empty validation split: both classes present but every doc's
    // deterministic draw lands in train (ids picked by replaying the
    // split's own u) — NaN metrics would flip a flag
    val trainIds = spark.range(1L, 200L)
      .select(col("id"),
        graft.learn.DetRandom.uniform(col("id"), col("id"), 42L).as("u"))
      .filter(col("u") >= 0.15).limit(2)
      .collect().map(_.getLong(0))
    val tiny = Seq((trainIds(0), goodText), (trainIds(1), "x"))
      .toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException](
      QualityClassifier.trainQuality(tiny, "doc_id", "text"))
    assert(e2.getMessage.contains("validation split is empty"))
  }
}
