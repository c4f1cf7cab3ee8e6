package graft

import graft.ext.Quantize
import org.apache.spark.sql.DataFrame

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-threaded replay of the sign-folded int8 codec. */
  private def naive(
      vecs: Seq[(Long, Seq[Float])]): Map[(Long, Long), (Long, Long, Long)] =
    vecs.flatMap { case (id, v) =>
      val w = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      val amax = math.max(w.map(math.abs).foldLeft(0L)(math.max), 1L)
      w.zipWithIndex.map { case (x, i) =>
        val q = if (x < 0) -((-x) * 127L / amax) else x * 127L / amax
        val rec = if (q < 0) -((-q) * amax / 127L) else q * amax / 127L
        (id, i.toLong) -> (q, amax, math.abs(x - rec))
      }
    }.toMap

  private def run(df: DataFrame): Map[(Long, Long), (Long, Long, Long)] =
    Quantize.int8Rows(df, "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("hand-checked codes, sign handling, exact-representable zero error") {
    val vecs = Seq((1L, Seq(0.5f, -0.25f, 0.0f)))
    val got = run(vecs.toDF("vec_id", "embedding"))
    // w = [500000, -250000, 0], amax = 500000
    assert(got((1L, 0L)) === ((127L, 500000L, 0L))) // the max element is exact
    // -250000·127/500000 = -63 (floor of 63.5 before the sign);
    // reconstruction 63·500000/127 = 248031 → err 1969
    assert(got((1L, 1L)) === ((-63L, 500000L, 1969L)))
    assert(got((1L, 2L)) === ((0L, 500000L, 0L)))
    assert(got === naive(vecs))
  }

  test("all-zero vector quantizes to zeros (amax floor), codes stay in [-127,127]") {
    val vecs = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(-0.9999f, 0.0001f)))
    val got = run(vecs.toDF("vec_id", "embedding"))
    assert(got((1L, 0L)) === ((0L, 1L, 0L)))
    assert(got((1L, 1L)) === ((0L, 1L, 0L)))
    assert(got.values.forall { case (q, _, _) => q >= -127L && q <= 127L })
    assert(got === naive(vecs))
  }

  test("random vectors ≡ naive, partition-independent") {
    val rnd = new scala.util.Random(43)
    val vecs = (0L until 60L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
    val want = naive(vecs)
    val a = run(vecs.toDF("vec_id", "embedding").repartition(7))
    assert(a === run(vecs.toDF("vec_id", "embedding").coalesce(1)))
    assert(a === want)
  }
}
