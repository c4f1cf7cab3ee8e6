package graft

import graft.functions.ArrayOps
import org.apache.spark.sql.functions._

class ArrayOpsSpec extends SparkSpec {

  test("fused CosineSimilarity matches the composed formulation exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)),   // zero vector -> 0
      (Array(-1.5, 2.5, 0.25), Array(2.0, 4.0, -8.0)),
      (Array(1e-7, 2e7, 3.3), Array(4.4, -5e-6, 6.6))
    ).toDF("a", "b")
    val rows = df.select(
      graft.functions.ArrayOps.cosine(col("a"), col("b")).as("fused"),
      graft.functions.ArrayOps.cosineComposed(col("a"), col("b")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("codegen DotProduct matches the HOF reference formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0)),
      (Array(-1.5, 2.5), Array(2.0, 4.0))
    ).toDF("a", "b")
    val rows = df.select(
      graft.functions.ArrayOps.dot(col("a"), col("b")).as("fast"),
      graft.functions.ArrayOps.dotHof(col("a"), col("b")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // float arrays go through the implicit cast
    val f = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(graft.functions.ArrayOps.dot(col("a"), col("b")))
      .head().getDouble(0)
    assert(f == 11.0)
    // null input -> null
    val n = Seq((Option.empty[Array[Double]], Some(Array(1.0))))
      .toDF("a", "b")
      .select(graft.functions.ArrayOps.dot(col("a"), col("b")))
      .head()
    assert(n.isNullAt(0))
  }

  test("codegen VecCombine matches the HOF zip_with reference formulation") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0), 2L),
      (Array(0.0, -0.5), Array(1.0, 1.0), 1L),
      (Array(-1.5, 2.5, 0.25, 7.0), Array(2.0, 4.0, -8.0, 0.125), 3L),
      (Array(1e-7, 2e7), Array(4.4, -5e-6), 0L)
    ).toDF("a", "b", "n")
    val rows = df.select(
      ArrayOps.combineMean(col("a"), col("b"), col("n")).as("fast"),
      ArrayOps.combineMeanHof(col("a"), col("b"), col("n")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1)) // bit-identical
    }
    // null top-level input -> null, like the HOF form
    val n = Seq((Option.empty[Array[Double]], Some(Array(1.0)), 1L))
      .toDF("a", "b", "n")
      .select(ArrayOps.combineMean(col("a"), col("b"), col("n")))
      .head()
    assert(n.isNullAt(0))
  }

  test("codegen Hadamard matches the HOF zip_with reference formulation") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, -0.5), Array(1.0, 1.0)),
      (Array(1e-7, 2e7, -3.25), Array(4.4, -5e-6, 0.125))
    ).toDF("a", "b")
    val rows = df.select(
      ArrayOps.hadamard(col("a"), col("b")).as("fast"),
      ArrayOps.hadamardHof(col("a"), col("b")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1)) // bit-identical
    }
  }

  test("Hadamard and VecCombine fail loudly on array length mismatch") {
    import spark.implicits._
    // these sit on the public training/serving path: a width bug upstream
    // must surface as an error, not silently truncate (the old behavior)
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    val mism = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0), 1L)).toDF("a", "b", "n")
    val eH = intercept[Throwable] {
      mism.select(ArrayOps.hadamard(col("a"), col("b"))).collect()
    }
    assert(msgChain(eH).contains("length mismatch"))
    val eC = intercept[Throwable] {
      mism.select(ArrayOps.combineMean(col("a"), col("b"), col("n"))).collect()
    }
    assert(msgChain(eC).contains("length mismatch"))
  }

  private def one(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 0.5f, -1.0f)))
      .toDF("a", "b").select(c.cast("double")).head().getDouble(0)
  }

  test("dot") { assert(math.abs(one(ArrayOps.dot(col("a"), col("b"))) - 2.0) < 1e-9) }

  test("cosine bounds and zero-vector guard") {
    import spark.implicits._
    val d = Seq((Array(1.0f, 0.0f), Array(0.0f, 0.0f))).toDF("a", "b")
      .select(ArrayOps.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(d === 0.0)
    val same = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(ArrayOps.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(same - 1.0) < 1e-9)
  }

  test("sigmoid at 0 is 0.5") {
    import spark.implicits._
    val v = Seq(0.0).toDF("x").select(ArrayOps.sigmoid(col("x"))).head().getDouble(0)
    assert(v === 0.5)
  }

  test("vecSumAgg sums elementwise per group, skips nulls") {
    import spark.implicits._
    val df = Seq(
      (1, Array(1.0, 2.0)), (1, Array(3.0, 4.0)), (2, Array(5.0, 6.0)))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(ArrayOps.vecSumAgg(col("v")).as("s"))
      .orderBy("k").collect()
    assert(out(0).getSeq[Double](1) === Seq(4.0, 6.0))
    assert(out(1).getSeq[Double](1) === Seq(5.0, 6.0))
  }
}
