package graft

import graft.ext.Projection
import graft.learn.DetRandom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("mixLong ≡ the Column mix ≡ the SQL text, incl. negative inputs") {
    val pairs = for (a <- Seq(-7L, -1L, 0L, 1L, 42L, 1000000006L);
                     b <- Seq(-3L, 0L, 5L, 999999999L)) yield (a, b)
    val df = pairs.toDF("a", "b")
    val viaCol = df.select(DetRandom.mix(col("a"), col("b"), 77L))
      .collect().map(_.getLong(0)).toSeq
    val viaSql = df.selectExpr(DetRandom.mixSql("a", "b", 77L))
      .collect().map(_.getLong(0)).toSeq
    val viaLong = pairs.map { case (a, b) => DetRandom.mixLong(a, b, 77L) }
    assert(viaCol === viaLong)
    assert(viaSql === viaLong)
  }

  test("sign matrix: ±1 entries, deterministic, seed-sensitive") {
    val s1 = Projection.signMatrix(16, 4, 77L)
    assert(s1.flatten.forall(s => s == 1L || s == -1L))
    assert(s1 === Projection.signMatrix(16, 4, 77L))
    assert(s1 !== Projection.signMatrix(16, 4, 78L))
    // both signs occur — a constant matrix would make the JL claim vacuous
    assert(s1.flatten.toSet === Set(1L, -1L))
  }

  private def naive(
      vecs: Seq[(Long, Seq[Float])], dims: Int, outDims: Int,
      seed: Long): Map[(Long, Long), Long] = {
    val signs = Projection.signMatrix(dims, outDims, seed)
    vecs.flatMap { case (id, v) =>
      val w = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      (0 until outDims).map(j =>
        (id, j.toLong) -> w.zip(signs(j)).map { case (x, s) => x * s }.sum)
    }.toMap
  }

  private def run(df: DataFrame, dims: Int): Map[(Long, Long), Long] =
    Projection.project(df, "vec_id", "embedding", dims, 4, 77L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("projection ≡ naive over random vectors, partition-independent") {
    val rnd = new scala.util.Random(53)
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
    val want = naive(vecs, 16, 4, 77L)
    val a = run(vecs.toDF("vec_id", "embedding").repartition(7), 16)
    assert(a === run(vecs.toDF("vec_id", "embedding").coalesce(1), 16))
    assert(a === want)
  }
}
