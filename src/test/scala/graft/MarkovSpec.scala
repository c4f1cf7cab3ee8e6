package graft

import graft.ext.Markov
import org.apache.spark.sql.DataFrame

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  /** Naive transition matrix: per-key (order, tie) sort, adjacent pairs,
    * scaled row normalisation. */
  private def naive(
      rows: Seq[(Long, Long, Long, String)]
  ): Map[(String, String), (Long, Long)] = {
    val trans = rows.groupBy(_._1).values.toSeq.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }
    val c = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    c.map { case ((a, b), n) => (a, b) -> (n, n * 1000000L / tot(a)) }
  }

  private def run(df: DataFrame) =
    Markov.transitions(df, "k", "o", "tie", "ty").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap

  test("transitions: hand-checked chain with a tie broken by the tie column") {
    // user 1: a,b,a,b (two a→b, one b→a); user 2 has ts tie at 5:
    // tie column orders c(tie=1) before d(tie=2) → c→d
    val rows: Seq[(Long, Long, Long, String)] = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"), (1L, 4L, 4L, "b"),
      (2L, 5L, 2L, "d"), (2L, 5L, 1L, "c"))
    val got = run(rows.toDF("k", "o", "tie", "ty"))
    assert(got === naive(rows))
    assert(got(("a", "b")) === ((2L, 1000000L)))
    assert(got(("b", "a")) === ((1L, 1000000L)))
    assert(got(("c", "d")) === ((1L, 1000000L)))
    assert(!got.contains(("d", "c")))
  }

  test("transitions: random sequences ≡ naive, probabilities row-sum ≲ scale") {
    val rnd = new scala.util.Random(29)
    val types = Vector("v", "w", "x", "y", "z")
    val rows = Seq.tabulate(600)(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(50).toLong, i.toLong, types(rnd.nextInt(5))))
    val want = naive(rows)
    val a = run(rows.toDF("k", "o", "tie", "ty").repartition(7))
    assert(a === run(rows.toDF("k", "o", "tie", "ty").coalesce(1)))
    assert(a === want)
    // floored division: each row of the matrix sums to (scale − residue)
    a.groupBy(_._1._1).foreach { case (_, m) =>
      val s = m.values.map(_._2).sum
      assert(s <= 1000000L && s > 1000000L - m.size)
    }
  }
}
