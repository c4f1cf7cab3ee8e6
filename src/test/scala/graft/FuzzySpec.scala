package graft

import graft.ext.Fuzzy
import org.apache.spark.sql.DataFrame

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  /** Classical Levenshtein DP — the ground truth the candidates must
    * reproduce under the ≤1 cut. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naive(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb).toLong)).toSet

  private def run(df: DataFrame): Set[(Long, Long, Long)] =
    Fuzzy.editOnePairs(df, "id", "s")
      .as[(Long, Long, Long)].collect().toSet

  test("hand-checked neighbourhood: substitution, insert, delete, distance-2 excluded") {
    val rows = Seq(1L -> "graft", 2L -> "craft", // substitution
      3L -> "grafts",                            // insert
      4L -> "raft",                              // delete (of g/c — pairs with BOTH)
      5L -> "grift",                             // substitution vs graft
      6L -> "xyzzy")                             // far from everything
    val got = run(rows.toDF("id", "s"))
    assert(got === naive(rows))
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)) &&
      got.contains((1L, 4L, 1L)) && got.contains((1L, 5L, 1L)) &&
      got.contains((2L, 4L, 1L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
    // craft→grafts is distance 2 (substitute + insert): candidate
    // neighbourhoods overlap via "rafts"? no — the verify must kill it
    assert(!got.exists { case (a, b, _) => (a, b) == (2L, 3L) })
  }

  test("identical strings under distinct ids pair at distance 0") {
    val got = run(Seq(1L -> "same", 2L -> "same", 3L -> "sane").toDF("id", "s"))
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("random corpus: candidates are COMPLETE vs brute-force, partition-independent") {
    val rnd = new scala.util.Random(41)
    val alpha = "ab"
    // short strings over a 2-letter alphabet make distance-1 pairs dense
    val rows = (1L to 80L).map(i =>
      i -> Seq.fill(2 + rnd.nextInt(4))(alpha(rnd.nextInt(2))).mkString)
    val want = naive(rows)
    val a = run(rows.toDF("id", "s").repartition(7))
    val b = run(rows.toDF("id", "s").coalesce(1))
    assert(a === b)
    assert(a === want)
  }
}
