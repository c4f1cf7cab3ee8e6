package graft

import graft.ext.{Dedup, Filters}
import org.apache.spark.sql.functions._

/** Gopher table-A1 composite quality gate (ext/Filters.scala): naive
  * per-document recomputation, genuine discrimination, zero-exchange
  * plan. */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("gopherGate: equals a naive recomputation and discriminates") {
    val fixture = Tables.load(spark, sf(), "documents")
    val got = Filters.gopherGate(fixture, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (1 to 9).map(r.getLong).toVector)
      .toMap

    val rows = fixture
      .select($"doc_id", lower($"text").as("lt"), Dedup.tokens($"text").as("ts"))
      .collect().map { r =>
        val lt = r.getString(1)
        val ts = r.getSeq[String](2)
        val n = ts.length.toLong
        val mtl = if (n == 0) 0L else ts.map(_.length.toLong).sum * 1000000L / n
        val alpha = if (lt.isEmpty) 0L
          else lt.count(c => c >= 'a' && c <= 'z').toLong * 1000000L / lt.length
        val stop = Set("the", "a", "of", "and", "to", "in", "is")
        val nStop = ts.distinct.count(stop).toLong
        val fN = if (n >= 50 && n <= 100000) 1L else 0L
        val fM = if (mtl >= 3000000L && mtl <= 10000000L) 1L else 0L
        val fA = if (alpha >= 600000L) 1L else 0L
        val fS = if (nStop >= 2) 1L else 0L
        r.getLong(0) -> Vector(n, mtl, alpha, nStop, fN, fM, fA, fS,
          fN * fM * fA * fS)
      }.toMap
    assert(got === rows)
    val keeps = got.values.map(_.last).toSet
    assert(keeps == Set(0L, 1L),
      "the gate must both admit and reject on the fixture")
  }

  test("gopherGate: zero exchanges — the gate is the scan") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.initialPlan)
        case _ => Seq(p) ++ p.children.flatMap(nodes)
      }
      self ++ p.subqueries.flatMap(nodes)
    }
    val plan = Filters.gopherGate(
        Tables.load(spark, sf(), "documents"), "doc_id", "text")
      .queryExecution.executedPlan
    assert(!nodes(plan).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "gopherGate must be row-local (no exchange)")
  }

  test("gopherFull: verdict decomposes into its 13 flags, agrees with " +
      "the component operators, and the repetition side is live") {
    val fixture = Tables.load(spark, sf(), "documents")
    val full = Filters.gopherFull(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap

    // flags recompute from their own signal columns, keep is their product
    val flagOf = Map(
      "f_ntok" -> ((r: org.apache.spark.sql.Row) => {
        val v = r.getLong(r.fieldIndex("n_tok")); v >= 50L && v <= 100000L }),
      "f_mtl" -> ((r: org.apache.spark.sql.Row) => {
        val v = r.getLong(r.fieldIndex("mtl_ppm"))
        v >= 3000000L && v <= 10000000L }),
      "f_alpha" -> ((r: org.apache.spark.sql.Row) =>
        r.getLong(r.fieldIndex("alpha_ppm")) >= 600000L),
      "f_stop" -> ((r: org.apache.spark.sql.Row) =>
        r.getLong(r.fieldIndex("n_stop")) >= 2L)) ++
      Filters.RepetitionCuts.map { case (c, cut) =>
        ("f_" + c.stripSuffix("_ppm")) ->
          ((r: org.apache.spark.sql.Row) => r.getLong(r.fieldIndex(c)) <= cut)
      }
    full.values.foreach { r =>
      var prod = 1L
      flagOf.foreach { case (f, pred) =>
        val got = r.getLong(r.fieldIndex(f))
        assert(got == (if (pred(r)) 1L else 0L), s"$f mismatch")
        prod *= got
      }
      assert(r.getLong(r.fieldIndex("keep")) == prod, "keep != flag product")
    }

    // agreement with the component operators on shared columns
    val gate = Filters.gopherGate(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        Seq("n_tok", "mtl_ppm", "alpha_ppm", "n_stop", "f_ntok", "f_mtl",
          "f_alpha", "f_stop").map(c => r.getLong(r.fieldIndex(c)))).toMap
    val rep = graft.ext.Repetition.ngramCoverage(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        Filters.RepetitionCuts.map(c => r.getLong(r.fieldIndex(c._1)))).toMap
    assert(full.keySet == gate.keySet && full.keySet == rep.keySet)
    full.foreach { case (id, r) =>
      assert(gate(id) == Seq("n_tok", "mtl_ppm", "alpha_ppm", "n_stop",
        "f_ntok", "f_mtl", "f_alpha", "f_stop")
        .map(c => r.getLong(r.fieldIndex(c))))
      assert(rep(id) ==
        Filters.RepetitionCuts.map(c => r.getLong(r.fieldIndex(c._1))))
    }

    // the composite is not the structural gate in disguise: some doc
    // must fail a repetition cut while passing all structural rules
    // (the calibration places top-2/3/4 at ~p95 of this corpus)
    val repOnly = full.values.count { r =>
      Seq("f_ntok", "f_mtl", "f_alpha", "f_stop")
        .forall(c => r.getLong(r.fieldIndex(c)) == 1L) &&
      Filters.RepetitionCuts
        .exists(c => r.getLong(r.fieldIndex("f_" + c._1.stripSuffix("_ppm"))) == 0L)
    }
    assert(repOnly > 0, "repetition cuts never fire on structural passers")
  }

  test("gopherFull on the boilerplate leg: every dup flag takes both " +
      "values and some structural+top passer fails on dup alone — " +
      "all 13 flags non-vacuous across the q153+q166 surface") {
    // the q166 corpus: the doc_id % 5 = 0 slice, the % 10 = 0 half
    // carrying SparkEntry.Boilerplate appended twice (every 5..10-gram
    // of the block occurs exactly twice), the % 10 = 5 half original
    val aug = Tables.load(spark, sf(), "documents")
      .filter(pmod($"doc_id", lit(5)) === 0)
      .select($"doc_id",
        when(pmod($"doc_id", lit(10)) === 0,
          concat($"text", lit(SparkEntry.Boilerplate),
            lit(SparkEntry.Boilerplate))).otherwise($"text").as("text"))
    val rows = Filters.gopherFull(aug, "doc_id", "text").collect()
    val dupFlags = Filters.RepetitionCuts.map(_._1)
      .filter(_.startsWith("dup")).map(c => "f_" + c.stripSuffix("_ppm"))
    dupFlags.foreach { f =>
      val vals = rows.map(r => r.getLong(r.fieldIndex(f))).toSet
      assert(vals == Set(0L, 1L), s"$f must fire AND pass on this leg")
    }
    // rep-only-fail: the doc the dup rules exist to reject — admitted
    // by every structural and top-gram rule, rejected by a dup rule
    val structTop = Seq("f_ntok", "f_mtl", "f_alpha", "f_stop",
      "f_top2", "f_top3", "f_top4")
    val repOnlyFail = rows.count { r =>
      structTop.forall(c => r.getLong(r.fieldIndex(c)) == 1L) &&
        dupFlags.exists(c => r.getLong(r.fieldIndex(c)) == 0L)
    }
    assert(repOnlyFail > 0,
      "no structural+top passer fails on a dup flag alone")
    // the un-augmented half must be untouched by the leg: original
    // docs carry no duplicated 5..10-gram, so every dup flag passes
    rows.filter(r => r.getLong(r.fieldIndex("doc_id")) % 10L == 5L)
      .foreach { r =>
        dupFlags.foreach(f => assert(r.getLong(r.fieldIndex(f)) == 1L,
          s"$f fired on an un-augmented doc"))
      }
  }
}
