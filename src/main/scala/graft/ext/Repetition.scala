package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style n-gram REPETITION coverage (Rae et al. 2021, "Scaling
  * language models: … Gopher", table A1; carried into Dolma and
  * RedPajama-v2 as standard quality signals): per document,
  *
  *   - for n = 2..4, the fraction of characters covered by occurrences
  *     of the single MOST FREQUENT n-gram (`top{n}_ppm`);
  *   - for n = 5..10, the fraction of characters covered by ALL n-grams
  *     that occur more than once (`dup{n}_ppm`).
  *
  * This is the published boilerplate gate the heuristic q62 rule
  * approximates: q62 counts repeated trigram INSTANCES; these metrics
  * measure how much of the document's actual text sits inside repeated
  * spans. NOTE the metric here is a positional-UNION variant of the
  * published definition: Gopher/Dolma/DataTrove compute top-n coverage
  * as count × gram-chars over WHOLE-document characters (whitespace
  * included), which double-counts overlapping occurrences and uses a
  * larger denominator — so the published thresholds (0.18 for top-2 …
  * 0.10 for dup-10) transfer only approximately, and a gate built on
  * these columns should be recalibrated against this variant's
  * distribution. The union form is the deliberate choice: it is a true
  * coverage (never exceeds 1) and both engines replay it exactly.
  *
  * Exactness contract (what makes the DuckDB oracle replay bit-for-bit):
  *   - tokens are the house `[a-z0-9]+` extraction; the character basis
  *     is TOKEN characters (whitespace excluded), so the denominator is
  *     `Σ len(token)` — byte-identical in both engines;
  *   - coverage is the POSITIONAL UNION of occurrence ranges
  *     (overlapping occurrences — "a a a" under n=2 — count each token
  *     position once), not count×length, so a ppm can never exceed 10⁶;
  *   - the top gram tie-breaks deterministically: highest count, then
  *     lexicographically smallest gram (`min(struct(-c, g))` here,
  *     `ORDER BY c DESC, g` in the oracle);
  *   - ratios are exact integer ppm (`(chars · 10⁶) div total`).
  *
  * Scale shape: ONE tokenise pass; one row-local nested-HOF explode
  * emits every (n, position, gram) occurrence (~9·L rows for L tokens —
  * constant factor, row-local); then two exchanges on (doc, n, gram)
  * (count + selection join back to occurrences), one (doc, position)
  * distinct, and one per-doc aggregate — every key doc-scoped, so the
  * plan partitions with the corpus and nothing is quadratic. The pivot
  * is over the 9 FIXED n values (schema-constant, not data-driven). */
object Repetition {

  def ngramCoverage(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // repartition on the id BEFORE tokenising (the q67/q125 lesson): a
    // small corpus is ONE scan partition, and the tokenise + 9-size
    // nested-HOF gram explode below would otherwise run in one task;
    // doc_id hashing is the distribution every downstream doc-keyed
    // exchange wants anyway
    val toks = docs
      .repartition(
        docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).cast("long").as("doc_id"),
        regexp_extract_all(col(textCol), lit("[a-z0-9]+"), lit(0)).as("w"))
      .withColumn("n_chars",
        expr("aggregate(w, 0L, (a, x) -> a + length(x))"))
      .localCheckpoint(eager = true) // one tokenise pass, read 3×
    val base = toks.select(col("doc_id"), col("n_chars"))
    // per-position token char lengths (the character basis)
    val pos = toks
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"),
        length(col("tok")).cast("long").as("tl"))
    // every n-gram occurrence for n = 2..10 in one row-local explode:
    // (n, start position i, gram text)
    val occ = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """flatten(transform(sequence(2, least(10, size(w))), n ->
          |  transform(sequence(1, size(w) - n + 1),
          |    i -> struct(n AS n, i AS i,
          |      concat_ws(' ', slice(w, i, n)) AS g))))""".stripMargin))
        .as("o"))
      .select(col("doc_id"), col("o.n").as("n"), col("o.i").as("i"),
        col("o.g").as("g"))
      .localCheckpoint(eager = true) // read twice: counts + coverage join
    val counted = occ.groupBy("doc_id", "n", "g")
      .agg(count(lit(1)).as("c"))
    // the selected grams per (doc, n): the single top gram for n ≤ 4,
    // every gram with c ≥ 2 for n ≥ 5
    val top = counted.filter(col("n") <= 4)
      .groupBy("doc_id", "n")
      .agg(min(struct((-col("c")).as("nc"), col("g"))).as("t"))
      .select(col("doc_id"), col("n"), col("t.g").as("g"))
    val dup = counted.filter(col("n") >= 5 && col("c") >= 2)
      .select("doc_id", "n", "g")
    // positional union of the selected grams' occurrence ranges
    val covered = occ.join(top.unionByName(dup), Seq("doc_id", "n", "g"))
      .select(col("doc_id"), col("n"),
        explode(expr("sequence(i, i + n - 1)")).as("p"))
      .distinct()
    val ppm = covered.join(pos, Seq("doc_id", "p"))
      .groupBy("doc_id", "n").agg(sum("tl").as("cc"))
      .join(base, Seq("doc_id"))
      .select(col("doc_id"), col("n"),
        expr("(cc * 1000000) div n_chars").as("v"))
    val names = (2 to 10).map(n =>
      if (n <= 4) n.toString -> s"top${n}_ppm" else n.toString -> s"dup${n}_ppm")
    base.join(
        ppm.groupBy("doc_id").pivot("n", (2 to 10).map(_.toString)).sum("v"),
        Seq("doc_id"), "left")
      .select(col("doc_id") +: col("n_chars") +: names.map { case (n, a) =>
        coalesce(col(s"`$n`"), lit(0L)).as(a) }: _*)
  }
}
