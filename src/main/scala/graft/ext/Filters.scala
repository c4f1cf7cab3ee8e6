package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite document-quality GATE — the Gopher table-A1 "quality
  * filtering" rule set (Rae et al. 2021, carried into Dolma, FineWeb and
  * RedPajama-v2 as the standard pre-training admission gate): a document
  * enters the corpus only if EVERY cheap structural signal passes. The
  * reference pipelines stack these exact rules in front of dedup; q57
  * (percentile band) and q75 (LM score) are RANKING filters — this is
  * the boolean conjunction gate that runs before either.
  *
  * Signals (all row-local, one tokenise pass, exact integers so the
  * DuckDB oracle replays bit-for-bit):
  *
  *   - `n_tok`   — `[a-z0-9]+` token count;
  *     `f_ntok = 1` iff 50 ≤ n_tok ≤ 100 000 (Gopher's word-count gate;
  *     the fixture corpus straddles the lower bound, so the flag
  *     genuinely discriminates)
  *   - `mtl_ppm` — mean token length, ppm (`Σ len(tok) × 10⁶ div n_tok`);
  *     `f_mtl = 1` iff 3·10⁶ ≤ mtl_ppm ≤ 10·10⁶ (mean word length
  *     between 3 and 10 characters)
  *   - `alpha_ppm` — alphabetic-character share of the raw text, ppm;
  *     `f_alpha = 1` iff ≥ 600 000 (the symbol-heavy-page gate; Gopher
  *     phrases it per-word, the character form is the house q31 signal)
  *   - `n_stop`  — how many DISTINCT stop words of the fixed 7-word list
  *     {the, a, of, and, to, in, is} appear;
  *     `f_stop = 1` iff ≥ 2 (Gopher's "≥ 2 stop words" rule)
  *   - `keep = f_ntok · f_mtl · f_alpha · f_stop`
  *
  * Scale shape: ZERO exchanges — every column is a row-local expression
  * over one pruned scan (project doc_id + text), codegen'd HOFs, no
  * join, no aggregate; the gate composes with any downstream shuffle
  * untouched. At 100 TB it IS the scan. */
object Filters {

  private val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")

  def gopherGate(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopList = StopWords.map(w => s"'$w'").mkString(", ")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        lower(col(textCol)).as("__t"),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
          .as("__ts"))
      .select(col("doc_id"),
        size(col("__ts")).cast("long").as("n_tok"),
        expr("""CASE WHEN size(__ts) = 0 THEN CAST(0 AS BIGINT)
          |ELSE aggregate(__ts, CAST(0 AS BIGINT), (a, x) -> a + length(x))
          |  * 1000000 div CAST(size(__ts) AS BIGINT) END""".stripMargin)
          .as("mtl_ppm"),
        expr("""CASE WHEN length(__t) = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST(length(regexp_replace(__t, '[^a-z]', '')) AS BIGINT)
          |  * 1000000 div CAST(length(__t) AS BIGINT) END""".stripMargin)
          .as("alpha_ppm"),
        expr(s"CAST(size(filter(array_distinct(__ts), x -> x IN ($stopList))) AS BIGINT)")
          .as("n_stop"))
      .withColumn("f_ntok",
        (col("n_tok") >= 50L && col("n_tok") <= 100000L).cast("long"))
      .withColumn("f_mtl",
        (col("mtl_ppm") >= 3000000L && col("mtl_ppm") <= 10000000L)
          .cast("long"))
      .withColumn("f_alpha", (col("alpha_ppm") >= 600000L).cast("long"))
      .withColumn("f_stop", (col("n_stop") >= 2L).cast("long"))
      .withColumn("keep",
        col("f_ntok") * col("f_mtl") * col("f_alpha") * col("f_stop"))
  }
}
