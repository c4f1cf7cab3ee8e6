package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII handling for training-data pipelines: pseudonymization, redaction,
  * and generalization as pure column expressions.
  *
  * All three are deterministic row-local transforms — no shuffle, fully
  * codegen'd, and each replays 1:1 in ANSI SQL (the q66 oracle), so at
  * 100 TB the cost is exactly one pass over the scan with the expressions
  * fused into whole-stage codegen.
  */
object Privacy {

  /** Keyed pseudonym: the first `hexChars` hex chars of SHA-256 over
    * `pepper + ":" + value`. Stable for equal inputs (joins on the
    * pseudonym still work), irreversible without the pepper, and — unlike
    * a plain hash — not dictionary-attackable on low-entropy identifiers
    * when the pepper is secret. 16 hex chars = 64 bits: collision risk
    * ~n²/2⁶⁵, negligible below ~10⁹ distinct subjects; raise toward 64
    * chars for larger identifier spaces. */
  def pseudonym(value: Column, pepper: String, hexChars: Int = 16): Column = {
    require(hexChars >= 1 && hexChars <= 64, s"hexChars out of range: $hexChars")
    substring(sha2(concat(lit(pepper + ":"), value), 256), 1, hexChars)
  }

  /** Redact digit runs of length ≥ `minRun` with `token` — the cheap
    * regex tier of PII scrubbing (account numbers, phone digits, IDs).
    * Runs shorter than `minRun` (house numbers, quantities) survive. */
  def redactDigits(value: Column, minRun: Int, token: String = "<NUM>"): Column =
    regexp_replace(value, s"[0-9]{$minRun,}", token)

  /** How many digit runs [[redactDigits]] would replace — the audit
    * column a redaction pass should always emit alongside the clean
    * text. */
  def countDigitRuns(value: Column, minRun: Int): Column =
    size(regexp_extract_all(value, lit(s"[0-9]{$minRun,}"), lit(0))).cast("long")

  /** Generalize a 2-decimal money value into `widthUnits`-wide buckets,
    * returning the bucket's lower bound in whole units (k-anonymity-style
    * coarsening for quasi-identifiers). Exact: the value is moved to a
    * rounded integer cents image, shifted non-negative so truncating and
    * floor division agree in every engine, and bucketed in integer
    * arithmetic. Supports |value| up to 10⁷ units. */
  def moneyBucketLo(value: Column, widthUnits: Int): Column = {
    require(widthUnits > 0, s"widthUnits must be positive: $widthUnits")
    val offCents = 1000000000L // 10^9 cents = 10^7 units, multiple of any width*100
    require(offCents % (widthUnits * 100L) == 0,
      s"widthUnits $widthUnits must divide the 10^9-cent shift")
    val cents = round(value * 100).cast("long")
    // integral throughout: Column./ is double division, so subtract the
    // pmod remainder instead (bucket start in cents is then an exact
    // multiple of 100, and its /100 is an exact small integer)
    val shifted = cents + lit(offCents)
    val bucketStartCents = shifted - pmod(shifted, lit(widthUnits * 100L))
    (bucketStartCents / lit(100L)).cast("long") - lit(offCents / 100L)
  }
}
