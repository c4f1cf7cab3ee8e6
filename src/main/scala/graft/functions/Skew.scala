package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §7.5: "skewed keys → salting or AQE
  * skew-join"). AQE's skew-join split covers sort-merge joins out of the
  * box; these cover the two cases AQE does not re-plan:
  *
  *  - a heavily-skewed AGGREGATION key (one giant group serialises into
  *    one task): [[saltedAgg]] spreads each group over `salt` subtasks
  *    with a two-level aggregate — correct for any decomposable aggregate
  *    (sum/count/min/max);
  *  - a skewed broadcast-side lookup is already fine (no shuffle); a
  *    skewed SHUFFLE join key with a small dimension is best handled by
  *    [[replicatedJoin]]: replicate the dimension `salt` ways and salt the
  *    fact side, keeping all salt buckets of one key off a single task.
  */
object Skew {

  /** Deterministic salt in [0, salt) derived from the whole row via a
    * stable hash of `entropy` columns (NOT rand(): partition-independent,
    * reproducible). */
  def saltCol(salt: Int, entropy: Column*): Column =
    pmod(xxhash64(entropy: _*), lit(salt.toLong)).cast("int")

  /** Two-level salted sum/count aggregation:
    * `df.groupBy(key).agg(sum(v), count(*))` re-expressed so each group is
    * first reduced within `salt` buckets, then the (tiny) per-bucket
    * partials combine. Output: (key, sum_<v>, cnt).
    *
    * Float caveat: the two-level reduction reassociates double addition,
    * so sums differ from the plain aggregate in the last ulps — hash-exact
    * pipelines must aggregate decimals/integers through this (the engine's
    * DECIMAL(18,2) money policy is immune).
    */
  def saltedAgg(
      df: DataFrame, key: String, valueCol: String, salt: Int,
      entropy: Seq[String]): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(salt, entropy.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
    partial
      .groupBy(col(key))
      .agg(sum(col("__s")).as(s"sum_$valueCol"), sum(col("__c")).as("cnt"))
  }

  /** Salted fact-to-dimension equi-join: the dimension (small) is
    * replicated `salt` times, the fact side gets a deterministic salt, and
    * the join key becomes (key, salt) — one hot key now lands on `salt`
    * tasks. Prefer `broadcast(dim)` when the dimension fits; this is for
    * the middle regime where it does not but the fact key is skewed. */
  def replicatedJoin(
      fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      factEntropy: Seq[String]): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      saltCol(salt, factEntropy.map(col): _*))
    val dimReplicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    saltedFact.join(dimReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
