package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-idempotence helper. `Dataset.cache()` on a plan that is already
  * in the session cache logs a `CacheManager` warning and builds a second
  * InMemoryRelation wrapper; with graph builds constructed per query (each
  * producing structurally-equal mapping plans), a bench run spams hundreds
  * of those warnings. `storageLevel` consults the shared CacheManager by
  * canonicalised plan, so this both silences the noise and makes repeated
  * builds REUSE the first build's cached mappings instead of re-registering
  * them. */
object Caching {
  /** Cache `df` unless its canonicalised plan is already cached. */
  def ensureCached(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) df.cache()
    df
  }
}
