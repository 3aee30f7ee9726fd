package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent caching: `cached(df)` pins the plan only when no equivalent
  * plan is already in the session's cache manager, otherwise it returns
  * the frame untouched and lets the existing materialized blocks serve it.
  *
  * Why this exists: a re-executed query (benchmark repeat runs, retried
  * jobs, a pipeline invoked twice in one session) rebuilds the same
  * logical plan and calls `.cache()` again; Spark then keeps the first
  * entry but logs `CacheManager: Asked to cache already cached data` per
  * call. The lookup `df.storageLevel` consults the same plan-normalized
  * cache index the warning path does, so this guard is exactly the no-op
  * re-registration, minus the noise. Cache LIFETIME stays caller-managed
  * (see [[Dedup.prefixFilterJoin]] / [[Graph.pageRankPpm]] docs).
  */
private[graft] object Caching {
  def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df
}
