package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release helper for `localCheckpoint`ed DataFrames.
  *
  * Why this exists: `Dataset.unpersist` only consults the session's
  * `CacheManager`, but `localCheckpoint` pins its blocks at the RDD
  * level (the checkpointed `RDD[InternalRow]` inside the resulting
  * `LogicalRDD` leaf) — so `df.unpersist()` on a checkpointed frame is
  * a silent no-op and the blocks live until the session dies. The same
  * asymmetry means `spark.catalog.clearCache()` does NOT release
  * checkpoint blocks either; sweep `sc.getPersistentRDDs` for that.
  *
  * `release(df)` walks the analyzed plan's `LogicalRDD` leaves and
  * unpersists their backing RDDs directly. Call it ONLY once every
  * consumer of `df` has materialized: a localCheckpoint truncates
  * lineage, so a released checkpoint cannot be recomputed — any later
  * job that still references it fails with missing blocks.
  */
private[graft] object Checkpoints {
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking))
}
