package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view maintenance under
  * CDC): keep `SELECT group, count(*), sum(value)` true of the live
  * warehouse WITHOUT ever re-reading the base table — per micro-batch,
  * subtract the contribution of each row version the batch replaces or
  * deletes and add each new live row's, then merge the per-group delta
  * into the maintained table.
  *
  * Why it matters at scale: the naive refresh re-aggregates the full base
  * table every batch — O(100 TB) work to absorb a megabyte of changes.
  * Here per-batch work is O(batch) + a point-lookup of the batch's ids in
  * the bucketed state ([[StreamIngest]]'s layout makes that a
  * touched-buckets-only read), and the merge touches only the affected
  * groups of an agg table that is one row per group.
  *
  * Exactness: sums are maintained in scale-4 fixed-point longs (the
  * engine-wide `dsum` convention), so increments commute exactly —
  * a float running sum would drift from the recomputed truth under
  * add/subtract churn. Count-zero groups are dropped on merge, so the
  * maintained table never accumulates dead groups.
  *
  * Contract: `oldRows` = the CURRENT live versions of exactly the ids in
  * the batch (absent = insert); `newRows` = the batch's LWW-compacted live
  * rows (deletes excluded). Both are per-id unique — feed a raw
  * at-least-once feed through [[graft.ops.Compact]] first.
  *
  * Replay: unlike the LWW row merge, delta application is NOT naturally
  * idempotent — applying one batch's delta twice double-counts. Under
  * `foreachBatch`, persist the applied `batchId` atomically with the agg
  * table and skip batches already applied (the standard transactional
  * foreachBatch pattern; [[graft.sinks.JdbcUpsertSink.writeCheckpoint]]
  * shows the same write-after-data ordering for the row path).
  */
object IncrementalAgg {

  private def fp(c: Column): Column = round(c * 10000).cast("long")

  /** Per-group delta of one CDC batch: `(group, dn, dsum_fp)`. */
  def delta(oldRows: DataFrame, newRows: DataFrame,
            groupCol: String, valueCol: String): DataFrame = {
    val minus = oldRows.select(col(groupCol),
      lit(-1L).as("dn"), (-fp(col(valueCol))).as("dsum_fp"))
    val plus = newRows.select(col(groupCol),
      lit(1L).as("dn"), fp(col(valueCol)).as("dsum_fp"))
    minus.unionByName(plus)
      .groupBy(groupCol)
      .agg(sum("dn").as("dn"), sum("dsum_fp").as("dsum_fp"))
  }

  /** Merge a delta into the maintained table `(group, n, sum_fp)`.
    * Full-outer on the group key — new groups appear, emptied groups
    * leave; existing groups adjust in place. The join is agg-sized
    * (one row per group), never base-table-sized.
    */
  def merge(agg: DataFrame, d: DataFrame, groupCol: String): DataFrame =
    agg.join(d, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("sum_fp"), lit(0L)) + coalesce(col("dsum_fp"), lit(0L)))
          .as("sum_fp"))
      .where(col("n") > 0)

  /** An empty maintained table for `groupCol`'s type. */
  def empty(like: DataFrame, groupCol: String): DataFrame =
    like.select(col(groupCol), lit(0L).as("n"), lit(0L).as("sum_fp")).limit(0)

  /** Render the maintained table as the user-facing aggregate. */
  def finish(agg: DataFrame, groupCol: String): DataFrame =
    agg.select(col(groupCol), col("n"),
      (col("sum_fp") / 10000.0).as("total"))

  /** The ground-truth aggregate of a live-rows table — what the maintained
    * table must equal after any batch sequence (the spec's oracle, and the
    * one-off bootstrap for an existing warehouse).
    */
  def recompute(live: DataFrame, groupCol: String, valueCol: String): DataFrame =
    live.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(fp(col(valueCol))).as("sum_fp"))
}
