package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 maintenance: build validity-interval
  * history from a version stream, and MERGE a later change batch into an
  * existing history without rebuilding it — the batch CDC-apply path of
  * the warehouse's dimension tables (the streaming twin of what
  * [[graft.streaming.IncrementalAgg]] does for aggregates).
  *
  * Interval convention (same as the scored `q_scd2`): one row per
  * version, `[valid_from, valid_to)` with a NULL-open current row,
  * `version` = 1-based rank, `is_current` = open-ended.
  */
object Scd2 {

  /** SCD2 history from a version stream: one shuffle on the entity key,
    * a lead window for interval ends, a rank for version numbers.
    * `tsCol`/`tieCol` order versions (the tie key makes the ordering —
    * and therefore the history — deterministic under same-ts versions).
    */
  def build(versions: DataFrame, entityCol: String = "user_id",
            tieCol: String = "event_id", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    versions.select(col(entityCol), col(tieCol),
      col(tsCol).as("valid_from"),
      lead(col(tsCol), 1).over(w).as("valid_to"),
      row_number().over(w).cast("long").as("version"),
      lead(col(tsCol), 1).over(w).isNull.as("is_current"))
  }

  /** Merge a change batch into an existing SCD2 history. Exactly
    * equivalent to rebuilding over (old versions ∪ batch) — the parity
    * the scored `q_scd2_merge` proves by hash against a full-rebuild
    * oracle — but the work touches ONLY entities present in the batch:
    *
    *   - untouched entities pass through an anti join (the batch's
    *     entity set is batch-sized — broadcastable — so the pass-through
    *     is map-side; the dimension never re-shuffles for them);
    *   - touched entities re-window over their own versions only
    *     (reconstructed from the dimension rows themselves — `valid_from`
    *     IS the version timestamp — unioned with the batch), so their
    *     open rows close and version numbers continue correctly.
    *
    * O(batch + touched-entity history) per apply, never O(dimension).
    * The batch must carry `(entityCol, tieCol, tsCol)`.
    */
  def applyCdc(dim: DataFrame, batch: DataFrame,
               entityCol: String = "user_id", tieCol: String = "event_id",
               tsCol: String = "ts"): DataFrame = {
    val touched = batch.select(col(entityCol)).distinct()
    val untouched = dim.join(broadcast(touched), Seq(entityCol), "left_anti")
    val oldVersions = dim.join(broadcast(touched), Seq(entityCol), "left_semi")
      .select(col(entityCol), col(tieCol), col("valid_from").as(tsCol))
    val allVersions = oldVersions
      .unionByName(batch.select(col(entityCol), col(tieCol), col(tsCol)))
    untouched.unionByName(build(allVersions, entityCol, tieCol, tsCol))
  }
}
