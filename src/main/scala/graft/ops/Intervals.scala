package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over per-key validity/activity ranges — the temporal
  * warehouse complement of [[Scd2]]'s versioned dimensions: SCD2 *builds*
  * non-overlapping history from point events, while real interval data
  * (session leases, maintenance windows, per-document availability
  * ranges, contract validity) arrives overlapping and fragmented and has
  * to be COALESCED before duration accounting or point-in-time joins mean
  * anything.
  */
object Intervals {

  /** Merge overlapping-or-touching `[start, end]` intervals per key into
    * maximal islands — the gaps-and-islands coalesce: an interval starts
    * a new island exactly when its start exceeds the running maximum end
    * of every earlier interval (ordered by `(start, end, tieCol)`; the
    * running max — not `lag(end)` — is what makes an interval fully
    * CONTAINED in an earlier one extend nothing). Bounds are treated
    * inclusively: `start == prior end` merges (use half-open inputs by
    * pre-decrementing `end` if touching must not merge).
    *
    * Returns one row per island: `(key, island, start, end, n_rows)`
    * with `island` numbering islands 1..k per key in time order.
    *
    * Scale shape: ONE shuffle on the key; both windows (running max,
    * island prefix-sum) ride that single per-key sort. Per-key row
    * counts bound the window task — for bot-key/firehose corpora where
    * one key carries a stage-stalling share, the same time-sharded
    * carry-in rewrite documented for the as-of join
    * ([[AsOfJoin]], SCALE.md) applies: shard by time range, carry each
    * shard's running max into the next as one extra row per (key, shard).
    */
  def coalesce(df: DataFrame, keyCol: String, startCol: String,
               endCol: String, tieCol: String): DataFrame = {
    val ord: Seq[Column] = Seq(col(startCol), col(endCol), col(tieCol))
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("_new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_rows"))
  }
}
