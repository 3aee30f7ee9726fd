package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single most recent right row
  * with the same key whose timestamp is at-or-before the left row's
  * timestamp (the standard time-series enrichment join — trades joined to
  * quotes, events joined to the order state they observed).
  *
  * Spark has no native as-of join, and the naive formulations don't scale:
  * a range-predicate join plans as BroadcastNestedLoopJoin (all-pairs per
  * key), and "join then keep max(rightTs)" shuffles the full candidate
  * cross-product. This operator instead uses the union + running-window
  * layout:
  *
  *   1. tag right rows priority 0, left rows priority 1, union them with a
  *      common (key, ts) spine — map-side only;
  *   2. ONE shuffle: window partitioned by key, ordered by
  *      (ts, priority, tiebreak), carrying the right columns forward with
  *      `last(..., ignoreNulls)` over an unbounded-preceding frame;
  *   3. keep the left rows — each now holds exactly the latest
  *      right-at-or-before values.
  *
  * Cost is one hash shuffle + sort of |L|+|R| rows regardless of temporal
  * fan-out, the same shape Flink's temporal join and kdb's `aj` use at
  * scale. Ties: a right row at exactly the left row's timestamp IS
  * visible ("at or before" is inclusive); multiple right rows on the same
  * (key, ts) resolve deterministically to the greatest `tieBreak` value.
  *
  * Reference context: the reference delegates all querying to SQL targets
  * (`/root/reference/README.md:68` "and much more"); as-of is the
  * canonical beyond-equi-join capability for the CDC-style event data the
  * warehouse holds.
  */
object AsOfJoin {

  /** @param rightValueCols right columns carried onto each left row
    * @param tieBreak right column ordering same-(key,ts) right rows; the
    *                 greatest value wins
    * @param joinType "inner" (drop left rows with no prior right row) or
    *                 "left" (keep them with NULL carried columns)
    * @param tolerance when set, a right row older than
    *                  `leftTs - tolerance` does NOT match (pandas
    *                  merge_asof tolerance) — the carried right timestamp
    *                  is checked after the window, so the plan shape (one
    *                  shuffle, no range cross-product) is unchanged
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightValueCols: Seq[String], tieBreak: String,
      joinType: String = "inner",
      tolerance: Option[Long] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"as-of join supports inner|left, got $joinType")
    val leftCols = left.columns.toSeq
    // the right timestamp rides in the carried struct for the tolerance
    // check; pick an internal field name no value column uses
    val rts = Iterator.from(0).map(i => s"_graft_rts$i")
      .find(n => !rightValueCols.contains(n)).get
    // the right row's carried columns travel as ONE struct so the window's
    // last() picks them atomically — carrying each column independently
    // with last(ignoreNulls) could stitch together values from DIFFERENT
    // right rows whenever a right value column is NULL
    val rStructType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField(rts, right.schema(rightTs).dataType))

    // leftTs/rightTs must already be in the same comparable unit (no cast
    // here — a silent timestamp→long cast would truncate to seconds)
    val lTagged = left.select(
      col(leftKey).as("_k") +: col(leftTs).as("_t") +: lit(1).as("_pri") +:
        (leftCols.map(col) :+ lit(null).cast(rStructType).as("_r")): _*)
    val leftSchema = lTagged.schema
    def lnull(c: String): Column = lit(null).cast(leftSchema(c).dataType)
    val rTagged = right.select(
      col(rightKey).as("_k") +: col(rightTs).as("_t") +: lit(0).as("_pri") +:
        (leftCols.map(c => lnull(c).as(c)) :+
          struct(rightValueCols.map(col) :+ col(rightTs).as(rts): _*).as("_r")): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_pri").asc,
        col("_r").getField(tieBreak).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lTagged.unionByName(rTagged)
      .select(col("_pri") +: col("_t") +: leftCols.map(col) :+
        last(col("_r"), ignoreNulls = true).over(w).as("_rc"): _*)
      .where(col("_pri") === 1)
    val bounded = tolerance match {
      case Some(tol) => joined.withColumn("_rc",
        when(col("_rc").getField(rts) >= col("_t") - tol, col("_rc")))
      case None => joined
    }
    val matched =
      if (joinType == "inner") bounded.where(col("_rc").isNotNull) else bounded
    matched.select(leftCols.map(col) ++
      rightValueCols.map(c => col("_rc").getField(c).as(c)): _*)
  }
}
