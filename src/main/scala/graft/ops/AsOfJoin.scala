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
  * scale — with one caveat: the per-key window puts a key's ENTIRE
  * timeline through one task, so a degenerate hot key (a bot user with
  * 10⁹ events, a null-ish default key) becomes one giant straggler. For
  * such corpora `timeShards > 1` switches to a two-level plan — the
  * [[graft.Queries]] shardedCum trick applied to time: each key's
  * timeline splits into time-range blocks (global min/max pre-pass,
  * broadcast back; block assignment monotone in ts, equal timestamps
  * never split), the window runs within (key, block), and a CARRY-IN
  * (the latest right row of every strictly-earlier block — one
  * map-side-combinable `max(struct)` per (key, block) plus a
  * block-granularity running window) lifts in-shard results to the full
  * timeline, bit-identical to the single-window form. Sharding pays two
  * extra input passes, so it is opt-in rather than the default; the
  * ScaleProbe `asof` mode measures both forms under a planted hot key.
  * Ties: a right row at exactly the left row's timestamp IS
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
    * @param timeShards time-range blocks each key's timeline is split
    *                  into (the hot-key ceiling: no window task sees more
    *                  than ~1/timeShards of a key's rows). The default 1
    *                  is the one-pass single-window plan — right whenever
    *                  per-key activity is bounded (the common case).
    *                  Sharding costs two extra input passes (bounds +
    *                  per-shard carry picks), so turn it on when a key
    *                  can hold a task-breaking share of rows (bot users,
    *                  null-ish default keys); the ScaleProbe `asof` mode
    *                  measures the crossover
    * @param autoThreshold with `timeShards > 1`, makes sharding
    *                  DATA-DRIVEN per key: only keys with more than this
    *                  many spine rows (left + right) take the sharded
    *                  path, the rest ride the single window — see
    *                  [[TimeShard.hybrid]]. 0 (default) shards every key.
    *                  When to turn it on: the measured production policy
    *                  in the [[TimeShard]] object doc / SCALE.md
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightValueCols: Seq[String], tieBreak: String,
      joinType: String = "inner",
      tolerance: Option[Long] = None,
      timeShards: Int = 1, autoThreshold: Long = 0L): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"as-of join supports inner|left, got $joinType")
    val leftCols = left.columns.toSeq
    // internal spine/carry names; a left column with one of these names
    // would become an ambiguous reference deep inside the plan — fail
    // with the actual story instead
    val reserved = Set("_k", "_t", "_pri", "_r", "_first") ++ TimeShard.reservedCols
    val clash = leftCols.filter(reserved)
    require(clash.isEmpty,
      s"left columns ${clash.mkString(", ")} collide with as-of internal " +
        s"names (${reserved.mkString(", ")}) — rename them before the join")
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

    val u = lTagged.unionByName(rTagged)
    val tb = col("_r").getField(tieBreak)
    // Shard bounds are PER KEY — a global time range fails exactly on
    // the corpora that need sharding (a bot key bursting 10⁹ events in
    // one day of a 5-year corpus lands in ONE global-range shard; its
    // own [min, max] divides into timeShards no matter how the burst
    // sits in corpus time). [[TimeShard.hybrid]] owns the bounds
    // pre-pass, the NULL→first-shard rule, and the data-driven
    // `autoThreshold` split; shard assignment is monotone in `_t` and
    // equal timestamps always share a shard, so in-shard order +
    // strictly-earlier carry-in reproduce the global window exactly.
    val joined = TimeShard.hybrid(u, "_k", col("_t"), timeShards,
      autoThreshold) { base =>
        val w = Window.partitionBy(col("_k"))
          .orderBy(col("_t").asc, col("_pri").asc, tb.asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base.select(col("_pri") +: col("_t") +: leftCols.map(col) :+
          last(col("_r"), ignoreNulls = true).over(w).as("_rc"): _*)
          .where(col("_pri") === 1)
      } { sharded =>
        // Carry-in: the latest right row of every strictly-earlier
        // shard. The per-(key, shard) pick is a map-side-combinable
        // max(struct) over the RIGHT side only, whose field order
        // replicates the window's (ts, tiebreak-nulls-last) tie rule;
        // the running max windows at SHARD granularity (≤ timeShards
        // rows per key — never a funnel). Each carry-in then re-enters
        // the main table as a synthetic first-of-shard row (`_first` 0)
        // and rides the window's ONE exchange + sort — joining it back
        // instead would force a second full sort of the corpus for the
        // sort-merge join.
        val rightPick = when(col("_pri") === 0,
          struct(col("_t").as("_pt"), tb.isNull.as("_tbn"),
            tb.as("_tb"), col("_r").as("_pr")))
        // one row per EXISTING (key, shard) group — left-only shards
        // included, so every shard that has readers gets its carry row;
        // the exclusive frame makes the pick strictly-earlier (max
        // skips the null picks of right-free shards)
        val carry = sharded
          .groupBy(col("_k"), col("_sh"))
          .agg(max(rightPick).as("_m"))
          .select(col("_k"), col("_sh"),
            max(col("_m")).over(Window.partitionBy(col("_k")).orderBy(col("_sh"))
              .rowsBetween(Window.unboundedPreceding, -1))
              .getField("_pr").as("_cin"))
          .where(col("_cin").isNotNull)
        val carryRows = carry.select(
          col("_k") +: lit(null).cast(lTagged.schema("_t").dataType).as("_t") +:
            lit(-1).as("_pri") +:
            (leftCols.map(c => lnull(c).as(c)) :+ col("_cin").as("_r")) :+
            col("_sh") :+ lit(0).as("_first"): _*)
        val w = Window.partitionBy(col("_k"), col("_sh"))
          .orderBy(col("_first").asc, col("_t").asc, col("_pri").asc,
            tb.asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sharded.withColumn("_first", lit(1))
          .unionByName(carryRows)
          // EXPLICIT redistribution on (key, shard): the bounds join
          // leaves the data HashPartitioning(key), which SATISFIES the
          // window's ClusteredDistribution(key, shard) — EnsureRequirements
          // would elide the exchange and hand the hot key's whole
          // timeline back to one window task, silently restoring the
          // funnel this plan exists to break
          .repartition(col("_k"), col("_sh"))
          .select(col("_pri") +: col("_t") +: leftCols.map(col) :+
            last(col("_r"), ignoreNulls = true).over(w).as("_rc"): _*)
          .where(col("_pri") === 1)
      }
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
