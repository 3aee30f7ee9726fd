package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Continuous twin of [[graft.ops.Intervals.coalesce]] (the pattern of
  * [[StreamDedup]]/[[DriftMaintenance]]: every batch maintenance operator
  * gets a streaming twin): overlapping-or-touching per-key intervals
  * merge into maximal islands as they arrive, and each island is emitted
  * EXACTLY ONCE — at the moment the watermark proves no admissible row
  * can still extend it (any row with `start <= island end` would already
  * be late).
  *
  * State design: the OPEN islands per key as a sorted, disjoint list —
  * each new interval merges the whole run of islands it overlaps (a
  * list insert-merge, not a running carry), so arrival order within the
  * watermark horizon does not matter: a late-but-admissible interval
  * that BRIDGES two open islands collapses them into one, exactly as the
  * batch window would have. (A single-open-island state — the obvious
  * sessionize-style reduction — gets that case wrong.) State size is
  * O(open islands per key): an island closes as soon as the watermark
  * passes its end, so state never grows with stream history.
  */
object StreamIntervals {

  final case class KeyIsland(user_id: Long, start_ms: Long, end_ms: Long,
                             n_rows: Long)

  /** Insert `[s, e]` into a start-sorted list of disjoint, non-touching
    * islands, merging every island it overlaps or touches (inclusive
    * bounds — the batch operator's rule). Disjointness makes ends sorted
    * too, so the overlap run is one contiguous slice.
    */
  private[graft] def insert(islands: List[(Long, Long, Long)], s: Long,
                                e: Long): List[(Long, Long, Long)] = {
    val (before, rest) = islands.span(_._2 < s)
    val (overlap, after) = rest.span(_._1 <= e)
    val merged = (
      (s +: overlap.map(_._1)).min,
      (e +: overlap.map(_._2)).max,
      1L + overlap.map(_._3).sum)
    before ::: (merged :: after)
  }

  /** Coalesce the 30-minute activity leases each event opens (the
    * q_interval_merge semantic, continuously): input is
    * [[EventStream.readEvents]]' shape (`user_id`, `event_time`).
    * Emits one [[KeyIsland]] per finalized island, in ms (the streaming
    * convention of [[EventStream.sessionize]]).
    */
  def coalesceLeases(events: DataFrame, leaseMinutes: Int = 30): Dataset[KeyIsland] = {
    val spark = events.sparkSession
    import spark.implicits._
    val leaseMs = leaseMinutes * 60000L
    events
      .withWatermark("event_time", "10 minutes")
      // the watermarked column must survive into the stateful operator's
      // input (dropping it fails the event-time-timeout analysis check)
      .select(col("user_id").as("_k"), unix_millis(col("event_time")).as("_s"),
        col("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long, Long)], KeyIsland](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          // unified path: on a timeout wake-up `rows` is simply empty
          var islands = state.getOption.getOrElse(Nil)
          rows.foreach { case (_, s, _) => islands = insert(islands, s, s + leaseMs) }
          // an island whose end is strictly before the watermark is
          // final: any extender would need start <= end < watermark —
          // late by definition
          val wm = state.getCurrentWatermarkMs
          val (closed, open) = islands.partition(_._2 < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // wake when the earliest open island becomes final; never
            // at-or-before the current watermark (API contract)
            state.setTimeoutTimestamp(math.max(open.map(_._2).min + 1, wm + 1))
          }
          closed.iterator.map { case (s, e, n) => KeyIsland(key, s, e, n) }
      }
  }
}
