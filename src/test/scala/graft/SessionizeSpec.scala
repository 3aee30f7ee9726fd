package graft

import graft.ops.Sessionize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.ops.Sessionize.viaIntervals]] must reproduce the classic
  * lag + cumulative-sum window sessionization bit-for-bit — including
  * session NUMBERING — in both the single-window and time-sharded
  * forms (the q_sessionize contract; the hot-key probe is
  * ScaleProbe `sessions`).
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val GAP = 100L

  /** Reference implementation: the lag window idiom. */
  private def windowForm(ev: DataFrame): Set[(Long, Long, Long, Long, Long)] = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > GAP, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("s"), max(col("ts")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  private def viaIntervals(ev: DataFrame, shards: Int): Set[(Long, Long, Long, Long, Long)] =
    Sessionize.viaIntervals(ev, "user_id", "ts", "event_id", GAP, timeShards = shards)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  // deterministic pseudo-random fixture: clumpy timelines with ties,
  // exact-gap edges, and singleton users
  private lazy val events = {
    val rows = for {
      u <- 1L to 20L
      i <- 0L until (u * 7 % 50 + 1)
    } yield {
      val mix = u * 2654435761L + i * 40503L
      // clumps: mostly small steps, occasional >GAP jumps, some ties
      val step = (mix % 7) match {
        case 0 => 0L           // tie with previous event
        case 1 => GAP          // exactly the gap: must stay in-session
        case 2 => GAP + 1      // minimal split
        case n => (n * 13) % 90
      }
      (u, i, step)
    }
    rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      var t = 1000L
      rs.sortBy(_._2).map { case (_, i, step) => t += step; (i + u * 1000, u, t) }
    }.toDF("event_id", "user_id", "ts").repartition(7)
  }

  test("interval form matches the lag-window reference exactly") {
    assert(viaIntervals(events, 1) == windowForm(events))
  }

  test("time-sharded form is bit-identical, numbering included") {
    val ref = windowForm(events)
    assert(viaIntervals(events, 3) == ref)
    assert(viaIntervals(events, 32) == ref) // more shards than events/user
  }

  test("exact-gap silence stays in-session; gap+1 splits") {
    val ev = Seq((1L, 9L, 0L), (2L, 9L, GAP), (3L, 9L, 2 * GAP + 1))
      .toDF("event_id", "user_id", "ts")
    val ref = windowForm(ev)
    // one 2-event session [0, GAP] and one singleton at 2*GAP+1
    assert(ref == Set((9L, 1L, 2L, 0L, GAP), (9L, 2L, 1L, 2 * GAP + 1, 2 * GAP + 1)))
    assert(viaIntervals(ev, 1) == ref)
    assert(viaIntervals(ev, 2) == ref)
  }
}
