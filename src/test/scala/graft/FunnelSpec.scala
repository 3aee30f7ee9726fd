package graft

import graft.ops.Funnel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, user, ts, type) — the strictly-after edges:
  //   u1: click BEFORE the first view is ignored, purchase before the
  //       first qualifying click is ignored
  //   u2: clicks without a view never enter the funnel
  //   u3: stage skipping is impossible (purchase without a click stays out)
  //   u4: a tie with the previous stage's first time does NOT qualify
  private val ev = Seq(
    (1L, 1L, 5L, "click"), (2L, 1L, 10L, "view"), (3L, 1L, 20L, "click"),
    (4L, 1L, 15L, "purchase"), (5L, 1L, 30L, "purchase"),
    (6L, 2L, 5L, "click"),
    (7L, 3L, 10L, "view"), (8L, 3L, 20L, "purchase"),
    (9L, 4L, 10L, "view"), (10L, 4L, 10L, "click"), (11L, 4L, 11L, "click")
  ).toDF("event_id", "user_id", "ts", "event_type")

  private def canon(d: DataFrame): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    d.collect().map { r =>
      def g(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> (g(1), g(2), g(3))
    }.toMap

  private def run(shards: Int, thr: Long = 0L): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    canon(Funnel.firstTimes(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), timeShards = shards, autoThreshold = thr))

  test("first-times semantics: strictly-after thresholds, no stage skipping") {
    val got = run(1)
    assert(got == Map(
      1L -> (Some(10L), Some(20L), Some(30L)),
      3L -> (Some(10L), None, None),
      4L -> (Some(10L), Some(11L), None)))
  }

  test("manual shards and the auto hybrid reproduce the single plan") {
    val ref = run(1)
    assert(run(3) == ref)
    assert(run(3, thr = 2L) == ref) // genuine mix: u1/u4 hot, u3 cold
    assert(run(16, thr = 100L) == ref) // nothing hot: short-circuit
  }

  test("a single-stage funnel is just the per-key first time") {
    val got = canon(Funnel.firstTimes(ev, "user_id", "ts", "event_type",
      Seq("click"), timeShards = 4, autoThreshold = 1L)
      .withColumn("_p1", lit(null).cast("long"))
      .withColumn("_p2", lit(null).cast("long")))
    assert(got == Map(1L -> (Some(5L), None, None),
      2L -> (Some(5L), None, None), 4L -> (Some(10L), None, None)))
  }

  test("internal-name collisions are refused loudly") {
    val bad = ev.withColumnRenamed("ts", "t0")
    val e = intercept[IllegalArgumentException] {
      Funnel.firstTimes(bad, "user_id", "t0", "event_type", Seq("view"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
