package graft

import graft.streaming.{EventStream, StreamIntervals}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class StreamIntervalsSpec extends SparkSpec {
  import spark.implicits._

  private val eventsFile = "/root/testdata/sf0.001/events.parquet"

  test("insert merges the whole overlap run, touch-inclusive") {
    import StreamIntervals.insert
    assert(insert(Nil, 5, 10) == List((5L, 10L, 1L)))
    // disjoint before/after stay
    assert(insert(List((0L, 3L, 1L), (20L, 25L, 2L)), 5, 10)
      == List((0L, 3L, 1L), (5L, 10L, 1L), (20L, 25L, 2L)))
    // touching (inclusive) merges
    assert(insert(List((0L, 5L, 1L)), 5, 10) == List((0L, 10L, 2L)))
    // bridging three islands collapses them into one
    assert(insert(List((0L, 4L, 1L), (6L, 8L, 2L), (10L, 12L, 1L)), 3, 11)
      == List((0L, 12L, 5L)))
    // contained interval extends nothing but counts
    assert(insert(List((0L, 100L, 1L)), 10, 20) == List((0L, 100L, 2L)))
  }

  test("a late-but-admissible interval bridges two open islands (exactly once)") {
    val dir = Files.createTempDirectory("iv-bridge").toString
    def write(rows: Seq[(Long, Long, Long)]): Unit = // (event_id, minute, user)
      rows.map { case (id, m, u) => (id, m * 60000000000L, u, "c", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    // user 1 opens [1000,1030] and [1035,1065]; watermark lands at 1025,
    // so BOTH islands are still open when the out-of-order 1028 arrives
    // and its lease [1028,1058] overlaps both — a single-open-island
    // state would have already split here
    write(Seq((1L, 1000L, 1L), (2L, 1035L, 1L)))
    val q = StreamIntervals.coalesceLeases(
        EventStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("iv_bridge")
      .outputMode("append").start()
    q.processAllAvailable()
    write(Seq((3L, 1028L, 1L)))
    q.processAllAvailable()
    // sentinel flushes user 1's state through the timeout
    write(Seq((9L, 100000L, 9L)))
    q.processAllAvailable()
    val got = spark.table("iv_bridge").as[StreamIntervals.KeyIsland]
      .collect().toSet.filter(_.user_id == 1L)
    q.stop()
    val m = 60000L
    assert(got == Set(StreamIntervals.KeyIsland(1L, 1000 * m, 1065 * m, 3L)))
  }

  test("streaming islands match the batch interval coalesce") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.Queries.tsToNanos(spark.read.parquet(eventsFile))
    // per-event ms exactly as the streaming path derives it
    val ems = expr("(ts div 1000) div 1000")
    val batch = graft.ops.Intervals.coalesce(
        ev.select(col("user_id"), col("event_id"), ems.as("s"),
          (ems + 1800000L).as("e")),
        "user_id", "s", "e", "event_id")
      .select(col("user_id"), col("s").as("start_ms"), col("e").as("end_ms"),
        col("n_rows"))
      .as[StreamIntervals.KeyIsland].collect().toSet

    val dir = Files.createTempDirectory("iv-parity")
    Files.copy(Paths.get(eventsFile), dir.resolve("a.parquet"))
    val q = StreamIntervals.coalesceLeases(
        EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("iv_parity")
      .outputMode("append").start()
    q.processAllAvailable()
    // far-future sentinel flushes every open island (physical ts type must
    // match the fixture file already in the dir)
    val fixtureTs = spark.read.parquet(dir.toString).schema("ts").dataType
    val sentinel = Seq((999999L, java.lang.Long.MAX_VALUE / 2, 999999L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    (if (fixtureTs == org.apache.spark.sql.types.LongType) sentinel
     else sentinel.withColumn("ts",
       timestamp_micros(expr("ts div 1000")).cast(fixtureTs)))
      .coalesce(1).write.mode("append").parquet(dir.toString)
    q.processAllAvailable()
    val streamed = spark.table("iv_parity").as[StreamIntervals.KeyIsland]
      .collect().toSet.filter(_.user_id != 999999L)
    q.stop()

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
