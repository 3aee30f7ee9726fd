package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.nio.file.{Files, Paths}

class EventStreamSpec extends SparkSpec {

  /** The parquet file source wants a directory; stage the single-file
    * events table into one.
    */
  lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  test("windowed aggregation with watermark matches batch computation") {
    val q = EventStream.windowedCounts(EventStream.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("winagg")
      .select("w_start", "event_type", "n", "total").collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.schema(EventStream.eventsSchema).parquet(eventsDir)
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))
      .collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup: duplicated input still counts each event once") {
    // duplicate the file = at-least-once redelivery of every event
    val dir = Files.createTempDirectory("events-dup")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("a.parquet"))
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("b.parquet"))

    val q = EventStream.dedupCounts(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("dedupagg")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val total = spark.table("dedupagg").agg(sum("n")).collect()(0).getLong(0)
    assert(total == 1000L) // not 2000
  }
}
