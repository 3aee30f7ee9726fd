package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming analytics over an event stream — the extension
  * surface beyond the reference's CDC feed (which needs no event-time
  * logic, SURVEY §2 "Streaming"): event-time windows with watermarks and
  * streaming deduplication, the building blocks of a continuous metrics
  * pipeline over the warehouse.
  *
  * Scale: windowed aggregation state is bounded by the watermark horizon
  * (late data beyond 10 minutes is dropped, state for closed windows is
  * evicted); dedup state likewise expires with the watermark. Both are
  * single-shuffle stateful operators keyed by (window, type) / event_id.
  */
object EventStream {

  /** The events table schema as generated (ts arrives as epoch-nanos when
    * read through [[graft.Queries.t]]; the raw parquet carries
    * TIMESTAMP(NANOS)).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Read an events directory as a stream (parquet file source). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
  }

  /** Tumbling 5-minute windows per event type with a 10-minute watermark:
    * counts + exact-decimal value sums.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Streaming exact dedup by event_id within the watermark horizon —
    * at-least-once upstream becomes exactly-once counts downstream
    * (the streaming analog of the reference's REPLACE-by-PK idempotence).
    */
  def dedupCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
}
