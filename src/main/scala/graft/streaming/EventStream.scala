package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
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

  /** Read an events directory as a stream (parquet file source). The
    * declared schema is taken from the files already present so it always
    * matches the fixture generation's physical `ts` type (TIMESTAMP(NANOS)
    * → long via nanosAsLong, or TIMESTAMP(µs)); `ts` is then normalized to
    * epoch-nanos long ([[graft.Queries.tsToNanos]]).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema =
      scala.util.Try(spark.read.parquet(dir).schema).getOrElse(eventsSchema)
    graft.Queries.tsToNanos(spark.readStream.schema(fileSchema).parquet(dir))
      // EXACT integer ns→µs truncation: `col / 1000` is double division,
      // and epoch-nanos exceed 2^53 — the double round-trip lands
      // boundary events in the wrong window vs the batch twins' `div`
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 5-minute windows per event type with a 10-minute watermark:
    * counts + exact value sums. The sum is [[graft.functions.Sum128]]
    * over scale-4 fixed point — same exact value as the decimal form the
    * batch twin (q_window_tumbling) mirrors, but the streaming state per
    * (window, type) group is two longs instead of a boxed decimal, and
    * the custom DeclarativeAggregate demonstrably composes with
    * watermarked streaming aggregation.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Sum128(round(col("value") * 10000).cast("long"), 4)
          .cast("double").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Streaming exact dedup by event_id within the watermark horizon —
    * at-least-once upstream becomes exactly-once counts downstream
    * (the streaming analog of the reference's REPLACE-by-PK idempotence).
    *
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates("event_id")`:
    * the plain form only evicts state when the event-time column is part
    * of the dedup key, so keying on id alone would retain one state
    * entry per distinct id FOREVER — unbounded state on a high-rate
    * feed. The within-watermark form keys on id and still expires each
    * entry once the watermark passes it, which is exactly the
    * re-delivery horizon at-least-once sources need.
    */
  def dedupCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Stream-static enrichment: attach dimension attributes to each event
    * by key. The static side is explicitly broadcast — per micro-batch
    * Spark re-plans the join, the dimension ships to executors once per
    * batch, and the unbounded stream side NEVER shuffles (the join shape
    * a 100 TB/day event feed requires; a shuffle join on the stream side
    * would re-partition every batch). Left join: events without a
    * dimension row pass through with nulls, never dropped.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join (attribution): each purchase joins the
    * clicks of the SAME user in the preceding `windowMinutes` of event
    * time. Both sides carry watermarks and the join condition bounds
    * `click_time` to `[purchase_time - window, purchase_time]`, which is
    * what lets Spark evict buffered rows as the watermark advances —
    * per-side state is bounded by rate × (window + watermark), never the
    * stream's history. One stateful shuffle per side on the equi-key
    * (user_id); the interval predicate never becomes a cross-product
    * because the equi-key partitions first.
    *
    * `joinType` "inner" or "left_outer": outer emits an unattributed
    * purchase (null click columns) once the watermark passes its join
    * window — the interval bound is what makes an outer stream-stream
    * join legal at all (Spark must know when a row can no longer match
    * to finalize it and evict its state).
    */
  def clickAttribution(events: DataFrame, windowMinutes: Int = 30,
                       joinType: String = "inner"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "10 minutes")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value"), col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_time") >= col("purchase_time") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_time") <= col("purchase_time"),
      joinType)
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("value"), col("purchase_time"), col("click_time"))
  }

  /** One closed user session: `[start_ms, end_ms]` in epoch-millis. */
  final case class UserSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Streaming sessionization with custom state: split each user's event
    * stream into sessions at >`gapMinutes` event-time silence — the
    * continuous form of the batch `q_sessionize` window query.
    *
    * `flatMapGroupsWithState` + event-time timeout is the Spark-native
    * custom-state surface for this: per micro-batch each user folds new
    * events into its single open-session state (closing sessions whose gap
    * was exceeded in-batch), and the watermark closes idle sessions via
    * timeout — so state per user is ONE small struct, evicted on session
    * close, and the operator is a single stateful shuffle on user_id.
    * Out-of-order events within the watermark horizon extend the open
    * session (min/max of its bounds); older stragglers are dropped by the
    * watermark upstream.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    // The single-open-session state assumes an admissible (non-late) row
    // can always merge into the open session: with gap ≥ the 10-minute
    // watermark delay, any in-horizon row sits within gap of the open
    // session's span, so the batch window would merge it too. A gap
    // SMALLER than the delay breaks that (a row 7 minutes before the
    // open session's start is admissible but batch-splits at gap 5) and
    // needs island-list state — [[StreamIntervals]]'s design — instead.
    require(gapMinutes >= 10,
      s"gapMinutes must be >= the 10-minute watermark delay (got " +
        s"$gapMinutes): smaller gaps need open-island-list state " +
        "(see StreamIntervals) for batch parity")
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("event_time", "10 minutes")
      .select(col("user_id").as("_k"), unix_millis(col("event_time")).as("_t"),
        col("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      // state is a plain (start_ms, last_ms, n) tuple — tuple encoders stay
      // inside Spark's well-trodden codegen path
      .flatMapGroupsWithState[(Long, Long, Long), UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: the open session is final
            val (start, last, n) = state.get
            state.remove()
            Iterator.single(UserSession(user, start, last, n))
          } else {
            val ts = rows.map(_._2).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case Some((start, last, n)) if t <= last + gapMs =>
                  Some((math.min(start, t), math.max(last, t), n + 1))
                case Some((start, last, n)) =>
                  closed += UserSession(user, start, last, n)
                  Some((t, t, 1L))
                case None => Some((t, t, 1L))
              }
            }
            cur.foreach { case s @ (_, last, _) =>
              state.update(s)
              // never set a timeout at-or-before the current watermark
              state.setTimeoutTimestamp(
                math.max(last + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }
}
