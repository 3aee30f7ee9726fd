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
    val batch = graft.Queries.tsToNanos(spark.read.parquet(eventsDir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
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

  test("streaming sessionization: gap-close in batch, idle-close by watermark timeout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events-sess").toString
    def write(rows: Seq[(Long, Long, Long)]): Unit = // (event_id, minute, user)
      rows.map { case (id, m, u) => (id, m * 60000000000L, u, "c", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    // user 1: one session (min 1000,1010,1020); user 9's min-1120 event
    // drives the watermark to min 1110. (Events at epoch 0 exactly would be
    // dropped by the initial late-row predicate — keep times positive.)
    write(Seq((1L, 1000L, 1L), (2L, 1010L, 1L), (3L, 1020L, 1L), (4L, 1120L, 9L)))
    val q = EventStream.sessionize(EventStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    q.processAllAvailable()
    // the watermark (min 1110) already times out user 1's idle state in the
    // no-data batch Spark runs after a watermark advance
    val m = 60000L
    assert(spark.table("sess").as[EventStream.UserSession].collect().toSet ==
      Set(EventStream.UserSession(1L, 1000 * m, 1020 * m, 3L)))

    // next batch: user 9's min-1200 event closes its min-1120 session by
    // gap (80 > 30)
    write(Seq((5L, 1200L, 9L)))
    q.processAllAvailable()
    val got = spark.table("sess").as[EventStream.UserSession].collect().toSet
    q.stop()
    assert(got == Set(
      EventStream.UserSession(1L, 1000 * m, 1020 * m, 3L),
      EventStream.UserSession(9L, 1120 * m, 1120 * m, 1L)))
  }

  test("streaming sessionization matches the batch window formulation") {
    import spark.implicits._
    // batch sessions over the real events table (q_sessionize's lag +
    // cumulative-sum shape, grouped to (start, end, n) per session)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.Queries.tsToNanos(spark.read.parquet(eventsDir))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // per-event ms exactly as the streaming path derives it
    // (ns -> truncate to us -> truncate to ms), BEFORE any aggregation
    val ems = expr("(ts div 1000) div 1000")
    val batchSessions = ev
      .withColumn("ems", ems)
      .withColumn("prev_ms", lag(col("ems"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_ms").isNull || col("ems") - col("prev_ms") > 1800000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ems")).as("start_ms"), max(col("ems")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_ms", "end_ms", "n_events")
      .as[EventStream.UserSession].collect().toSet

    // streaming sessions over the same file; a far-future sentinel event
    // flushes every open session through the watermark timeout
    val dir = Files.createTempDirectory("events-parity")
    Files.copy(Paths.get(s"$eventsDir/part-0.parquet"), dir.resolve("a.parquet"))
    val q = EventStream.sessionize(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("sess_parity").outputMode("append").start()
    q.processAllAvailable()
    // the sentinel file's physical ts type must match the fixture file
    // already in the dir (mixed long/timestamp parquet in one stream dir
    // fails the scan) — convert when the fixture carries a timestamp
    val fixtureTs = spark.read.parquet(dir.toString).schema("ts").dataType
    val sentinel = Seq((999999L, java.lang.Long.MAX_VALUE / 2, 999999L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    (if (fixtureTs == org.apache.spark.sql.types.LongType) sentinel
     else sentinel.withColumn("ts",
       timestamp_micros(expr("ts div 1000")).cast(fixtureTs)))
      .coalesce(1).write.mode("append").parquet(dir.toString)
    q.processAllAvailable()
    val streamed = spark.table("sess_parity").as[EventStream.UserSession]
      .collect().toSet.filter(_.user_id != 999999L)
    q.stop()

    assert(streamed == batchSessions)
    assert(streamed.nonEmpty)
  }

  test("stream-static enrichment: broadcast dim join, unmatched events kept") {
    import spark.implicits._
    val users = spark.read.parquet(s"$eventsDir/part-0.parquet")
      .select($"user_id").distinct().limit(5)
      .withColumn("tier", concat(lit("tier-"), $"user_id" % 3))
    val dimIds = users.select("user_id").collect().map(_.getLong(0)).toSet

    val q = EventStream.enrich(EventStream.readEvents(spark, eventsDir), users)
      .select($"event_id", $"user_id", $"tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("enriched").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)))).toSeq
    val total = spark.read.parquet(s"$eventsDir/part-0.parquet").count()
    assert(out.size == total.toInt) // left join: nothing dropped
    out.foreach { case (uid, tier) =>
      if (dimIds.contains(uid)) assert(tier.contains(s"tier-${uid % 3}"))
      else assert(tier.isEmpty)
    }
    assert(out.exists(_._2.isDefined) && out.exists(_._2.isEmpty))
  }

  test("stream-stream interval join matches the batch join") {
    val q = EventStream.clickAttribution(EventStream.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("attrib")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch twin of the same predicate
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.Queries.tsToNanos(spark.read.parquet(eventsDir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("event_time").as("purchase_time"))
    val batch = p.join(c,
        col("p_user") === col("c_user") &&
          col("click_time") >= col("purchase_time") - expr("INTERVAL 30 MINUTES") &&
          col("click_time") <= col("purchase_time"))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("left-outer stream-stream join emits unattributed purchases after the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events-louter").toString
    def write(rows: Seq[(Long, Long, Long, String)]): Unit = // (id, minute, user, type)
      rows.map { case (id, m, u, t) => (id, m * 60000000000L, u, t, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    // user 1: click@100 then purchase@110 (attributed, gap 10 ≤ 30)
    // user 2: purchase@200 with no click (must STILL emit, click_id null)
    write(Seq((1L, 100L, 1L, "click"), (2L, 110L, 1L, "purchase"),
      (3L, 200L, 2L, "purchase")))
    val q = EventStream.clickAttribution(
        EventStream.readEvents(spark, dir), joinType = "left_outer")
      .writeStream.format("memory").queryName("louter")
      .outputMode("append").start()
    q.processAllAvailable()
    // drive BOTH side watermarks far past purchase@200's join window so
    // the unmatched row finalizes: the join's watermark is the min of the
    // two sides, and each side only advances on events that reach ITS
    // filtered branch — a click alone leaves the purchase side behind.
    // (purchase@1000 itself stays pending: the watermark never passes it.)
    write(Seq((8L, 1000L, 8L, "purchase"), (9L, 1000L, 9L, "click")))
    q.processAllAvailable(); q.stop()

    val out = spark.table("louter")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out == Map(2L -> Some(1L), 3L -> None))
  }
}
