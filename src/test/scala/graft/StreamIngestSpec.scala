package graft

import graft.streaming.StreamIngest
import graft.model.ChangeFeed
import java.nio.file.{Files, Paths}

class StreamIngestSpec extends SparkSpec {

  def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  def writeChanges(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))

  def change(seq: Int, id: String, doc: String): String =
    s"""{"seq":"$seq-x","id":"$id","changes":[{"rev":"$seq-r"}],"doc":$doc}"""

  def deletion(seq: Int, id: String): String =
    s"""{"seq":"$seq-x","id":"$id","changes":[{"rev":"$seq-r"}],"deleted":true,"doc":{"_id":"$id","_rev":"$seq-r","_deleted":true}}"""

  test("streaming ingest: spool + incremental micro-batches with updates and deletes") {
    val input = tempDir("stream-in")
    val wh = tempDir("stream-wh")
    val ckpt = tempDir("stream-ckpt")

    writeChanges(input, "batch1.jsonl", Seq(
      change(1, "a", """{"_id":"a","_rev":"1-r","name":"Ada","score":1}"""),
      change(2, "b", """{"_id":"b","_rev":"1-r","name":"Bob","score":2}"""),
      change(3, "c", """{"_id":"c","_rev":"1-r","name":"Cy","score":3}""")))

    val ingest = new StreamIngest(spark, WarehouseOptions(database = "sdb"), wh)
    val q1 = ingest.start(input, ckpt)
    q1.awaitTermination()
    ingest.publish()

    assert(spark.sql("SELECT COUNT(*) FROM sdb").collect()(0).getLong(0) == 3L)
    assert(ingest.checkpoint == 3L)

    // second micro-batch: update b, delete c, insert d
    writeChanges(input, "batch2.jsonl", Seq(
      change(4, "b", """{"_id":"b","_rev":"2-r","name":"Bobby","score":20}"""),
      deletion(5, "c"),
      change(6, "d", """{"_id":"d","_rev":"1-r","name":"Dee","score":4}""")))

    val q2 = ingest.start(input, ckpt)
    q2.awaitTermination()
    ingest.publish()

    val rows = spark.sql("SELECT id, name, score FROM sdb ORDER BY id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "d"))
    assert(rows(1).getString(1) == "Bobby" && rows(1).getDouble(2) == 20.0)
    assert(ingest.checkpoint == 6L)
  }

  test("replayed batch is idempotent (at-least-once delivery)") {
    val wh = tempDir("replay-wh")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "rdb"), wh)
    val batch = ChangeFeed.fromLines(
      {
        import spark.implicits._
        Seq(
          change(1, "x", """{"_id":"x","_rev":"1-r","v":1}"""),
          change(2, "y", """{"_id":"y","_rev":"1-r","v":2}""")
        ).toDF("value")
      }, "value")
    ingest.applyBatch(batch, 0L)
    ingest.applyBatch(batch, 1L) // replay
    ingest.publish()
    assert(spark.sql("SELECT COUNT(*) FROM rdb").collect()(0).getLong(0) == 2L)
    assert(ingest.checkpoint == 2L)
  }

  test("schema registry survives restart (frozen first-doc-wins)") {
    val wh = tempDir("restart-wh")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "xdb"), wh)
    val mk = (s: String) => ChangeFeed.fromLines(
      { import spark.implicits._; Seq(s).toDF("value") }, "value")
    ingest.applyBatch(mk(change(1, "p", """{"_id":"p","_rev":"1","a":1,"b":"t"}""")), 0L)
    ingest.publish()
    // new instance over same warehouse dir = restart; later doc carries an
    // extra field which must stay dropped
    val ingest2 = new StreamIngest(spark, WarehouseOptions(database = "xdb"), wh)
    ingest2.applyBatch(mk(change(2, "q", """{"_id":"q","_rev":"1","a":2,"b":"u","extra":9}""")), 1L)
    ingest2.publish()
    val cols = spark.sql("SELECT * FROM xdb").columns.toSeq
    assert(cols == Seq("a", "b", "id", "rev"))
  }

  test("bucketed state: untouched buckets are not rewritten") {
    val wh = tempDir("bucket-wh")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "bdb"), wh)
    val mk = (rows: Seq[String]) => ChangeFeed.fromLines(
      { import spark.implicits._; rows.toDF("value") }, "value")
    // enough ids to populate several buckets
    ingest.applyBatch(mk((1 to 40).map(i =>
      change(i, s"doc$i", s"""{"_id":"doc$i","_rev":"1","v":$i}"""))), 0L)

    val stateDir = java.nio.file.Paths.get(s"$wh/_state")
    def snapshot(): Map[String, Set[String]] =
      java.nio.file.Files.list(stateDir).toArray.toSeq
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => p.getFileName.toString.startsWith("_bucket="))
        .map { p =>
          p.getFileName.toString ->
            java.nio.file.Files.list(p).toArray.toSeq
              .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
              .filter(_.endsWith(".parquet")).toSet
        }.toMap

    val before = snapshot()
    assert(before.size > 3, s"expected several buckets, got ${before.keys}")

    // touch exactly one id → exactly one bucket
    ingest.applyBatch(mk(Seq(
      change(99, "doc1", """{"_id":"doc1","_rev":"2","v":100}"""))), 1L)
    val after = snapshot()

    val changed = before.keySet.filter(k => before(k) != after.getOrElse(k, Set.empty))
    assert(changed.size == 1, s"exactly one bucket should change, got $changed")
    // and the data is correct
    ingest.publish()
    val v = spark.sql("SELECT v FROM bdb WHERE id = 'doc1'").collect()(0).getDouble(0)
    assert(v == 100.0)
    assert(spark.sql("SELECT COUNT(*) FROM bdb").collect()(0).getLong(0) == 40L)
  }

  test("maintained aggregate follows upserts, group moves, deletes; replay is a no-op") {
    val wh = tempDir("agg-wh")
    val spec = StreamIngest.AggSpec("$.type", "$.amount")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "adb"), wh,
      maintainAgg = Some(spec))
    val mk = (rows: Seq[String]) => ChangeFeed.fromLines(
      { import spark.implicits._; rows.toDF("value") }, "value")

    def agg(): Map[String, (Long, Double)] =
      ingest.maintainedAgg.get.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    ingest.applyBatch(mk(Seq(
      change(1, "a", """{"_id":"a","_rev":"1","type":"x","amount":10.5}"""),
      change(2, "b", """{"_id":"b","_rev":"1","type":"x","amount":2.25}"""),
      change(3, "c", """{"_id":"c","_rev":"1","type":"y","amount":4.0}"""))), 0L)
    assert(agg() == Map("x" -> (2L, 12.75), "y" -> (1L, 4.0)))

    // update a's amount, MOVE b to group y, delete c (group y empties then refills)
    val b2 = Seq(
      change(4, "a", """{"_id":"a","_rev":"2","type":"x","amount":100.0}"""),
      change(5, "b", """{"_id":"b","_rev":"2","type":"y","amount":2.25}"""),
      deletion(6, "c"))
    ingest.applyBatch(mk(b2), 1L)
    assert(agg() == Map("x" -> (1L, 100.0), "y" -> (1L, 2.25)))

    // crash-replay of the SAME batch id: the marker skips the delta
    ingest.applyBatch(mk(b2), 1L)
    assert(agg() == Map("x" -> (1L, 100.0), "y" -> (1L, 2.25)))

    // and the maintained table equals a recompute over the live docs
    ingest.publish()
    val truth = spark.sql(
      "SELECT type, COUNT(*) n, SUM(amount) total FROM adb GROUP BY type")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(agg() == truth)

    // a restarted instance sees the same aggregate (directory state only)
    val ingest2 = new StreamIngest(spark, WarehouseOptions(database = "adb"), wh,
      maintainAgg = Some(spec))
    val again = ingest2.maintainedAgg.get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == truth)
  }

  test("enabling maintainAgg on an existing warehouse bootstraps from live state") {
    val wh = tempDir("boot-wh")
    val mk = (rows: Seq[String]) => ChangeFeed.fromLines(
      { import spark.implicits._; rows.toDF("value") }, "value")
    // build state WITHOUT a maintained aggregate
    val plain = new StreamIngest(spark, WarehouseOptions(database = "bootdb"), wh)
    plain.applyBatch(mk(Seq(
      change(1, "a", """{"_id":"a","_rev":"1","type":"x","amount":10.0}"""),
      change(2, "b", """{"_id":"b","_rev":"1","type":"y","amount":3.0}"""),
      change(3, "c", """{"_id":"c","_rev":"1","type":"x","amount":2.5}"""))), 0L)

    // turning the aggregate on later must count a/b/c even though no
    // future batch ever touches them
    val spec = StreamIngest.AggSpec("$.type", "$.amount")
    val agged = new StreamIngest(spark, WarehouseOptions(database = "bootdb"), wh,
      maintainAgg = Some(spec))
    def agg(i: StreamIngest): Map[String, (Long, Double)] =
      i.maintainedAgg.get.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(agg(agged) == Map("x" -> (2L, 12.5), "y" -> (1L, 3.0)))

    // and deltas apply on top of the bootstrap (batchIds restart at 0 —
    // the bootstrap marker is -1, so batch 0 is not skipped)
    agged.applyBatch(mk(Seq(
      change(4, "d", """{"_id":"d","_rev":"1","type":"y","amount":1.0}"""))), 0L)
    assert(agg(agged) == Map("x" -> (2L, 12.5), "y" -> (2L, 4.0)))
  }

  test("a batchId behind the applied marker by more than the replay margin fails loudly") {
    val wh = tempDir("backwards-wh")
    val mk = (rows: Seq[String]) => ChangeFeed.fromLines(
      { import spark.implicits._; rows.toDF("value") }, "value")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "bwdb"), wh,
      maintainAgg = Some(StreamIngest.AggSpec("$.type", "$.amount")))
    ingest.applyBatch(mk(Seq(
      change(1, "a", """{"_id":"a","_rev":"1","type":"x","amount":1.0}"""))), 4L)
    // replay of the marker batch itself: legitimate, a silent no-op
    ingest.applyBatch(mk(Seq(
      change(1, "a", """{"_id":"a","_rev":"1","type":"x","amount":1.0}"""))), 4L)
    // a reset checkpoint restarts batchIds at 0: must not silently freeze
    val e = intercept[IllegalStateException] {
      ingest.applyBatch(mk(Seq(
        change(2, "b", """{"_id":"b","_rev":"1","type":"x","amount":1.0}"""))), 0L)
    }
    assert(e.getMessage.contains("batchId went backwards"))
  }

  test("state-backed outbound change feed: tombstones included, resumable") {
    val wh = tempDir("feed-wh")
    val mk = (rows: Seq[String]) => ChangeFeed.fromLines(
      { import spark.implicits._; rows.toDF("value") }, "value")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "feeddb"), wh)
    ingest.applyBatch(mk(Seq(
      change(1, "a", """{"_id":"a","_rev":"1","v":1}"""),
      change(2, "b", """{"_id":"b","_rev":"1","v":2}"""))), 0L)
    ingest.applyBatch(mk(Seq(
      deletion(3, "a"),
      change(4, "b", """{"_id":"b","_rev":"2","v":20}"""))), 1L)
    val all = ingest.changesSince(0L).orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(all == Seq(("a", 3L, true), ("b", 4L, false)))
    val tail = ingest.changesSince(3L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tail == Seq(("b", 4L)))
  }

  test("crash recovery: a retired-but-unreplaced bucket is restored on restart") {
    val wh = tempDir("recover-wh")
    val mk = (ls: Seq[String]) => ChangeFeed.fromLines(
      { import spark.implicits._; ls.toDF("value") }, "value")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "cdb"), wh)
    ingest.applyBatch(mk(Seq(
      change(1, "k1", """{"_id":"k1","_rev":"1","v":1}"""),
      change(2, "k2", """{"_id":"k2","_rev":"1","v":2}"""))), 0L)

    // simulate a crash mid-swap: one bucket moved aside, replacement lost
    val root = Paths.get(wh, "_state")
    val bucket = Files.list(root).iterator()
    var victim: java.nio.file.Path = null
    while (bucket.hasNext && victim == null) {
      val p = bucket.next()
      if (p.getFileName.toString.startsWith("_bucket=")) victim = p
    }
    val retired = root.resolve("." + victim.getFileName.toString + ".old")
    Files.move(victim, retired)

    // a fresh StreamIngest (restart) must restore the bucket
    val restarted = new StreamIngest(spark, WarehouseOptions(database = "cdb"), wh)
    assert(Files.exists(victim) && !Files.exists(retired))
    restarted.publish()
    assert(spark.sql("SELECT COUNT(*) FROM cdb").collect()(0).getLong(0) == 2L)
  }

  test("an all-filtered first batch does not poison the state directory") {
    val wh = tempDir("empty-wh")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "edb"), wh)
    val empty = ChangeFeed.fromLines(spark.createDataset(Seq.empty[String])(
      org.apache.spark.sql.Encoders.STRING).toDF("value"), "value")
    ingest.applyBatch(empty, 0L) // no rows -> no buckets land
    // the warehouse must still accept a real batch afterwards
    val real = ChangeFeed.fromLines(spark.createDataset(Seq(
      change(1, "a", """{"_id":"a","_rev":"1-r","name":"Ada","score":1}""")))(
      org.apache.spark.sql.Encoders.STRING).toDF("value"), "value")
    ingest.applyBatch(real, 1L)
    ingest.publish()
    assert(spark.sql("SELECT COUNT(*) FROM edb").collect()(0).getLong(0) == 1L)
  }

  test("restarting with a different bucket count fails loudly, not silently") {
    val wh = tempDir("buckets-wh")
    val ingest = new StreamIngest(spark, WarehouseOptions(database = "bdb"), wh)
    val batch = ChangeFeed.fromLines(spark.createDataset(Seq(
      change(1, "a", """{"_id":"a","_rev":"1-r","name":"Ada","score":1}""")))(
      org.apache.spark.sql.Encoders.STRING).toDF("value"), "value")
    ingest.applyBatch(batch, 0L)
    spark.conf.set("graft.state.buckets", "128")
    try {
      val e = intercept[IllegalStateException] {
        new StreamIngest(spark, WarehouseOptions(database = "bdb"), wh)
      }
      assert(e.getMessage.contains("bucket"))
    } finally spark.conf.unset("graft.state.buckets")
  }
}
