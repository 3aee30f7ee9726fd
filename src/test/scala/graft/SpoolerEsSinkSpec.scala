package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sinks.ElasticsearchSink
import graft.sources.ChangesSpooler
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** End-to-end coverage for the two HTTP endpoints of the pipeline:
  * [[ChangesSpooler]] (fake CouchDB `_changes` server → chunk dir → DSv2
  * source → warehouse) and [[ElasticsearchSink]] (warehouse → fake ES
  * `_bulk` server), mirroring the reference's ingest and ES-target halves
  * (`/root/reference/index.js:75-170`, `lib/elasticsearch.js`).
  */
class SpoolerEsSinkSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixtures = "/root/reference/test"

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq).getOrElse(Seq.empty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
          case Array(k)    => k -> ""
        }
      }.toMap

  private def seqNum(tok: String): Long = {
    val d = tok.takeWhile(_.isDigit)
    if (d.isEmpty) 0L else d.toLong
  }

  /** Minimal CouchDB `_changes` endpoint over an in-memory change list:
    * since/limit paging with `pending`, longpoll waits, and the
    * `_selector` filter evaluated with the SAME Mango evaluator the
    * engine uses (a server-side CouchDB behavior, so reusing it here is
    * the point, not a shortcut).
    */
  private final class FakeCouch(initial: Seq[JsonNode]) {
    private val changes = new java.util.concurrent.CopyOnWriteArrayList[JsonNode]()
    initial.foreach(changes.add)
    private val lock = new Object

    def append(change: JsonNode): Unit = {
      changes.add(change)
      lock.synchronized(lock.notifyAll())
    }

    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/", (ex: HttpExchange) => {
      try handle(ex)
      catch { case e: Exception => respond(ex, 500, s"""{"error":"${e.getMessage}"}""") }
    })
    server.start()

    def url: String = s"http://localhost:${server.getAddress.getPort}"

    private def handle(ex: HttpExchange): Unit = {
      if (!ex.getRequestURI.getPath.endsWith("/_changes")) {
        respond(ex, 404, """{"error":"not_found"}"""); return
      }
      val p = queryParams(ex)
      val since = p.getOrElse("since", "0")
      val limit = p.get("limit").map(_.toInt).getOrElse(Int.MaxValue)
      val longpoll = p.get("feed").contains("longpoll")
      val timeoutMs = p.get("timeout").map(_.toLong).getOrElse(60000L)
      val selector = if (p.get("filter").contains("_selector")) {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        Some(graft.ops.Mango.parse(
          mapper.readTree(body).get("selector").toString))
      } else None

      def page(): (Seq[JsonNode], Long) = {
        val after = changes.asScala.toSeq.filter(c => seqNum(c.get("seq").asText) > seqNum(since))
        val matching = after.filter { c =>
          val deleted = Option(c.get("deleted")).exists(_.asBoolean(false))
          deleted || selector.forall(s =>
            Option(c.get("doc")).exists(d => graft.ops.Mango.evalDoc(s, d)))
        }
        (matching.take(limit), (after.size - math.min(matching.size, limit)).toLong)
      }

      var (results, pending) = page()
      if (results.isEmpty && longpoll) {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        while (results.isEmpty && System.nanoTime() < deadline) {
          lock.synchronized(lock.wait(50))
          val pg = page(); results = pg._1; pending = pg._2
        }
      }
      val lastSeq = results.lastOption.map(_.get("seq").asText).getOrElse(since)
      // one result per line — the exact CouchDB wire shape ChangesReader scans
      val body = "{\"results\":[\n" + results.map(_.toString).mkString(",\n") +
        "\n],\n\"last_seq\":\"" + lastSeq + "\",\"pending\":" + pending + "}"
      respond(ex, 200, body)
    }

    def stop(): Unit = server.stop(0)
  }

  /** Minimal ES endpoint: `_bulk` NDJSON (index/delete) + `_doc` GET/PUT. */
  private final class FakeEs {
    val store = new java.util.concurrent.ConcurrentHashMap[String, JsonNode]()
    @volatile var bulkPosts = 0

    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/", (ex: HttpExchange) => {
      try handle(ex)
      catch { case e: Exception => respond(ex, 500, s"""{"error":"${e.getMessage}"}""") }
    })
    server.start()

    def url: String = s"http://localhost:${server.getAddress.getPort}"
    private def key(index: String, id: String) = s"$index/$id"

    private def handle(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("POST", "/_bulk") =>
          bulkPosts += 1
          val lines = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            .split("\n").filter(_.nonEmpty).iterator
          while (lines.hasNext) {
            val action = mapper.readTree(lines.next())
            if (action.has("index")) {
              val meta = action.get("index")
              store.put(key(meta.get("_index").asText, meta.get("_id").asText),
                mapper.readTree(lines.next()))
            } else if (action.has("delete")) {
              val meta = action.get("delete")
              store.remove(key(meta.get("_index").asText, meta.get("_id").asText))
            }
          }
          respond(ex, 200, """{"took":1,"errors":false,"items":[]}""")
        case (m, p) if p.contains("/_doc/") =>
          val Array(index, id) = p.stripPrefix("/").split("/_doc/", 2)
          m match {
            case "PUT" =>
              store.put(key(index, id),
                mapper.readTree(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)))
              respond(ex, 200, """{"result":"updated"}""")
            case "GET" => Option(store.get(key(index, id))) match {
              case Some(doc) => respond(ex, 200,
                s"""{"_index":"$index","_id":"$id","found":true,"_source":${doc.toString}}""")
              case None => respond(ex, 404, """{"found":false}""")
            }
            case _ => respond(ex, 405, "{}")
          }
        case _ => respond(ex, 404, """{"error":"not_found"}""")
      }
    }

    def stop(): Unit = server.stop(0)
  }

  private lazy val sampleChanges: Seq[JsonNode] =
    mapper.readTree(new java.io.File(s"$fixtures/samplechanges.txt"))
      .get("results").elements().asScala.toSeq

  test("spooler: pages the full feed into chunks; warehouse replays to the 99 golden rows") {
    val couch = new FakeCouch(sampleChanges)
    val spool = tempDir("spool")
    try {
      val sp = new ChangesSpooler(couch.url, "sampledata", spool, batchSize = 30)
      val seq = sp.spool("0")
      assert(seqNum(seq) == 104L, s"final seq token $seq")
      val chunks = new java.io.File(spool).listFiles().map(_.getName).sorted
      assert(chunks.length == 4, s"100 changes / 30 per page -> 4 chunks, got ${chunks.toSeq}")
      assert(chunks.forall(_.matches("chunk-\\d{6}\\.json")))

      val w = Warehouse.start(spark, spool, WarehouseOptions(database = "spooled"))
      assert(w.query("SELECT COUNT(*) AS n FROM spooled").collect()(0).getLong(0) == 99L)
      assert(w.checkpoint == 104L)

      // resuming from the returned checkpoint finds nothing and writes nothing
      assert(sp.spool(seq) == seq)
      assert(new java.io.File(spool).listFiles().length == 4)
    } finally couch.stop()
  }

  test("spooler: Mango selector is pushed to the server via filter=_selector") {
    val couch = new FakeCouch(sampleChanges)
    val spool = tempDir("spool-sel")
    try {
      val sel = """{"age":{"$gt":30}}"""
      new ChangesSpooler(couch.url, "sampledata", spool, batchSize = 1000,
        selector = Some(sel)).spool("0")
      val parsed = graft.ops.Mango.parse(sel)
      val expected = sampleChanges.count { c =>
        val deleted = Option(c.get("deleted")).exists(_.asBoolean(false))
        deleted || Option(c.get("doc")).exists(d => graft.ops.Mango.evalDoc(parsed, d))
      }
      val n = spark.read.format("couch-changes").load(spool).count()
      assert(n == expected && n < 100, s"server-filtered feed: $n of 100")
    } finally couch.stop()
  }

  test("spooler: monitor longpolls — drains an immediate change, then one arriving mid-poll") {
    val couch = new FakeCouch(sampleChanges)
    val spool = tempDir("spool-mon")
    try {
      val sp = new ChangesSpooler(couch.url, "sampledata", spool, batchSize = 1000,
        longpollTimeoutMillis = 2000)
      val seq = sp.spool("0")

      // change already waiting: the longpoll returns immediately
      couch.append(mapper.readTree(
        """{"seq":"105-x","id":"zzz1","changes":[{"rev":"1-r"}],"doc":{"_id":"zzz1","_rev":"1-r","name":"Live One","age":50,"verified":true,"description":"d","address":{"street":"s","location":{"long":0.1,"lat":0.2}},"tags":["a"]}}"""))
      val seq2 = sp.monitor(seq, maxBatches = 1)
      assert(seqNum(seq2) == 105L)

      // change arriving while the longpoll is parked
      val fut = scala.concurrent.Future(sp.monitor(seq2, maxBatches = 1))(
        scala.concurrent.ExecutionContext.global)
      Thread.sleep(300)
      couch.append(mapper.readTree(
        """{"seq":"106-x","id":"zzz2","changes":[{"rev":"1-r"}],"doc":{"_id":"zzz2","_rev":"1-r","name":"Live Two","age":51,"verified":false,"description":"d","address":{"street":"s","location":{"long":0.3,"lat":0.4}},"tags":["b"]}}"""))
      val seq3 = scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration(20, "s"))
      assert(seqNum(seq3) == 106L)

      val w = Warehouse.start(spark, spool, WarehouseOptions(database = "monitored"))
      assert(w.query("SELECT COUNT(*) AS n FROM monitored").collect()(0).getLong(0) == 101L)
      assert(w.checkpoint == 106L)
    } finally couch.stop()
  }

  test("ES sink: warehouse export lands 99 docs, strips id/rev from source, checkpoints") {
    val es = new FakeEs
    try {
      val w = Warehouse.start(spark, s"$fixtures/samplechanges.txt",
        WarehouseOptions(database = "sampledata"))
      w.exportElasticsearch("sampledata", es.url, "couchwarehouse")
      val docs = es.store.asScala.filter(_._1.startsWith("couchwarehouse/"))
      assert(docs.size == 99, s"expected 99 indexed docs, got ${docs.size}")
      val one = w.query("SELECT id, name, age FROM sampledata LIMIT 1").collect()(0)
      val src = es.store.get(s"couchwarehouse/${one.getString(0)}")
      assert(src.get("name").asText == one.getString(1))
      assert(math.abs(src.get("age").asDouble - one.getDouble(2)) < 1e-9)
      // reference parity: _id/_rev never appear in the source body
      assert(!src.has("id") && !src.has("rev"))
      assert(ElasticsearchSink.getCheckpoint(es.url, "couchwarehouse").contains(104L))
    } finally es.stop()
  }

  test("ES sink: deletes remove docs; small batches flush repeatedly; bad seqCol fails fast") {
    val es = new FakeEs
    try {
      import spark.implicits._
      val df = (1 to 25).map(i => (s"doc$i", s"v$i", false)).toDF("id", "val", "deleted")
      ElasticsearchSink.bulkUpsert(df, es.url, "t", deletedCol = Some("deleted"),
        batchSize = 7)
      assert(es.store.asScala.count(_._1.startsWith("t/")) == 25)
      assert(es.bulkPosts > 1, "batchSize=7 over 25 rows must flush more than once")

      // tombstone for doc3 + replay of doc4 (idempotent overwrite)
      val upd = Seq(("doc3", null.asInstanceOf[String], true), ("doc4", "v4b", false))
        .toDF("id", "val", "deleted")
      ElasticsearchSink.bulkUpsert(upd, es.url, "t", deletedCol = Some("deleted"))
      assert(!es.store.containsKey("t/doc3"))
      assert(es.store.get("t/doc4").get("val").asText == "v4b")

      val withSeq = Seq(("a", 7L)).toDF("id", "seqNum")
      ElasticsearchSink.foreachBatchUpserter(es.url, "t2", seqCol = Some("seqNum"))(withSeq, 0L)
      assert(ElasticsearchSink.getCheckpoint(es.url, "t2").contains(7L))

      val badSeq = Seq(("a", "7-tok")).toDF("id", "seq")
      val e = intercept[IllegalArgumentException] {
        ElasticsearchSink.foreachBatchUpserter(es.url, "t3", seqCol = Some("seq"))(badSeq, 0L)
      }
      assert(e.getMessage.contains("integral"))
    } finally es.stop()
  }
}
