package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** In-JVM fake CouchDB / Elasticsearch endpoints for driving the HTTP
  * halves of the pipeline in tests ([[graft.sources.ChangesSpooler]],
  * [[graft.sinks.ElasticsearchSink]], the CLI's `--url`/`--es-url`
  * modes).
  */
object FakeHttp {

  private val mapper = new ObjectMapper()

  def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq).getOrElse(Seq.empty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
          case Array(k)    => k -> ""
        }
      }.toMap

  def seqNum(tok: String): Long = {
    val d = tok.takeWhile(_.isDigit)
    if (d.isEmpty) 0L else d.toLong
  }

  /** Minimal CouchDB `_changes` endpoint over an in-memory change list:
    * since/limit paging with `pending`, longpoll waits, and the
    * `_selector` filter evaluated with the SAME Mango evaluator the
    * engine uses (a server-side CouchDB behavior, so reusing it here is
    * the point, not a shortcut).
    */
  final class FakeCouch(initial: Seq[JsonNode]) {
    private val changes = new java.util.concurrent.CopyOnWriteArrayList[JsonNode]()
    initial.foreach(changes.add)
    private val lock = new Object

    /** Fail the next N requests with HTTP 500 (transient-outage injection). */
    val failNext = new java.util.concurrent.atomic.AtomicInteger(0)

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
      if (failNext.getAndUpdate(n => math.max(n - 1, 0)) > 0) {
        respond(ex, 500, """{"error":"injected_outage"}"""); return
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

      // Real-CouchDB semantics: the selector is evaluated against the raw
      // change doc — INCLUDING the {_id,_rev,_deleted:true} stub of a
      // deletion (which a plain user selector does not match; the spooler
      // must wrap with $or:{_deleted:true} to keep tombstones). The feed
      // scans until `limit` MATCHES are found or the feed ends; last_seq
      // is the last change SCANNED (not matched), so a non-matching tail
      // still advances the client's since token, and pending counts the
      // changes after last_seq.
      def page(): (Seq[JsonNode], String, Long) = {
        val after = changes.asScala.toSeq.filter(c => seqNum(c.get("seq").asText) > seqNum(since))
        def matches(c: JsonNode): Boolean = selector.forall(s =>
          Option(c.get("doc")).exists(d => graft.ops.Mango.evalDoc(s, d)))
        var scanned = 0
        val hits = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
        while (scanned < after.size && hits.size < limit) {
          val c = after(scanned); scanned += 1
          if (matches(c)) hits += c
        }
        val lastSeq =
          if (scanned > 0) after(scanned - 1).get("seq").asText else since
        (hits.toSeq, lastSeq, (after.size - scanned).toLong)
      }

      var (results, lastSeq, pending) = page()
      if (results.isEmpty && longpoll) {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        while (results.isEmpty && System.nanoTime() < deadline) {
          lock.synchronized(lock.wait(50))
          val pg = page(); results = pg._1; lastSeq = pg._2; pending = pg._3
        }
      }
      // one result per line — the exact CouchDB wire shape ChangesReader scans
      val body = "{\"results\":[\n" + results.map(_.toString).mkString(",\n") +
        "\n],\n\"last_seq\":\"" + lastSeq + "\",\"pending\":" + pending + "}"
      respond(ex, 200, body)
    }

    def stop(): Unit = server.stop(0)
  }

  /** Minimal ES endpoint: `_bulk` NDJSON (index/delete) + `_doc` GET/PUT. */
  final class FakeEs {
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
}
