package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** HTTP `_changes` spooler — the ingestion half of the reference's spool /
  * monitor loop (`/root/reference/index.js:75-170`) that the DSv2 source
  * deliberately leaves out: it fetches the CouchDB changes feed over HTTP
  * and appends each non-empty response body VERBATIM as one
  * monotonically-named chunk file in a spool directory.
  *
  * The chunk dir is the handoff point where the single-writer HTTP world
  * ends and distributed Spark begins: `spark.read.format("couch-changes")
  * .load(spoolDir)` (batch, A1) or `spark.readStream` (micro-batch, A2)
  * parse the chunks executor-parallel. CouchDB emits one change object per
  * line inside the `results` array, which is exactly the line shape
  * [[ChangesReader]] scans — writing the body untouched loses nothing and
  * re-serializes nothing.
  *
  * Fidelity to the reference:
  *   - `spool(since)` = one catch-up pass in `limit`-sized pages
  *     (`index.js:75-140`); returns the final seq token for checkpointing.
  *   - `monitor(since)` = repeated longpoll requests (`index.js:143-170`),
  *     until [[stop]] — the same loop `changesreader.start` runs.
  *   - `pauseMillis` paces page fetches (reference slow mode,
  *     `index.js:93-100`: non-SQLite targets force `opts.slow = true`).
  *   - a Mango `selector` is pushed to the server via `filter=_selector`
  *     (`index.js:102-104`) — rows the warehouse would drop never cross
  *     the network.
  *
  * Chunks are written to a temp name and atomically renamed into place:
  * the streaming source lists the directory concurrently and must never
  * see a half-written file. File names embed a zero-padded monotone index
  * so the lexicographic sort both sources use IS arrival order.
  *
  * At 100 TB the spooler is not the bottleneck by design: it only moves
  * bytes (no parsing beyond the envelope head), while all per-change work
  * happens in the executors reading the chunk dir. Multiple databases
  * spool to sibling dirs in parallel; one feed is inherently serial
  * (CouchDB hands out changes in seq order).
  */
final class ChangesSpooler(
    couchUrl: String,
    database: String,
    spoolDir: String,
    batchSize: Int = 10000,
    selector: Option[String] = None,
    pauseMillis: Long = 0L,
    longpollTimeoutMillis: Long = 55000L,
    maxRetries: Int = 3,
    retryBackoffMillis: Long = 500L,
    client: HttpClient = HttpClient.newHttpClient(),
    onProgress: String => Unit = _ => ()) {

  private val mapper = new ObjectMapper()
  @volatile private var stopped = false

  /** One progress line per spooled page — the reference's progress bar
    * ("20% 27.7s", `index.js:82-86`, `README.md:40`) as a callback line:
    * percentage from the server's `pending` count, elapsed, and a simple
    * rate-based ETA. `pending` < 0 (CouchDB < 2.0 omits it) renders `?%`.
    */
  private def progressLine(total: Long, pending: Long, startNanos: Long,
                           seq: String): String = {
    val elapsed = (System.nanoTime() - startNanos) / 1e9
    val pct =
      if (pending >= 0 && total + pending > 0)
        (100.0 * total / (total + pending)).round.toString + "%"
      else "?%"
    val eta =
      if (pending > 0 && total > 0) f", eta ${elapsed * pending / total}%.1fs"
      else ""
    f"spooled $total changes ($pct, $elapsed%.1fs$eta) seq=${seq.take(24)}"
  }

  /** Ask a running [[monitor]] loop to exit after its in-flight request —
    * the reference's `couchwarehouse.stop()` (`index.js:173-178`).
    */
  def stop(): Unit = stopped = true

  private def changesUri(since: String, longpoll: Boolean): URI = {
    val params = Seq(
      "include_docs=true",
      s"limit=$batchSize",
      "since=" + java.net.URLEncoder.encode(since, "UTF-8")) ++
      (if (longpoll) Seq("feed=longpoll", s"timeout=$longpollTimeoutMillis") else Nil) ++
      (if (selector.isDefined) Seq("filter=_selector") else Nil)
    URI.create(
      s"${couchUrl.stripSuffix("/")}/$database/_changes?${params.mkString("&")}")
  }

  private def request(since: String, longpoll: Boolean): HttpRequest = {
    val b = HttpRequest.newBuilder(changesUri(since, longpoll))
    (selector match {
      // CouchDB's _selector filter takes the selector in a POST body. The
      // user selector is wrapped in $or with {"_deleted": true} because
      // the server evaluates it against the deleted-doc stub too — an
      // unwrapped selector would silently drop every tombstone and
      // deletes would never reach the warehouse. This is the server-side
      // mirror of the reader-side rule "tombstones always pass the
      // selector" (CouchChangesSource accept()).
      case Some(sel) => b.header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"""{"selector":{"$$or":[$sel,{"_deleted":true}]}}"""))
      case None => b.GET()
    }).build()
  }

  /** Next chunk index = max existing index + 1, so a restarted spooler
    * appends instead of overwriting (chunks are immutable once renamed).
    * Stale `.tmp` staging files from a crashed previous run are removed —
    * readers never see them (both source listings skip dot-files), and
    * the next write of that index replaces them anyway.
    */
  private def nextChunkIndex(): Int = {
    val dir = new java.io.File(spoolDir)
    if (!dir.isDirectory) { dir.mkdirs(); 0 }
    else {
      dir.listFiles().filter(f => f.getName.startsWith(".chunk-") &&
        f.getName.endsWith(".tmp")).foreach(_.delete())
      val Chunk = "chunk-(\\d+)\\.json".r
      dir.listFiles().map(_.getName).collect { case Chunk(n) => n.toInt }
        .foldLeft(-1)(math.max) + 1
    }
  }

  private def writeChunk(index: Int, body: String): Path = {
    val target = Paths.get(spoolDir, f"chunk-$index%06d.json")
    val tmp = Paths.get(spoolDir, f".chunk-$index%06d.json.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    target
  }

  /** One page: fetch, spool if non-empty, return (results, lastSeq,
    * pending). `pending` is -1 when the server omits it (CouchDB < 2.0).
    *
    * Transient failures (connection refused/reset, 5xx, timeouts) are
    * retried with linear backoff — a multi-hour 100 TB spool must survive
    * a network blip, and re-requesting the same `since` page is safe:
    * nothing was written for the failed attempt, so the chunk sequence
    * has no gap. 4xx responses are NOT retried (a bad database name or
    * selector never heals).
    */
  private def fetchPage(since: String, longpoll: Boolean,
                        chunkIndex: Int): (Int, String, Long) = {
    var attempt = 0
    var resp: HttpResponse[String] = null
    var lastErr: Exception = null
    while (resp == null && attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(retryBackoffMillis * attempt)
      try {
        val r = client.send(request(since, longpoll),
          HttpResponse.BodyHandlers.ofString())
        if (r.statusCode() / 100 == 5)
          lastErr = new java.io.IOException(
            s"_changes returned HTTP ${r.statusCode()}: ${r.body().take(300)}")
        else resp = r
      } catch {
        case e: java.io.IOException => lastErr = e
        case e: InterruptedException => throw e
      }
      attempt += 1
    }
    if (resp == null)
      throw new java.io.IOException(
        s"_changes failed after $maxRetries retries: ${lastErr.getMessage}", lastErr)
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"_changes returned HTTP ${resp.statusCode()}: ${resp.body().take(300)}")
    val body = resp.body()
    val root = mapper.readTree(body)
    val n = Option(root.get("results")).map(_.size()).getOrElse(0)
    val lastSeq = Option(root.get("last_seq")).map(_.asText).getOrElse(since)
    val pending = Option(root.get("pending")).map(_.asLong(-1L)).getOrElse(-1L)
    if (n > 0) writeChunk(chunkIndex, body)
    (n, lastSeq, pending)
  }

  /** Catch-up pass: page through the feed from `since` until the server
    * reports nothing pending (or a short page, for servers without the
    * `pending` field). Returns the seq token to resume from — the caller's
    * checkpoint (kept OUT of the spool dir, which holds only chunks).
    */
  def spool(since: String = "0"): String = {
    var seq = since
    var idx = nextChunkIndex()
    var more = true
    val t0 = System.nanoTime()
    var total = 0L
    while (more && !stopped) {
      val (n, lastSeq, pending) = fetchPage(seq, longpoll = false, idx)
      if (n > 0) {
        idx += 1; total += n
        onProgress(progressLine(total, pending, t0, lastSeq))
      }
      // no-progress guard: an empty page that didn't advance the seq can
      // never make progress on a retry — stop regardless of what the
      // server claims is pending (guards against a buggy/filtered
      // pending count turning this loop into a zero-delay hot spin)
      more = (if (pending >= 0) pending > 0 else n >= batchSize) &&
        !(n == 0 && lastSeq == seq)
      seq = lastSeq
      if (more && pauseMillis > 0) Thread.sleep(pauseMillis)
    }
    seq
  }

  /** Longpoll monitor loop from `since` until [[stop]] (or `maxBatches`
    * non-empty batches, for bounded runs/tests). Each longpoll returns as
    * soon as a change lands or the server timeout passes (empty page —
    * nothing written). Returns the last seen seq token.
    */
  def monitor(since: String, maxBatches: Int = Int.MaxValue): String = {
    var seq = since
    var idx = nextChunkIndex()
    var batches = 0
    val t0 = System.nanoTime()
    var total = 0L
    while (!stopped && batches < maxBatches) {
      val (n, lastSeq, pending) = fetchPage(seq, longpoll = true, idx)
      if (n > 0) {
        idx += 1; batches += 1; total += n
        onProgress(progressLine(total, pending, t0, lastSeq))
      }
      seq = lastSeq
      if (pauseMillis > 0) Thread.sleep(pauseMillis)
    }
    seq
  }
}
