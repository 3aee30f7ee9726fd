package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.tools.CouchWarehouseCli
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The reference's headline workflow end-to-end through the CLI: a live
  * CouchDB URL in (`--url`, spooled over HTTP), warehouse tables built,
  * Elasticsearch out (`--es-url`) — `bin/couchwarehouse.bin.js` with
  * `databaseType=elasticsearch`, no mocks inside the engine.
  */
class CliSpec extends SparkSpec {

  test("CLI: --url spools over HTTP, builds the warehouse, exports to Elasticsearch") {
    val mapper = new ObjectMapper()
    val sampleChanges = mapper
      .readTree(new java.io.File("/root/reference/test/samplechanges.txt"))
      .get("results").elements().asScala.toSeq
    val couch = new FakeHttp.FakeCouch(sampleChanges)
    val es = new FakeHttp.FakeEs
    val spool = Files.createTempDirectory("cli-spool").toString
    try {
      spark // init the shared session first so the CLI reuses (and keeps) it
      CouchWarehouseCli.main(Array(
        "--url", couch.url, "--database", "sampledata",
        "--spool-dir", spool, "--es-url", es.url))
      assert(new java.io.File(spool).listFiles().nonEmpty, "spool dir has chunks")
      assert(es.store.asScala.count(_._1.startsWith("sampledata/")) == 99,
        "99 golden docs exported")
      assert(graft.sinks.ElasticsearchSink.getCheckpoint(es.url, "sampledata")
        .contains(104L))
      assert(!spark.sparkContext.isStopped, "embedded run must not stop the session")
    } finally { couch.stop(); es.stop() }
  }
}
