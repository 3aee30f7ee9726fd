package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Elasticsearch bulk sink: the reference's ES target
  * (`/root/reference/lib/elasticsearch.js`) re-expressed for Spark's
  * execution model, speaking the public `_bulk` NDJSON protocol directly
  * over HTTP — no client library needed.
  *
  * Reference parity:
  *   - deleted changes become `{"delete":{...}}` actions, live docs become
  *     `{"index":{...}}` + source pairs (`lib/elasticsearch.js:16-44`);
  *   - the document id is carried as the ES `_id` and stripped from the
  *     source body, as are revision/attachment columns
  *     (`lib/elasticsearch.js:31-33` deletes `_id`/`_rev`/`_attachments`);
  *   - a per-table checkpoint doc lands in the `couchwarehousemeta` index
  *     (`lib/elasticsearch.js:52-76`) — one doc per table, `_id` = the
  *     table name, in the modern typeless mapping of the same contract.
  *
  * Distribution: each input partition POSTs its own `batchSize`-action
  * `_bulk` bodies — executor-parallel, nothing routes through the driver.
  * Indexing by explicit `_id` makes replays idempotent (same contract as
  * [[JdbcUpsertSink]]): a repeated micro-batch converges instead of
  * duplicating. At 100 TB the bottleneck is the ES ingest path, not
  * Spark — partition count = connection parallelism, `batchSize` = actions
  * per round trip, both knobs.
  */
object ElasticsearchSink {

  private val mapper = new ObjectMapper()

  /** One shared client per executor JVM (HttpClient is thread-safe). */
  private lazy val client: HttpClient = HttpClient.newHttpClient()

  /** JSON-encode one row as an ES source document. Column types map to
    * their JSON natural form; temporal values serialize ISO-8601 via
    * toString (the ES default date formats accept both).
    */
  private def sourceJson(row: Row, fields: Array[(String, Int, DataType)]): String = {
    val o: ObjectNode = mapper.createObjectNode()
    fields.foreach { case (name, i, dt) =>
      if (row.isNullAt(i)) o.putNull(name)
      else dt match {
        case BooleanType             => o.put(name, row.getBoolean(i))
        case ByteType                => o.put(name, row.getByte(i).toInt)
        case ShortType               => o.put(name, row.getShort(i).toInt)
        case IntegerType             => o.put(name, row.getInt(i))
        case LongType                => o.put(name, row.getLong(i))
        case FloatType               => o.put(name, row.getFloat(i))
        case DoubleType              => o.put(name, row.getDouble(i))
        case _: DecimalType          => o.put(name, row.getDecimal(i))
        case _                       => o.put(name, String.valueOf(row.get(i)))
      }
    }
    mapper.writeValueAsString(o)
  }

  private def jsonString(s: String): String = mapper.writeValueAsString(s)

  /** POST one `_bulk` body; throw with the first item error if the
    * response flags any (HTTP 200 with `"errors":true` is how ES reports
    * per-action failures).
    */
  private def postBulk(cl: HttpClient, esUrl: String, body: String): Unit = {
    val req = HttpRequest.newBuilder(URI.create(s"${esUrl.stripSuffix("/")}/_bulk"))
      .header("Content-Type", "application/x-ndjson")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = cl.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"_bulk returned HTTP ${resp.statusCode()}: ${resp.body().take(300)}")
    val root = mapper.readTree(resp.body())
    if (Option(root.get("errors")).exists(_.asBoolean(false))) {
      import scala.jdk.CollectionConverters._
      val firstErr = Option(root.get("items")).toSeq
        .flatMap(_.elements().asScala)
        .flatMap(item => item.elements().asScala)
        .flatMap(act => Option(act.get("error")))
        .headOption.map(_.toString).getOrElse("unknown")
      throw new java.io.IOException(s"_bulk reported item errors: $firstErr")
    }
  }

  /** Bulk-upsert `df` into `index`, keyed on `keyCol`. Rows whose
    * `deletedCol` is true are emitted as delete actions (reference A11);
    * `excludeCols` (plus `keyCol` and `deletedCol`) are stripped from the
    * source body, mirroring the reference's `_id`/`_rev`/`_attachments`
    * removal.
    */
  def bulkUpsert(df: DataFrame, esUrl: String, index: String = "couchwarehouse",
                 keyCol: String = "id", deletedCol: Option[String] = None,
                 excludeCols: Set[String] = Set("rev"),
                 batchSize: Int = 500): Unit = {
    require(df.schema.fieldNames.contains(keyCol), s"key column $keyCol not in schema")
    val keyIdx = df.schema.fieldIndex(keyCol)
    val delIdx = deletedCol.map(df.schema.fieldIndex)
    val drop = excludeCols + keyCol ++ deletedCol
    val fields = df.schema.fields.zipWithIndex
      .collect { case (f, i) if !drop(f.name) => (f.name, i, f.dataType) }
    df.foreachPartition { (rows: Iterator[Row]) =>
      val sb = new StringBuilder
      var pending = 0
      def flush(): Unit = if (pending > 0) {
        postBulk(client, esUrl, sb.result()); sb.clear(); pending = 0
      }
      rows.foreach { r =>
        val id = jsonString(String.valueOf(r.get(keyIdx)))
        val isDelete = delIdx.exists(i => !r.isNullAt(i) && r.getBoolean(i))
        if (isDelete)
          sb.append(s"""{"delete":{"_index":${jsonString(index)},"_id":$id}}""").append('\n')
        else {
          sb.append(s"""{"index":{"_index":${jsonString(index)},"_id":$id}}""").append('\n')
          sb.append(sourceJson(r, fields)).append('\n')
        }
        pending += 1
        if (pending >= batchSize) flush()
      }
      flush()
    }
  }

  /** Upsert the per-table checkpoint doc, written AFTER the data lands so
    * a crash between the two replays the (idempotent) batch — the same
    * convergence contract as [[JdbcUpsertSink.writeCheckpoint]].
    */
  def writeCheckpoint(esUrl: String, tablename: String, seq: Long,
                      metaIndex: String = "couchwarehousemeta"): Unit = {
    val req = HttpRequest.newBuilder(
        URI.create(s"${esUrl.stripSuffix("/")}/$metaIndex/_doc/" +
          java.net.URLEncoder.encode(tablename, "UTF-8")))
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(s"""{"seq":$seq}"""))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"checkpoint PUT returned HTTP ${resp.statusCode()}: ${resp.body().take(300)}")
  }

  /** Read a table's checkpoint back (reference
    * `lib/elasticsearch.js:65-76`): None when absent — the caller resumes
    * from seq 0 like the reference's `|| '0'`.
    */
  def getCheckpoint(esUrl: String, tablename: String,
                    metaIndex: String = "couchwarehousemeta"): Option[Long] = {
    val req = HttpRequest.newBuilder(
        URI.create(s"${esUrl.stripSuffix("/")}/$metaIndex/_doc/" +
          java.net.URLEncoder.encode(tablename, "UTF-8")))
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) None
    else Option(mapper.readTree(resp.body()).get("_source"))
      .flatMap(s => Option(s.get("seq"))).map(_.asLong())
  }

  /** A `foreachBatch` function for Structured Streaming: bulk-upsert each
    * micro-batch, then advance the checkpoint doc — the reference's
    * per-batch loop (`index.js:148-166`) on Spark's replay semantics.
    * `seqCol` must be an integral column (the numeric `seqNum`, not the
    * opaque string seq token).
    */
  def foreachBatchUpserter(esUrl: String, index: String,
                           keyCol: String = "id",
                           deletedCol: Option[String] = None,
                           seqCol: Option[String] = None)
      : (DataFrame, Long) => Unit = { (batch, _) =>
    val b = batch.cache()
    try {
      seqCol.foreach { c =>
        val dt = b.schema(c).dataType
        require(dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType,
          s"seqCol '$c' is $dt; it must be an integral sequence number")
      }
      bulkUpsert(b, esUrl, index, keyCol, deletedCol)
      seqCol.foreach { c =>
        import org.apache.spark.sql.functions.{col, max}
        val r = b.agg(max(col(c).cast(LongType))).collect()(0)
        if (!r.isNullAt(0)) writeCheckpoint(esUrl, index, r.getLong(0))
      }
    } finally { b.unpersist(); () }
  }
}
