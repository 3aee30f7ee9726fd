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

  /** JSON-encode one row as an ES source document: scalars in their JSON
    * natural form, arrays/structs/maps as real JSON containers, binary as
    * base64 (the ES `binary` field convention), temporal values as
    * ISO-8601 instants (`strict_date_optional_time`-compatible).
    */
  private def jsonValue(v: Any, dt: DataType): com.fasterxml.jackson.databind.JsonNode = {
    val nodes = mapper.getNodeFactory
    if (v == null) nodes.nullNode()
    else dt match {
      case BooleanType    => nodes.booleanNode(v.asInstanceOf[Boolean])
      case ByteType       => nodes.numberNode(v.asInstanceOf[Byte].toInt)
      case ShortType      => nodes.numberNode(v.asInstanceOf[Short].toInt)
      case IntegerType    => nodes.numberNode(v.asInstanceOf[Int])
      case LongType       => nodes.numberNode(v.asInstanceOf[Long])
      case FloatType      => nodes.numberNode(v.asInstanceOf[Float])
      case DoubleType     => nodes.numberNode(v.asInstanceOf[Double])
      case _: DecimalType => nodes.numberNode(v.asInstanceOf[java.math.BigDecimal])
      case BinaryType     => nodes.textNode(
        java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
      case TimestampType  => nodes.textNode(
        v.asInstanceOf[java.sql.Timestamp].toInstant.toString)
      case DateType       => nodes.textNode(v.toString)
      case ArrayType(et, _) =>
        val arr = nodes.arrayNode()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(e => arr.add(jsonValue(e, et)))
        arr
      case MapType(_, vt, _) =>
        val o = nodes.objectNode()
        v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, mv) =>
          o.set[com.fasterxml.jackson.databind.JsonNode](
            String.valueOf(k), jsonValue(mv, vt))
          ()
        }
        o
      case st: StructType =>
        val o = nodes.objectNode()
        val r = v.asInstanceOf[Row]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          o.set[com.fasterxml.jackson.databind.JsonNode](
            f.name, jsonValue(if (r.isNullAt(i)) null else r.get(i), f.dataType))
          ()
        }
        o
      case _ => nodes.textNode(String.valueOf(v))
    }
  }

  private def sourceJson(row: Row, fields: Array[(String, Int, DataType)]): String = {
    val o: ObjectNode = mapper.createObjectNode()
    fields.foreach { case (name, i, dt) =>
      o.set[com.fasterxml.jackson.databind.JsonNode](
        name, jsonValue(if (row.isNullAt(i)) null else row.get(i), dt))
      ()
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
    resp.statusCode() match {
      case 200 => Option(mapper.readTree(resp.body()).get("_source"))
        .flatMap(s => Option(s.get("seq"))).map(_.asLong())
      case 404 => None
      // a transient 5xx must NOT read as "no checkpoint" — that would
      // silently restart ingestion from seq 0
      case other => throw new java.io.IOException(
        s"checkpoint GET returned HTTP $other: ${resp.body().take(300)}")
    }
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
      : (DataFrame, Long) => Unit =
    CheckpointedUpsert.batchFn(
      b => bulkUpsert(b, esUrl, index, keyCol, deletedCol),
      seq => writeCheckpoint(esUrl, index, seq),
      seqCol)
}
