package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** JDBC upsert sink: the reference's SQL write targets re-expressed for
  * Spark's execution model.
  *
  * The reference streams each `_changes` batch into SQLite / PostgreSQL /
  * MySQL with per-document upserts and per-batch transactions
  * (`/root/reference/lib/sqlite.js:55-121`, `lib/postgresql.js:91`,
  * `lib/mysql.js:104`), plus a `couchwarehouse_checkpoints` side table
  * (`lib/sqlite.js:138-170`). Here the same contract is distributed:
  *
  *   - **Executor-parallel writes.** Each input partition opens its own
  *     connection and commits ONE transaction of batched statements. The
  *     upsert statement is DIALECT-NATIVE where the target has one —
  *     PostgreSQL `INSERT … ON CONFLICT (key) DO UPDATE` (reference
  *     `lib/postgresql.js:91`), MySQL/MariaDB `REPLACE INTO`
  *     (`lib/mysql.js:104`), SQLite `INSERT OR REPLACE`
  *     (`lib/sqlite.js:82`) — one statement per row-batch instead of two.
  *     Anything else (Derby, generic JDBC) falls back to the
  *     dialect-neutral `DELETE`-by-key + `INSERT` pair. With the
  *     warehouse's compacted tables (one row per id —
  *     [[graft.ops.Compact]]) every form is last-writer-wins.
  *   - **Idempotent, so replay-safe.** Re-upserting the same rows is a
  *     no-op; a failed/repeated micro-batch (streaming `foreachBatch`
  *     replay after crash) converges to the same table — the distributed
  *     stand-in for the reference's single-connection batch transaction.
  *   - **Deletes.** Rows flagged in a `deleted` column are applied as
  *     `DELETE`s (reference A11), everything else as upserts.
  *
  * Driver-side work is only DDL (create-if-missing via JDBC metadata) and
  * the checkpoint row; all row traffic flows executor→database in
  * parallel. At 100 TB the bottleneck is the database's ingest path, not
  * Spark: partition count = connection parallelism, `batchSize` = rows
  * per round trip.
  */
object JdbcUpsertSink {

  /** Spark→SQL type mapping extending the reference's three logical types
    * (`lib/schema.js:9-11`: string/number/boolean → TEXT/REAL/BOOLEAN)
    * with the integer/timestamp types the Spark warehouse carries.
    * VARCHAR over TEXT keeps Derby (no TEXT type) and MySQL index rules
    * happy; 4000 mirrors common row-size limits.
    */
  def sqlType(dt: DataType): String = dt match {
    case BooleanType                           => "BOOLEAN"
    case ByteType | ShortType | IntegerType
         | LongType                            => "BIGINT"
    case FloatType | DoubleType                => "DOUBLE"
    case _: DecimalType                        => "DOUBLE"
    case TimestampType                         => "TIMESTAMP"
    case DateType                              => "DATE"
    case _                                     => "VARCHAR(4000)"
  }

  /** `java.sql.Types` code per Spark type — strict JDBC drivers (Derby)
    * reject `setNull(i, Types.NULL)` and need the column's real code.
    */
  private def jdbcTypeCode(dt: DataType): Int = dt match {
    case BooleanType                           => java.sql.Types.BOOLEAN
    case ByteType | ShortType | IntegerType
         | LongType                            => java.sql.Types.BIGINT
    case FloatType | DoubleType
         | (_: DecimalType)                    => java.sql.Types.DOUBLE
    case TimestampType                         => java.sql.Types.TIMESTAMP
    case DateType                              => java.sql.Types.DATE
    case _                                     => java.sql.Types.VARCHAR
  }

  private val Ident = "[A-Za-z][A-Za-z0-9_]*".r

  private def checkIdent(name: String): String = name match {
    case Ident() => name
    case other   => throw new IllegalArgumentException(
      s"unsafe SQL identifier '$other' (sanitize first — graft.ops.Split.sanitize)")
  }

  /** The upsert statement for `url`'s dialect, plus whether it is NATIVE
    * (true → the statement alone replaces an existing row; false → the
    * caller must pre-DELETE by key, the neutral two-statement form).
    * Parameter order is always the column order of `cols`. Exposed for
    * spec assertion of the generated SQL.
    */
  private[graft] def upsertStatement(url: String, table: String,
                                     cols: Seq[String], keyCol: String): (String, Boolean) = {
    val tbl = checkIdent(table)
    val colList = cols.map(checkIdent).mkString(", ")
    val marks = cols.map(_ => "?").mkString(", ")
    val proto = url.toLowerCase(java.util.Locale.ROOT)
    if (proto.startsWith("jdbc:postgresql:")) {
      val nonKey = cols.filterNot(_ == keyCol).map(checkIdent)
      val action =
        if (nonKey.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " + nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      (s"INSERT INTO $tbl ($colList) VALUES ($marks) " +
        s"ON CONFLICT (${checkIdent(keyCol)}) $action", true)
    } else if (proto.startsWith("jdbc:mysql:") || proto.startsWith("jdbc:mariadb:"))
      (s"REPLACE INTO $tbl ($colList) VALUES ($marks)", true)
    else if (proto.startsWith("jdbc:sqlite:"))
      (s"INSERT OR REPLACE INTO $tbl ($colList) VALUES ($marks)", true)
    else
      (s"INSERT INTO $tbl ($colList) VALUES ($marks)", false)
  }

  private def connect(url: String, props: Map[String, String]): java.sql.Connection = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    java.sql.DriverManager.getConnection(url, p)
  }

  /** Create `table` for `schema` if it does not exist (checked via JDBC
    * metadata — dialect-neutral, unlike CREATE TABLE IF NOT EXISTS).
    * `keyCol` becomes the primary key, VARCHAR(255) for string keys so
    * index-length-limited targets accept it (reference
    * `lib/mysql.js:58-60`).
    */
  def ensureTable(url: String, table: String, schema: StructType, keyCol: String,
                  connProps: Map[String, String] = Map.empty): Unit = {
    val conn = connect(url, connProps)
    try ensureTableOn(conn, table, schema, keyCol) finally conn.close()
  }

  private def ensureTableOn(conn: java.sql.Connection, table: String,
                            schema: StructType, keyCol: String): Unit = {
    require(schema.fieldNames.contains(keyCol), s"key column $keyCol not in schema")
    if (storedTableName(conn, table).isEmpty) {
      val cols = schema.fields.map { f =>
        val t = if (f.name == keyCol && f.dataType == StringType) "VARCHAR(255)"
                else sqlType(f.dataType)
        val nn = if (f.name == keyCol) " NOT NULL" else ""
        s"${checkIdent(f.name)} $t$nn"
      }
      val ddl = s"CREATE TABLE ${checkIdent(table)} (${cols.mkString(", ")}, " +
        s"PRIMARY KEY (${checkIdent(keyCol)}))"
      val st = conn.createStatement()
      try st.executeUpdate(ddl) finally st.close()
    }
  }

  /** The connection's current (catalog, raw schema) — the scope every
    * metadata lookup must use: a same-named table in ANOTHER schema must
    * never satisfy a check (it would skip CREATE TABLE, or approve a
    * native upsert against a constraint the visible table lacks). Some
    * drivers don't support getSchema/getCatalog (pre-JDBC-4.1 drivers
    * raise AbstractMethodError, not SQLException); null means "unscoped",
    * the best that driver can do.
    */
  private def scopeOf(conn: java.sql.Connection): (String, String) = {
    val catalog = try conn.getCatalog catch {
      case _: java.sql.SQLException | _: AbstractMethodError => null
    }
    val schemaRaw = try conn.getSchema catch {
      case _: java.sql.SQLException | _: AbstractMethodError => null
    }
    (catalog, schemaRaw)
  }

  /** Escape `_`/`%` for a JDBC metadata PATTERN argument — a literal name
    * like app_data would otherwise also match appXdata, re-admitting the
    * cross-schema false positive.
    */
  private def escapePattern(md: java.sql.DatabaseMetaData, s: String): String = {
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
  }

  /** The stored-case name of `table` in the connection's current
    * catalog/schema (Derby uppercases, PG lowercases), or None when it
    * does not exist there. The lookup is scoped AND targeted: one pattern
    * query for this table, never a whole-database enumeration.
    */
  private def storedTableName(conn: java.sql.Connection,
                              table: String): Option[String] = {
    val md = conn.getMetaData
    val (catalog, schemaRaw) = scopeOf(conn)
    val schemaPat = Option(schemaRaw).map(escapePattern(md, _)).orNull
    val rs = md.getTables(catalog, schemaPat, escapePattern(md, table), Array("TABLE"))
    try {
      var name: Option[String] = None
      while (name.isEmpty && rs.next()) {
        val n = rs.getString("TABLE_NAME")
        if (n.equalsIgnoreCase(table)) name = Some(n)
      }
      // case-insensitive fallback: the stored case may differ from the
      // requested case, making the exact pattern miss (Derby: docs→DOCS)
      if (name.isEmpty) {
        val all = md.getTables(catalog, schemaPat, "%", Array("TABLE"))
        try {
          while (name.isEmpty && all.next()) {
            val n = all.getString("TABLE_NAME")
            if (n.equalsIgnoreCase(table)) name = Some(n)
          }
        } finally all.close()
      }
      name
    } finally rs.close()
  }

  /** True when `table` (in the connection's current catalog/schema) has a
    * primary key or unique index on EXACTLY `keyCol` — the precondition
    * for the dialect-native single-statement upsert. Without it, PG's ON
    * CONFLICT errors on every batch and MySQL/SQLite's REPLACE degrades
    * to plain INSERT (silent duplicate rows), so [[upsert]] checks this
    * and falls back to the neutral DELETE+INSERT pair on pre-existing
    * tables that lack the constraint.
    */
  private[graft] def hasUniqueKey(conn: java.sql.Connection, table: String,
                                  keyCol: String): Boolean =
    storedTableName(conn, table).exists { stored =>
      val md = conn.getMetaData
      val (catalog, schemaRaw) = scopeOf(conn)
      def groups(rs: java.sql.ResultSet, groupCol: String,
                 colCol: String): Map[String, Set[String]] =
        try {
          val m = scala.collection.mutable.Map.empty[String, Set[String]]
          while (rs.next()) {
            val g = Option(rs.getString(groupCol)).getOrElse("")
            Option(rs.getString(colCol)).foreach { c =>
              m(g) = m.getOrElse(g, Set.empty) + c.toLowerCase(java.util.Locale.ROOT)
            }
          }
          m.toMap
        } finally rs.close()
      val key = Set(keyCol.toLowerCase(java.util.Locale.ROOT))
      // getPrimaryKeys/getIndexInfo take literal names, not patterns —
      // pass the raw scope, no escaping
      val pk = groups(
        md.getPrimaryKeys(catalog, schemaRaw, stored), "PK_NAME", "COLUMN_NAME")
      pk.values.exists(_ == key) || {
        val idx = groups(
          md.getIndexInfo(catalog, schemaRaw, stored, /*unique=*/ true, /*approx=*/ false),
          "INDEX_NAME", "COLUMN_NAME")
        idx.values.exists(_ == key)
      }
    }

  /** Upsert `df` into `table` keyed on `keyCol` (last-writer-wins given
    * one row per key, e.g. [[graft.ops.Compact]] output). When
    * `deletedCol` is set, rows with that column true are DELETEd instead
    * of inserted (reference delete application, A11). One transaction of
    * batched statements per partition, executor-side.
    */
  def upsert(df: DataFrame, url: String, table: String, keyCol: String = "id",
             deletedCol: Option[String] = None,
             connProps: Map[String, String] = Map.empty,
             batchSize: Int = 500): Unit = {
    val dataSchema = StructType(df.schema.fields.filterNot(f => deletedCol.contains(f.name)))
    val cols = dataSchema.fieldNames
    val keyIdx = df.schema.fieldIndex(keyCol)
    val delIdx = deletedCol.map(df.schema.fieldIndex)
    val colIdx = cols.map(df.schema.fieldIndex)
    val colSqlType = dataSchema.fields.map(f => jdbcTypeCode(f.dataType))
    val tbl = checkIdent(table); val key = checkIdent(keyCol)
    val deleteSql = s"DELETE FROM $tbl WHERE $key = ?"
    val (dialectSql, dialectNative) = upsertStatement(url, table, cols.toSeq, keyCol)
    // ONE driver connection per call does both the create-if-missing and
    // the native-upsert precondition: the native statement needs a unique
    // constraint on the key, so a pre-existing table without one gets the
    // neutral two-statement form (ensureTable-created tables carry the PK)
    val nativeUpsert = {
      val conn = connect(url, connProps)
      try {
        ensureTableOn(conn, table, dataSchema, keyCol)
        dialectNative && hasUniqueKey(conn, table, keyCol)
      } finally conn.close()
    }
    val insertSql =
      if (nativeUpsert || !dialectNative) dialectSql
      else s"INSERT INTO $tbl (${cols.map(checkIdent).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = connect(url, connProps)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(deleteSql)
          val ins = conn.prepareStatement(insertSql)
          try {
            var pending = 0
            rows.foreach { r =>
              val isDelete = delIdx.exists(i => !r.isNullAt(i) && r.getBoolean(i))
              // native dialect: the insert statement replaces in place and
              // only tombstones need a DELETE; neutral fallback: delete old
              // row (if any) + insert fresh for every row
              if (isDelete || !nativeUpsert) {
                del.setObject(1, r.get(keyIdx))
                del.addBatch()
              }
              if (!isDelete) {
                colIdx.zipWithIndex.foreach { case (ri, pi) =>
                  val v = r.get(ri)
                  if (v == null) ins.setNull(pi + 1, colSqlType(pi))
                  else ins.setObject(pi + 1, v)
                }
                ins.addBatch()
              }
              pending += 1
              if (pending >= batchSize) {
                del.executeBatch(); ins.executeBatch(); pending = 0
              }
            }
            if (pending > 0) { del.executeBatch(); ins.executeBatch() }
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally { del.close(); ins.close() }
        } finally conn.close()
      }
    }
  }

  /** Upsert the per-table checkpoint row (reference
    * `couchwarehouse_checkpoints`, `lib/sqlite.js:138-170`): written AFTER
    * the data lands, so a crash between the two replays the batch —
    * convergent, because [[upsert]] is idempotent.
    */
  def writeCheckpoint(url: String, tablename: String, seq: Long,
                      connProps: Map[String, String] = Map.empty,
                      checkpointTable: String = "couchwarehouse_checkpoints"): Unit = {
    val schema = StructType(Seq(
      StructField("tablename", StringType, nullable = false),
      StructField("seq", LongType)))
    ensureTable(url, checkpointTable, schema, "tablename", connProps)
    val tbl = checkIdent(checkpointTable)
    val conn = connect(url, connProps)
    try {
      conn.setAutoCommit(false)
      val del = conn.prepareStatement(s"DELETE FROM $tbl WHERE tablename = ?")
      val ins = conn.prepareStatement(s"INSERT INTO $tbl (tablename, seq) VALUES (?, ?)")
      try {
        del.setString(1, tablename); del.executeUpdate()
        ins.setString(1, tablename); ins.setLong(2, seq); ins.executeUpdate()
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
      finally { del.close(); ins.close() }
    } finally conn.close()
  }

  /** A `foreachBatch` function for Structured Streaming: each micro-batch
    * upserts transactionally and then advances the checkpoint row — the
    * reference's per-batch transaction loop (A12) on Spark's replay
    * semantics.
    *
    * `seqCol` must name an INTEGRAL column (the source's numeric `seqNum`,
    * not the opaque string `seq` token "104-g1A…" — max() over those is
    * lexicographic nonsense). Validated up front: a wrong column fails the
    * first batch with a clear message instead of a ClassCastException
    * mid-stream.
    */
  def foreachBatchUpserter(url: String, table: String, keyCol: String = "id",
                           deletedCol: Option[String] = None,
                           seqCol: Option[String] = None,
                           connProps: Map[String, String] = Map.empty)
      : (DataFrame, Long) => Unit =
    CheckpointedUpsert.batchFn(
      b => upsert(b, url, table, keyCol, deletedCol, connProps),
      seq => writeCheckpoint(url, table, seq, connProps),
      seqCol)
}
