package graft.sinks

import java.sql.{Connection, PreparedStatement}

import graft.model.Jdbc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The JDBC consume-side sink (SURVEY §3.3; reference
  * `debezium-connector-jdbc/src/main/java/io/debezium/connector/jdbc/
  * JdbcChangeEventSink.java` + `JdbcSinkConnectorConfig.java:52-76`):
  * change events apply to a relational target with per-dialect DML
  * (`SqlDialects`), configured by the reference's own key names —
  * `insert.mode` (insert|upsert|update), `delete.enabled`,
  * `truncate.enabled`, `primary.key.mode` (record_key|record_value|none),
  * `primary.key.fields`, `schema.evolution` (none|basic),
  * `use.reduction.buffer`, `quote.identifiers`.
  *
  * Spark shape (the 100 TB story): events repartition by key and sort by
  * source position within partitions, so each target row's history applies
  * in order on exactly one executor; every partition holds its own JDBC
  * connection (the reference's per-task Hibernate session) and batches
  * consecutive same-statement runs via `addBatch`. Nothing rows-shaped
  * touches the driver — the driver only runs DDL (create/alter), exactly
  * like the reference sink task does at schema-change boundaries.
  *
  * Live execution target is embedded Derby (the same vehicle as the K7
  * JDBC stores); the four production dialect shapes are pinned by oracle in
  * `k_jdbc_sink_dialects`.
  */
object JdbcChangeEventSink {

  final case class Config(
      url: String,
      dialect: String = "derby",
      insertMode: String = "upsert",
      deleteEnabled: Boolean = false,
      truncateEnabled: Boolean = false,
      primaryKeyMode: String = "record_key",
      primaryKeyFields: Seq[String] = Nil,
      schemaEvolution: String = "basic",
      useReductionBuffer: Boolean = false,
      quoteIdentifiers: Boolean = false,
      fieldIncludeList: String = "",
      fieldExcludeList: String = "") {
    /** Sink-side field filter (ref FieldFilterFactory); key fields are
      * never filtered — only value columns are subject to the lists.
      */
    def fieldFilter: FieldFilters.FieldNameFilter =
      FieldFilters.forLists(fieldIncludeList, fieldExcludeList)
  }

  /** Reference-keyed properties → Config (`JdbcSinkConnectorConfig.java`
    * key constants; composes with `graft.EngineConfig` sink-side).
    */
  def fromProps(props: Map[String, String]): Config = Config(
    url = props.getOrElse("connection.url",
      throw new IllegalArgumentException("connection.url is required")),
    dialect = props.getOrElse("dialect", "derby"),
    insertMode = props.getOrElse("insert.mode", "insert"),
    deleteEnabled = props.get("delete.enabled").exists(_.toBoolean),
    truncateEnabled = props.get("truncate.enabled").exists(_.toBoolean),
    primaryKeyMode = props.getOrElse("primary.key.mode", "none"),
    primaryKeyFields = props.get("primary.key.fields").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
    schemaEvolution = props.getOrElse("schema.evolution", "none"),
    useReductionBuffer = props.get("use.reduction.buffer").exists(_.toBoolean),
    quoteIdentifiers = props.get("quote.identifiers").exists(_.toBoolean),
    fieldIncludeList = props.getOrElse("field.include.list", ""),
    fieldExcludeList = props.getOrElse("field.exclude.list", ""))

  /** Key column names per `primary.key.mode` (ref
    * `JdbcSinkConnectorConfig.PrimaryKeyMode` + `JdbcKafkaSinkRecord`
    * keyFieldNames resolution).
    */
  def keyFieldsFor(envelope: DataFrame, cfg: Config): Seq[String] =
    cfg.primaryKeyMode match {
      case "record_key" =>
        envelope.schema("key").dataType.asInstanceOf[StructType].fieldNames.toSeq
      case "record_value" =>
        require(cfg.primaryKeyFields.nonEmpty,
          "primary.key.fields is required for primary.key.mode=record_value")
        cfg.primaryKeyFields
      case "none" =>
        require(cfg.insertMode == "insert",
          s"primary.key.mode=none supports insert.mode=insert only")
        Nil
      case other =>
        throw new IllegalArgumentException(s"unsupported primary.key.mode '$other'")
    }

  private def payloadSchema(envelope: DataFrame): StructType =
    envelope.schema("after").dataType.asInstanceOf[StructType]

  /** Driver-side DDL: create the target (schema.evolution=basic) or verify
    * it exists (none); align columns by ALTER ADD for any payload fields
    * the live table is missing (ref `JdbcChangeEventSink.checkAndApply
    * TableChanges`).
    */
  def ensureTable(cfg: Config, table: String, payload: StructType,
                  pk: Seq[String]): Unit = {
    val d = SqlDialects.forName(cfg.dialect)
    val conn = Jdbc.connect(cfg.url)
    try {
      val meta = conn.getMetaData
      val existing = {
        val rs = meta.getColumns(null, null, table.toUpperCase, null)
        val b = Seq.newBuilder[String]
        while (rs.next()) b += rs.getString("COLUMN_NAME").toLowerCase
        rs.close()
        b.result()
      }
      val cols = payload.fields.toSeq.map(f =>
        (f.name, d.sqlType(f.dataType), f.nullable && !pk.contains(f.name)))
      if (existing.isEmpty) {
        if (cfg.schemaEvolution != "basic")
          throw new IllegalStateException(
            s"table $table does not exist and schema.evolution=${cfg.schemaEvolution}")
        conn.createStatement().execute(d.createTable(table, cols, pk))
      } else {
        val missing = cols.filterNot { case (n, _, _) => existing.contains(n.toLowerCase) }
        if (missing.nonEmpty) {
          if (cfg.schemaEvolution != "basic")
            throw new IllegalStateException(
              s"table $table is missing columns ${missing.map(_._1)} and " +
                s"schema.evolution=${cfg.schemaEvolution}")
          // evolved columns are always nullable on the target (existing rows)
          d.alterStatements(table, missing.map { case (n, t, _) => (n, t, true) })
            .foreach(conn.createStatement().execute(_))
          conn.commit()
        }
      }
    } finally {
      conn.commit() // metadata reads open a tx under autoCommit=false
      conn.close()
    }
  }

  /** Apply an envelope feed to the target table. `numPartitions` bounds the
    * per-key shuffle AND the JDBC connection count (the reference's
    * `tasks.max` analogue).
    */
  def write(envelope: DataFrame, table: String, cfg: Config,
            numPartitions: Int = 8): Unit = {
    val keyFields = keyFieldsFor(envelope, cfg)
    val filter = cfg.fieldFilter
    // field.include.list / field.exclude.list apply to value columns;
    // key fields always pass (they identify the target row)
    val payload = StructType(payloadSchema(envelope).fields.filter(f =>
      keyFields.contains(f.name) || filter(table, f.name)))
    val nonKey = payload.fieldNames.toSeq.filterNot(keyFields.contains)
    ensureTable(cfg, table, payload, keyFields)

    // ReducedRecordBuffer (ref ReducedRecordBuffer.java): only each key's
    // latest event reaches the target — one statement per key per flush
    val ordered0 = envelope.withColumn("__pos", col("source.pos"))
    val ordered =
      if (!cfg.useReductionBuffer) ordered0
      else {
        val w = Window.partitionBy(keyFields.map(f => col(s"key.`$f`")): _*)
          .orderBy(col("__pos").desc)
        ordered0.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }

    // one executor owns each key's full ordered history
    val routed =
      if (keyFields.isEmpty) ordered.repartition(numPartitions)
      else ordered
        .repartition(numPartitions, keyFields.map(f => col(s"key.`$f`")): _*)
        .sortWithinPartitions(col("__pos"))

    val url = cfg.url
    val dialectName = cfg.dialect
    val insertMode = cfg.insertMode
    val deleteEnabled = cfg.deleteEnabled
    val truncateEnabled = cfg.truncateEnabled
    val kf = keyFields
    val nk = nonKey
    val flat = routed.select(
      col("op") +:
        kf.map(f => col(s"key.`$f`").as(s"__k_$f")) ++:
        payload.fieldNames.toSeq.map(f => col(s"after.`$f`").as(s"__v_$f")): _*)

    flat.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val d = SqlDialects.forName(dialectName)
        val conn = Jdbc.connect(url) // autoCommit already off
        try {
          val exec = new PartitionWriter(conn, d, table, kf, nk,
            insertMode, deleteEnabled, truncateEnabled)
          rows.foreach(exec.apply)
          exec.flush()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** One partition's statement executor: prepared statements are built
    * once, consecutive same-statement runs batch via `addBatch` (ref
    * `DefaultRecordWriter.java` batch accumulation), and the Derby
    * update+insert upsert pair executes row-wise because it needs the
    * update count.
    */
  private final class PartitionWriter(conn: Connection, d: SqlDialect,
                                      table: String, kf: Seq[String], nk: Seq[String],
                                      insertMode: String, deleteEnabled: Boolean,
                                      truncateEnabled: Boolean) extends Serializable {
    private val stmts = scala.collection.mutable.Map.empty[String, PreparedStatement]
    private var batched: PreparedStatement = null
    private var batchedSql: String = null
    // buffered rows of the two-statement (Derby) upsert path: the UPDATE
    // half executes as ONE batch whose per-row counts select which rows
    // fall through to the INSERT batch — 2 round trips per run instead of
    // 2 per row. A key recurring inside the buffer forces a flush first
    // (its INSERT must land before the later event's UPDATE can match).
    private val pairBuf =
      scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Seq[Any])]
    private val pairKeys = scala.collection.mutable.HashSet.empty[Seq[Any]]
    private var pairSql: Array[String] = null

    private def prep(sql: String): PreparedStatement =
      stmts.getOrElseUpdate(sql, conn.prepareStatement(sql))

    private def flushPairs(): Unit = {
      if (pairBuf.nonEmpty) {
        val Array(upd, ins) = pairSql
        val ups = prep(upd)
        pairBuf.foreach { case (keyVals, valVals) =>
          bindVals(ups, valVals ++ keyVals); ups.addBatch()
        }
        val counts = ups.executeBatch()
        val misses = pairBuf.zip(counts).collect { case (row, 0) => row }
        if (misses.nonEmpty) {
          val ips = prep(ins)
          misses.foreach { case (keyVals, valVals) =>
            bindVals(ips, keyVals ++ valVals); ips.addBatch()
          }
          ips.executeBatch()
        }
        pairBuf.clear(); pairKeys.clear()
      }
    }

    def flush(): Unit = {
      flushPairs()
      if (batched != null) batched.executeBatch()
      batched = null; batchedSql = null
    }

    private def addToBatch(sql: String, bind: PreparedStatement => Unit): Unit = {
      flushPairs() // statement-kind change ends a pair run
      if (batchedSql != null && batchedSql != sql) flush()
      val ps = prep(sql)
      bind(ps)
      ps.addBatch()
      batched = ps; batchedSql = sql
    }

    private def bindVals(ps: PreparedStatement, vals: Seq[Any]): Unit =
      vals.zipWithIndex.foreach { case (v, i) =>
        val jdbcVal = v match {
          // Derby predates JDBC-4.2 java.time binding — down-convert
          case ldt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(ldt)
          case ld: java.time.LocalDate      => java.sql.Date.valueOf(ld)
          case inst: java.time.Instant      => java.sql.Timestamp.from(inst)
          case other                        => other
        }
        ps.setObject(i + 1, jdbcVal)
      }

    def apply(r: Row): Unit = {
      val op = r.getString(r.fieldIndex("op"))
      val keyVals = kf.map(f => r.get(r.fieldIndex(s"__k_$f")))
      def valVals(names: Seq[String]) = names.map(f => r.get(r.fieldIndex(s"__v_$f")))
      op match {
        case "t" =>
          if (truncateEnabled) { flush(); prep(d.truncate(table)).execute() }
        case "d" | "x" =>
          if (deleteEnabled) {
            require(kf.nonEmpty, "delete.enabled requires a primary key mode with keys")
            addToBatch(d.delete(table, kf), bindVals(_, keyVals))
          }
        case _ =>
          insertMode match {
            case "insert" =>
              addToBatch(d.insert(table, kf, nk),
                bindVals(_, keyVals ++ valVals(nk)))
            case "update" =>
              addToBatch(d.update(table, kf, nk),
                bindVals(_, valVals(nk) ++ keyVals))
            case "upsert" =>
              d.upsert(table, kf, nk).split("\n") match {
                case Array(single) =>
                  addToBatch(single, bindVals(_, keyVals ++ valVals(nk)))
                case pair @ Array(_, _) => // Derby pair: buffered, see flushPairs
                  if (batched != null) flush()
                  if (pairKeys.contains(keyVals)) flushPairs()
                  pairSql = pair
                  pairBuf += ((keyVals, valVals(nk)))
                  pairKeys += keyVals
                  if (pairBuf.size >= 1000) flushPairs()
              }
            case other =>
              throw new IllegalArgumentException(s"unsupported insert.mode '$other'")
          }
      }
    }
  }

  /** Declarative read-back of a sink target (verification path). */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  // --- exactly-once streaming (the MergeSink epoch contract on a JDBC
  //     target): upsert/delete statements are idempotent, so at-least-once
  //     redelivery inside a batch is harmless; the epoch table makes a
  //     WHOLE replayed foreachBatch a no-op, which together gives
  //     exactly-once effective state ---

  private def ensureEpochTable(conn: Connection): Unit =
    try {
      conn.createStatement().execute(
        "CREATE TABLE graft_sink_epochs (sink VARCHAR(128), epoch BIGINT)")
      conn.commit()
    } catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => // exists
    }

  /** Newest committed epoch for `sinkName`, if any. */
  def committedEpoch(cfg: Config, sinkName: String): Option[Long] = {
    val conn = Jdbc.connect(cfg.url)
    try {
      ensureEpochTable(conn)
      val ps = conn.prepareStatement(
        "SELECT MAX(epoch) FROM graft_sink_epochs WHERE sink = ?")
      ps.setString(1, sinkName)
      val rs = ps.executeQuery()
      val out = if (rs.next() && rs.getObject(1) != null)
        Some(rs.getLong(1)) else None
      rs.close()
      out
    } finally { conn.commit(); conn.close() }
  }

  /** Epoch-guarded write for `foreachBatch`: a batch whose epoch is ≤ the
    * committed epoch (a Structured Streaming retry/replay) is skipped with
    * a visible warning; otherwise the batch applies and the epoch commits.
    * Returns whether the batch was applied.
    */
  def writeEpoch(envelope: DataFrame, table: String, cfg: Config,
                 epochId: Long, numPartitions: Int = 8): Boolean =
    committedEpoch(cfg, table) match {
      case Some(c) if epochId <= c =>
        System.err.println(s"[graft] jdbc sink $table: skipping epoch " +
          s"$epochId — already committed through $c")
        false
      case _ =>
        write(envelope, table, cfg, numPartitions)
        val conn = Jdbc.connect(cfg.url)
        try {
          val ps = conn.prepareStatement(
            "INSERT INTO graft_sink_epochs (sink, epoch) VALUES (?, ?)")
          ps.setString(1, table); ps.setLong(2, epochId)
          ps.executeUpdate()
          conn.commit()
        } finally conn.close()
        true
    }
}
