package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.IncrementalSnapshot
import graft.tools.WireFixtures

/** SURVEY S8/S9 — real wire-protocol decoders, fixture-driven: recorded
  * pgoutput / binlog BYTE streams (committed under
  * `src/main/resources/graft/fixtures/`) decoded by the binary parsers in
  * `graft.sources.wire` and driven end-to-end through the DSv2
  * change-log source into the bucketed MERGE sink. The fixture data is
  * formula-derived, so every oracle below reconstructs the expected
  * output independently in DuckDB from `range()` — the decoders are
  * checked against the documented protocol semantics, not against
  * themselves.
  */
object WireQueries extends QueryGroup {

  /** Copy a classpath fixture into a fresh wire directory under a
    * committed segment name (count baked in, as the DSv2 writer would).
    */
  private def stageFixture(resource: String, ext: String, count: Long): String = {
    val dir = Files.createTempDirectory("graft-wirefix").toString
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$resource")
    require(in != null, s"fixture $resource not on classpath")
    val bytes = try in.readAllBytes() finally in.close()
    Files.write(Paths.get(dir,
      f"part-g${1L}%012d-b-p${0}%05d-n$count.$ext"), bytes)
    dir
  }

  /** Copy a classpath fixture verbatim into a temp file (for decoders
    * that read the recording directly rather than via the DSv2 source).
    */
  private def stageResource(resource: String): String = {
    val dir = Files.createTempDirectory("graft-wirefix")
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$resource")
    require(in != null, s"fixture $resource not on classpath")
    val bytes = try in.readAllBytes() finally in.close()
    val f = dir.resolve(resource)
    Files.write(f, bytes)
    f.toString
  }

  private def wireSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("qty", LongType),
    StructField("label", StringType)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S8: recorded pgoutput frames → binary decode inside the DSv2
    // source's partition reader → wire rows (batch read path)
    "s8_pgoutput_decode" -> ((s, _) => {
      val dir = stageFixture("pgoutput_segment.pgo", "pgo",
        WireFixtures.pgoutputRowCount)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S8 end-to-end: pgoutput fixture tailed as a STREAM through the
    // DSv2 source, decoded per-segment in executors, parsed to a typed
    // envelope and merged into the bucketed sink — recorded bytes to
    // queryable latest-state table with no JDBC connection anywhere
    "s8_pgoutput_materialize" -> ((s, _) => {
      val dir = stageFixture("pgoutput_segment.pgo", "pgo",
        WireFixtures.pgoutputRowCount)
      val sink = new graft.streaming.BucketedMergeSink(
        Files.createTempDirectory("pgo-sink").toString, buckets = 8)
      val ckpt = Files.createTempDirectory("pgo-ckpt").toString
      val q = s.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          val env = batch
            .filter(col("table") === "public.cdc_items" &&
              col("op").isin("c", "u", "d"))
            .select(
              from_json(col("key_json"), StructType(Seq(
                StructField("id", IntegerType)))).as("key"),
              lit(null).cast(wireSchema).as("before"),
              from_json(col("payload_json"), wireSchema).as("after"),
              col("op"), struct(col("pos")).as("source"),
              lit(null).cast("string").as("transaction"),
              col("pos").as("ts_ms"))
          sink.merge(env, epochId): Unit
        }
        .start()
      q.awaitTermination()
      sink.view(s)
    }),

    // S8 binary-format subscriptions (pg14 `binary = true`): tuple
    // columns arrive as the types' send() wire bytes — bool, int2/int8,
    // float8, numeric (base-10000), text, bytea, date, timestamp, uuid
    // all decode to typed JSON per the Relation's type OIDs
    "s8_pgoutput_binary_decode" -> ((s, _) => {
      val dir = stageFixture("pgoutput_binary.pgo", "pgo",
        WireFixtures.pgoutputBinaryRowCount)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S8 second decode path: recorded decoderbufs protobuf RowMessages
    // (pg_logicaldec.proto — ref `pgproto/PgProtoMessageDecoder.java`)
    // decoded through the in-repo protobuf wire codec into the same
    // envelope rows as pgoutput; covers int32/int64/string datums,
    // datum_missing (TOAST), bool, double, Point, BEGIN/COMMIT skip and
    // the old_tuple replica-identity key on update/delete
    "s8_pgproto_decode" -> ((s, _) => {
      val dir = stageFixture("pgproto_segment.pbo", "pbo",
        WireFixtures.pgprotoRowCount)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S8 over a REAL SOCKET: the same WAL served by the loopback
    // fixture postmaster (graft.tools.PgWireServer) and streamed by the
    // live replication client — v3 startup with replication=database,
    // START_REPLICATION over CopyBoth, XLogData/keepalive frames — then
    // through the standard DSv2 transport. Same oracle as
    // s8_pgoutput_decode: the socket path must be invisible in the data.
    "s8_pgoutput_socket_stream" -> ((s, _) => {
      val frames = graft.sources.wire.PgOutput
        .readSegmentFrames(graft.tools.WireFixtures.pgoutputSegment).toSeq
      val (port, _, _) = graft.tools.PgWireServer.serve(frames)
      val seg = graft.sources.net.PgReplicationClient.fetchSegment(
        "127.0.0.1", port, "graft", "testdb", "s1", "pub")
      val n = graft.sources.wire.PgOutput.segmentRows(seg).size
      val dir = Files.createTempDirectory("pgo-socket").toString
      Files.write(Paths.get(dir,
        f"part-g${1L}%012d-b-p${0}%05d-n$n.pgo"), seg)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S8 protocol v2: STREAMED in-progress transactions (pg14
    // streaming=on) — interleaved S..E chunks with xid-tagged data
    // messages, decoded to tx-attributed events in executors and
    // released through TxReassembly's buffered-commit semantics:
    // stream-committed tx 601 emits with its commit LSN, stream-aborted
    // tx 602 never emits. Goes beyond the reference decoder, which
    // requires streaming=off.
    "s8_pgoutput_tx_stream" -> ((s, _) => {
      import s.implicits._
      val dir = stageFixture("pgoutput_streamed.pgo", "pgo",
        WireFixtures.pgoutputStreamedRowCount)
      val events = s.read.format("binaryFile").load(dir)
        .select(col("content")).as[Array[Byte]]
        .flatMap(bytes => graft.sources.wire.PgOutput.segmentTxEvents(bytes)
          .map { case (tx, r) => (tx, r.op, r.pos, r.keyJson) })
        .toDF("txId", "op", "pos", "key_json")
        .select(col("txId"),
          coalesce(get_json_object(col("key_json"), "$.id").cast("long"),
            lit(-1L)).as("k"),
          col("op"), col("pos"))
      val transport = Files.createTempDirectory("pgo-txstream").toString
      events.repartitionByRange(3, col("pos"))
        .sortWithinPartitions(col("pos"))
        .select(col("txId"), col("k"), col("op"), col("pos"))
        .write.mode("overwrite").parquet(transport)
      graft.streaming.StreamingMaterialize.stampLogOrder(transport)
      graft.streaming.TxReassembly.runOnTransport(s, transport,
        filesPerTrigger = 2)
        .select(col("txId").as("tx_id"), col("k"), col("op"), col("pos"),
          col("commitPos").as("commit_pos"))
    }),

    // S11: recorded poll of a SQL Server CDC change table
    // (cdc.fn_cdc_get_all_changes_<capture> shape): one shuffle groups
    // the update before/after pair, mask bits drive the changed-column
    // list and the max-type unavailable-value substitution, and binary
    // LSNs render to the canonical 8:8:2 hex form
    "s11_cdc_tables_decode" -> ((s, _) => {
      val path = stageResource("sqlserver_ct.jsonl")
      val ctSchema = StructType(Seq(
        StructField("__$start_lsn", StringType),
        StructField("__$seqval", StringType),
        StructField("__$operation", IntegerType),
        StructField("__$update_mask", StringType),
        StructField("id", IntegerType), StructField("name", StringType),
        StructField("price", DoubleType), StructField("notes", StringType)))
      val ct = s.read.schema(ctSchema).json(path)
        .select(
          unbase64(col("`__$start_lsn`")).as("__$start_lsn"),
          unbase64(col("`__$seqval`")).as("__$seqval"),
          col("`__$operation`").as("__$operation"),
          unbase64(col("`__$update_mask`")).as("__$update_mask"),
          col("id"), col("name"), col("price"), col("notes"))
      graft.sources.wire.SqlServerCdc
        .decode(ct, "dbo.products", Seq("id"), maxTypeCols = Seq("notes"))
        .withColumn("changed_cols", array_join(col("changed_cols"), ","))
    }),

    // S11 over a REAL SOCKET: the same change table served by the
    // loopback fixture SQL Server (graft.tools.MsSqlWireServer) and
    // polled by the live TDS client — PRELOGIN, LOGIN7 with verified
    // password obfuscation, fn_cdc_get_max_lsn, then the reference's
    // fn_cdc_get_all_changes windows as SQLBatch round trips (the
    // server evaluates the @from_lsn/@to_lsn hex literals) — then
    // rendered back to the recording shape and decoded identically.
    // Same oracle as s11_cdc_tables_decode: the wire is invisible.
    "s11_cdc_socket_poll" -> ((s, _) => {
      import graft.serde.Bson
      import graft.tools.MsSqlWireServer._
      import graft.tools.WireFixtures.sqlServerLsn
      val b64 = java.util.Base64.getDecoder
      val cols = Seq(Col("__$start_lsn", TVarBinary),
        Col("__$seqval", TVarBinary), Col("__$operation", TIntN),
        Col("__$update_mask", TVarBinary), Col("id", TIntN),
        Col("name", TVarChar), Col("price", TFltN),
        Col("notes", TVarChar))
      val rows: Seq[Row] = WireFixtures.sqlServerCtJsonl.linesIterator
        .map { line =>
          val doc = Bson.parseJson(line).asInstanceOf[Bson.BDoc]
          cols.map { c =>
            doc.get(c.name).get match {
              case Bson.BNull => None
              case Bson.BStr(v) if c.tpe == TVarBinary =>
                Some(b64.decode(v))
              case Bson.BStr(v) => Some(v)
              case Bson.BInt64(v) => Some(v.toInt)
              case Bson.BDouble(v) => Some(v)
              case other => throw new IllegalArgumentException(s"$other")
            }
          }
        }.toSeq
      val (port, _, _) = serve(cols, rows, password = "cdc-pass")
      val conn = graft.sources.net.SqlServerTdsClient.connect(
        "127.0.0.1", port, "cdc_reader", "cdc-pass", "testdb")
      val jsonl = try {
        val hi = graft.sources.net.SqlServerTdsClient.maxLsn(conn)
        val windows = Seq(
          sqlServerLsn(0, 0, 0) -> sqlServerLsn(0x25, 0x1ff, 0xffff),
          sqlServerLsn(0x25, 0x200, 0) -> sqlServerLsn(0x25, 0x2ff, 0xffff),
          sqlServerLsn(0x25, 0x300, 0) -> hi)
        windows.map { case (from, to) =>
          val (meta, fetched) = graft.sources.net.SqlServerTdsClient
            .pollChanges(conn, "dbo_products", from, to)
          graft.sources.net.SqlServerTdsClient.rowsToJsonl(meta, fetched)
        }.mkString
      } finally conn.close()
      val dir = Files.createTempDirectory("ct-socket")
      val f = dir.resolve("poll.jsonl")
      Files.write(f, jsonl.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val ctSchema = StructType(Seq(
        StructField("__$start_lsn", StringType),
        StructField("__$seqval", StringType),
        StructField("__$operation", IntegerType),
        StructField("__$update_mask", StringType),
        StructField("id", IntegerType), StructField("name", StringType),
        StructField("price", DoubleType), StructField("notes", StringType)))
      val ct = s.read.schema(ctSchema).json(f.toString)
        .select(
          unbase64(col("`__$start_lsn`")).as("__$start_lsn"),
          unbase64(col("`__$seqval`")).as("__$seqval"),
          col("`__$operation`").as("__$operation"),
          unbase64(col("`__$update_mask`")).as("__$update_mask"),
          col("id"), col("name"), col("price"), col("notes"))
      graft.sources.wire.SqlServerCdc
        .decode(ct, "dbo.products", Seq("id"), maxTypeCols = Seq("notes"))
        .withColumn("changed_cols", array_join(col("changed_cols"), ","))
    }),

    // S11 end-to-end, the POLL-source shape: three successive LSN-window
    // polls of the change table each decode DECLARATIVELY and append to
    // the change-log transport via the DSv2 WRITE path; the wire dir
    // then streams into the bucketed sink, and T22 reselect refills the
    // max-type unavailable placeholders from the insert-phase images —
    // poll → decode → transport → merge → reselect, no JDBC anywhere
    "s11_cdc_poll_stream" -> ((s, _) => {
      import graft.sources.wire.SqlServerCdc
      import graft.tools.WireFixtures.sqlServerLsn
      val path = stageResource("sqlserver_ct.jsonl")
      val ctSchema = StructType(Seq(
        StructField("__$start_lsn", StringType),
        StructField("__$seqval", StringType),
        StructField("__$operation", IntegerType),
        StructField("__$update_mask", StringType),
        StructField("id", IntegerType), StructField("name", StringType),
        StructField("price", DoubleType), StructField("notes", StringType)))
      val ct = s.read.schema(ctSchema).json(path)
        .select(
          unbase64(col("`__$start_lsn`")).as("__$start_lsn"),
          unbase64(col("`__$seqval`")).as("__$seqval"),
          col("`__$operation`").as("__$operation"),
          unbase64(col("`__$update_mask`")).as("__$update_mask"),
          col("id"), col("name"), col("price"), col("notes"))
      val wireDir = Files.createTempDirectory("ct-wire").toString
      def poll(from: Array[Byte], to: Array[Byte]): Unit =
        SqlServerCdc.decode(SqlServerCdc.pollWindow(ct, from, to),
          "dbo.products", Seq("id"), maxTypeCols = Seq("notes"))
          .select(col("table"), col("op"),
            // total order from the LSN pair: commit block, row, slot
            (conv(substring(col("commit_lsn"), 10, 8), 16, 10).cast("long")
              * (1L << 24) +
              conv(substring(col("seqval"), 10, 8), 16, 10).cast("long") * 256L +
              conv(substring(col("seqval"), 19, 4), 16, 10).cast("long"))
              .as("pos"),
            col("key_json"),
            coalesce(col("after_json"), lit("null")).as("payload_json"))
          .write.format(classOf[graft.sources.v2.ChangeLogSource].getName)
          .option("path", wireDir).mode("append").save()
      poll(sqlServerLsn(0, 0, 0), sqlServerLsn(0x25, 0x1ff, 0xffff))
      poll(sqlServerLsn(0x25, 0x1ff, 0xffff), sqlServerLsn(0x25, 0x2ff, 0xffff))
      poll(sqlServerLsn(0x25, 0x2ff, 0xffff), sqlServerLsn(0x25, 0x3ff, 0xffff))
      val rowSchema = StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType),
        StructField("price", DoubleType), StructField("notes", StringType)))
      val sink = new graft.streaming.BucketedMergeSink(
        Files.createTempDirectory("ct-sink").toString, buckets = 8)
      val ckpt = Files.createTempDirectory("ct-ckpt").toString
      val q = s.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", wireDir).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          val env = batch.select(
            from_json(col("key_json"), StructType(Seq(
              StructField("id", IntegerType)))).as("key"),
            lit(null).cast(rowSchema).as("before"),
            from_json(col("payload_json"), rowSchema).as("after"),
            col("op"), struct(col("pos")).as("source"),
            lit(null).cast("string").as("transaction"),
            col("pos").as("ts_ms"))
          sink.merge(env, epochId): Unit
        }
        .start()
      q.awaitTermination()
      val inserts = ct.filter(col("`__$operation`") === 2)
        .select(col("id"), col("notes"))
      graft.operators.Transforms.reselectColumns(
        sink.view(s), inserts, "id", Seq("notes"))
    }),

    // S10: recorded V$LOGMNR_CONTENTS poll → committed change events.
    // CSF chunks regroup declaratively, partial rollbacks cancel via
    // anti-join, only committed txs emit (commit SCN attached), and the
    // redo-SQL text parses per-row in executors
    "s10_logminer_decode" -> ((s, _) => {
      val path = stageResource("logminer_contents.jsonl")
      val schema = StructType(Seq(
        StructField("rownum", LongType), StructField("scn", LongType),
        StructField("opcode", IntegerType), StructField("xid", StringType),
        StructField("csf", IntegerType), StructField("rbk", IntegerType),
        StructField("row_id", StringType), StructField("rs_id", StringType),
        StructField("seg_owner", StringType),
        StructField("table_name", StringType),
        StructField("sql_redo", StringType)))
      graft.sources.wire.LogMiner.decode(
        s.read.schema(schema).json(path),
        schemas = Map(
          "ORA.PRODUCTS" -> Seq(
            "ID" -> "long", "NAME" -> "string", "PRICE" -> "double",
            "CREATED" -> "timestamp"),
          "ORA.NOTES" -> Seq(
            "ID" -> "long", "TITLE" -> "string", "BODY" -> "string"),
          "ORA.FILES" -> Seq("ID" -> "long", "DATA" -> "string"),
          "ORA.PAGES" -> Seq("ID" -> "long", "XDOC" -> "string"),
          "ORA.MEMOS" -> Seq("ID" -> "long", "BODY" -> "string")),
        keys = Map("ORA.PRODUCTS" -> Seq("ID"),
          "ORA.NOTES" -> Seq("ID"), "ORA.FILES" -> Seq("ID"),
          "ORA.PAGES" -> Seq("ID"), "ORA.MEMOS" -> Seq("ID")),
        lobEnabled = true)
    }),

    // S12: recorded MongoDB change-stream cursor (JSONL): pure-column
    // get_json_object extraction, split-event fragments reassembled by
    // ONE groupBy on the resume-token position prefix, reference op
    // mapping (insert→c, update/replace→u, delete→d), collection-level
    // events filtered exactly as the server-side pipeline does
    "s12_change_stream_decode" -> ((s, _) => {
      val path = stageResource("mongo_changestream.jsonl")
      graft.sources.wire.MongoChangeStream.decode(s.read.text(path))
    }),

    // S12 over a REAL SOCKET: the same recorded events served by the
    // loopback fixture mongod (graft.tools.MongoWireServer) and fetched
    // by the live OP_MSG client — hello handshake, aggregate opening a
    // $changeStream cursor with the reference's server-side $match and
    // $changeStreamSplitLargeEvent stages, getMore batches until the
    // cursor closes — then rendered to the `.cs` transport and decoded
    // through the standard DSv2 source. Same oracle as the recording
    // path: the socket must be invisible in the data (the server-side
    // $match drops the collection-level `drop` event before its bytes
    // ever leave the server).
    "s12_change_stream_socket" -> ((s, _) => {
      val docs = WireFixtures.mongoChangeStreamJsonl.linesIterator
        .map(l => graft.serde.Bson.parseJson(l)
          .asInstanceOf[graft.serde.Bson.BDoc])
        .toSeq
      val (port, _, _) = graft.tools.MongoWireServer.serve(docs)
      val jsonl = graft.sources.net.MongoWireClient.fetchJsonl(
        "127.0.0.1", port, "shop", "items")
      val n = graft.sources.wire.MongoChangeStream
        .segmentRows(jsonl.linesIterator).size.toLong
      val dir = Files.createTempDirectory("cs-socket").toString
      Files.write(Paths.get(dir, f"part-g${1L}%012d-b-p${0}%05d-n$n.cs"),
        jsonl.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S12 BSON TYPE GAMUT over the live wire: documents carrying
    // ObjectId (0x07), UTC datetime (0x09), Binary+subtype (0x05),
    // internal Timestamp (0x11), Decimal128 (0x13, BID-encoded) and
    // regex (0x0B) — the types a real mongod sends that plain JSON
    // can't carry — served by the fixture mongod, fetched by the OP_MSG
    // client (parse → REAL BSON bytes per element type → decode →
    // canonical Extended JSON render), then column-extracted from the
    // wrappers. Reference type dispatch: MongoDataConverter.java:1-891.
    "s12_bson_types" -> ((s, _) => {
      val docs = WireFixtures.mongoBsonTypesJsonl.linesIterator
        .map(l => graft.serde.Bson.parseJson(l)
          .asInstanceOf[graft.serde.Bson.BDoc])
        .toSeq
      val (port, _, _) = graft.tools.MongoWireServer.serve(docs)
      val jsonl = graft.sources.net.MongoWireClient.fetchJsonl(
        "127.0.0.1", port, "shop", "typed")
      import s.implicits._
      val dec = graft.sources.wire.MongoChangeStream.decode(
        s.createDataset(jsonl.linesIterator.filter(_.nonEmpty).toSeq)
          .toDF("value"))
      def w(inner: StructField*): StructType = StructType(inner)
      val keySchema = w(StructField("_id",
        w(StructField("$oid", StringType))))
      val docSchema = w(
        StructField("sku", StringType),
        StructField("created", w(StructField("$date",
          w(StructField("$numberLong", StringType))))),
        StructField("payload", w(StructField("$binary",
          w(StructField("base64", StringType),
            StructField("subType", StringType))))),
        StructField("seen", w(StructField("$timestamp",
          w(StructField("t", LongType), StructField("i", LongType))))),
        StructField("amount", w(StructField("$numberDecimal", StringType))),
        StructField("pattern", w(StructField("$regularExpression",
          w(StructField("pattern", StringType),
            StructField("options", StringType))))))
      val doc = from_json(col("after_json"), docSchema)
      dec.select(
        col("op"), col("ord"),
        from_json(col("key_json"), keySchema)
          .getField("_id").getField("$oid").as("oid"),
        doc.getField("sku").as("sku"),
        doc.getField("created").getField("$date").getField("$numberLong")
          .cast(LongType).as("created_ms"),
        doc.getField("payload").getField("$binary").getField("base64")
          .as("bin_b64"),
        doc.getField("payload").getField("$binary").getField("subType")
          .as("bin_subtype"),
        doc.getField("seen").getField("$timestamp").getField("t").as("ts_t"),
        doc.getField("seen").getField("$timestamp").getField("i").as("ts_i"),
        doc.getField("amount").getField("$numberDecimal").as("amount"),
        doc.getField("pattern").getField("$regularExpression")
          .getField("pattern").as("re_pattern"),
        doc.getField("pattern").getField("$regularExpression")
          .getField("options").as("re_options"))
    }),

    // S12 through the DSv2 source: the recording tails as a `.cs`
    // segment; the cursor-order decode (with SplitEventHandler-style
    // fragment buffering) runs inside the partition reader, so Mongo
    // recordings drop into the same streaming pipeline as pgoutput/binlog
    "s12_change_stream_dsv2" -> ((s, _) => {
      val dir = stageFixture("mongo_changestream.jsonl", "cs",
        WireFixtures.mongoRowCount)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S12 end-to-end: mongo recording tailed as a STREAM through the
    // DSv2 source, post-images parsed to a typed envelope in executors
    // and merged into the bucketed sink — recorded cursor to queryable
    // latest-state table with no Mongo client anywhere
    "s12_change_stream_materialize" -> ((s, _) => {
      val dir = stageFixture("mongo_changestream.jsonl", "cs",
        WireFixtures.mongoRowCount)
      val docSchema = StructType(Seq(
        StructField("_id", LongType), StructField("sku", StringType),
        StructField("qty", LongType), StructField("price", DoubleType)))
      val sink = new graft.streaming.BucketedMergeSink(
        Files.createTempDirectory("cs-sink").toString, buckets = 8)
      val ckpt = Files.createTempDirectory("cs-ckpt").toString
      val q = s.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          val env = batch
            .filter(col("table") === "shop.items" &&
              col("op").isin("c", "u", "d") &&
              // drop the oversized split doc: schemaless extras stay out
              // of the typed table (its blob field has no column)
              get_json_object(col("key_json"), "$._id").cast("long") < 900)
            .select(
              from_json(col("key_json"), StructType(Seq(
                StructField("_id", LongType)))).as("key"),
              lit(null).cast(docSchema).as("before"),
              from_json(col("payload_json"), docSchema).as("after"),
              col("op"), struct(col("pos")).as("source"),
              lit(null).cast("string").as("transaction"),
              col("pos").as("ts_ms"))
          sink.merge(env, epochId): Unit
        }
        .start()
      q.awaitTermination()
      sink.view(s)
    }),

    // S12 INCREMENTAL snapshot (ref MongoDbIncrementalSnapshotChangeEventSource,
    // 767 LoC): the backfill reads the collection's CURRENT documents in
    // `_id`-chunked pages — keyset pagination in BSON sort order
    // (bsonSortKey) — while the change stream replays concurrently; each
    // chunk's open/close window dedups chunk docs whose key saw an
    // in-window stream event (deduplicateWindow removes the buffered doc),
    // and the merge converges to the same latest state as the pure
    // change-stream materialization (its oracle)
    "s12_incremental_snapshot" -> ((s, _) => {
      val path = stageResource("mongo_changestream.jsonl")
      val docSchema = StructType(Seq(
        StructField("_id", LongType), StructField("sku", StringType),
        StructField("qty", LongType), StructField("price", DoubleType)))
      val dec = graft.sources.wire.MongoChangeStream.decode(s.read.text(path))
      val stream = dec.filter(col("table") === "shop.items" &&
          get_json_object(col("key_json"), "$._id").cast("long") < 900)
        .select(
          from_json(col("key_json"), StructType(Seq(
            StructField("_id", LongType)))).as("key"),
          lit(null).cast(docSchema).as("before"),
          from_json(col("after_json"), docSchema).as("after"),
          col("op"),
          struct(col("ord").as("pos")).as("source"),
          lit(null).cast("string").as("transaction"),
          col("ord").as("ts_ms"))
      // the collection's current documents = what the chunked SELECTs read
      val docs = graft.operators.Materialize.latestState(stream)
      val snap = docs.select(
        struct(col("_id")).as("key"),
        lit(null).cast(docSchema).as("before"),
        struct(col("_id"), col("sku"), col("qty"), col("price")).as("after"),
        lit("r").as("op"),
        struct(lit(0L).as("pos")).as("source"),
        lit(null).cast("string").as("transaction"),
        lit(0L).as("ts_ms"))
      val chunkRows = IncrementalSnapshot.chunked(snap,
        Seq(graft.sources.wire.MongoChangeStream.bsonSortKey(
          get_json_object(to_json(col("key")), "$._id"))), 8)
      // heavy-load degenerate bracket: every chunk's window spans the
      // whole replayed stream (one row per chunk, broadcast side)
      val windows = chunkRows.select(col("chunk")).distinct()
        .select(col("chunk"), lit(0L).as("lo_pos"),
          lit(Long.MaxValue).as("hi_pos"))
      IncrementalSnapshot.readOnlyChunkMerge(chunkRows, windows, stream)
    }),

    // S10 end-to-end, same POLL shape as S11: three SCN-window polls of
    // the LogMiner recording (each window holds whole transactions),
    // declaratively decoded (committed-only) and appended to the DSv2
    // transport, then streamed into the bucketed sink. Unavailable
    // values ("Unsupported Type" redo) surface as JSON nulls in the
    // typed table.
    // §2.9, Oracle leg: OPERATION_CODE=5 DDL rows project to the
    // schema-change feed (same shape as s9_binlog_schema_changes)
    "s10_logminer_schema_changes" -> ((s, _) => {
      val path = stageResource("logminer_contents.jsonl")
      val schema = StructType(Seq(
        StructField("rownum", LongType), StructField("scn", LongType),
        StructField("opcode", IntegerType), StructField("xid", StringType),
        StructField("csf", IntegerType), StructField("rbk", IntegerType),
        StructField("row_id", StringType), StructField("rs_id", StringType),
        StructField("seg_owner", StringType),
        StructField("table_name", StringType),
        StructField("sql_redo", StringType)))
      graft.sources.wire.LogMiner.schemaChanges(
        s.read.schema(schema).json(path))
    }),

    // §2.9, Oracle leg, MID-POLL EVOLUTION: the poll's own DDL rows —
    // Oracle dialect: quoted "OWNER"."NAME" pairs, parenthesized
    // multi-ADD and MODIFY, NUMBER/VARCHAR2/BINARY_DOUBLE types, a
    // CREATE TABLE discovered in-stream, index DDL skipped — replay
    // onto the schema registry in SCN order, so each row decodes
    // against the schema version in force AT ITS SCN (the LogMiner
    // analogue of s9_binlog_schema_changes' mid-segment ALTER)
    "s10_logminer_evolved_decode" -> ((s, _) => {
      val path = stageResource("logminer_evolved.jsonl")
      val schema = StructType(Seq(
        StructField("rownum", LongType), StructField("scn", LongType),
        StructField("opcode", IntegerType), StructField("xid", StringType),
        StructField("csf", IntegerType), StructField("rbk", IntegerType),
        StructField("row_id", StringType), StructField("rs_id", StringType),
        StructField("seg_owner", StringType),
        StructField("table_name", StringType),
        StructField("sql_redo", StringType)))
      graft.sources.wire.LogMiner.decodeEvolving(
        s.read.schema(schema).json(path),
        schemas = Map("ORA.PRODUCTS" -> Seq(
          "ID" -> "long", "NAME" -> "string", "PRICE" -> "double")),
        keys = Map("ORA.PRODUCTS" -> Seq("ID")))
    }),

    "s10_logminer_poll_stream" -> ((s, _) => {
      val path = stageResource("logminer_contents.jsonl")
      val schema = StructType(Seq(
        StructField("rownum", LongType), StructField("scn", LongType),
        StructField("opcode", IntegerType), StructField("xid", StringType),
        StructField("csf", IntegerType), StructField("rbk", IntegerType),
        StructField("row_id", StringType), StructField("rs_id", StringType),
        StructField("seg_owner", StringType),
        StructField("table_name", StringType),
        StructField("sql_redo", StringType)))
      // the reference's mining query carries the table include-list;
      // this poll captures only PRODUCTS
      val contents = s.read.schema(schema).json(path)
        .filter(col("table_name") === "PRODUCTS")
      val wireDir = Files.createTempDirectory("lm-wire").toString
      def poll(fromScn: Long, toScn: Long): Unit =
        graft.sources.wire.LogMiner.decode(
          contents.filter(col("scn") >= fromScn && col("scn") <= toScn),
          schemas = Map("ORA.PRODUCTS" -> Seq(
            "ID" -> "long", "NAME" -> "string", "PRICE" -> "double",
            "CREATED" -> "timestamp")),
          keys = Map("ORA.PRODUCTS" -> Seq("ID")))
          .select(col("table"), col("op"), col("scn").as("pos"),
            col("key_json"),
            // unavailable-value placeholder → JSON null for the typed read
            coalesce(regexp_replace(col("after_json"),
              "\"__unavailable\"", "null"), lit("null")).as("payload_json"))
          .write.format(classOf[graft.sources.v2.ChangeLogSource].getName)
          .option("path", wireDir).mode("append").save()
      poll(5000L, 5199L); poll(5200L, 5399L); poll(5400L, 6000L)
      val rowSchema = StructType(Seq(
        StructField("ID", LongType), StructField("NAME", StringType),
        StructField("PRICE", DoubleType), StructField("CREATED", TimestampType)))
      val sink = new graft.streaming.BucketedMergeSink(
        Files.createTempDirectory("lm-sink").toString, buckets = 8)
      val ckpt = Files.createTempDirectory("lm-ckpt").toString
      val q = s.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", wireDir).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          val env = batch.select(
            from_json(col("key_json"), StructType(Seq(
              StructField("ID", LongType)))).as("key"),
            lit(null).cast(rowSchema).as("before"),
            from_json(col("payload_json"), rowSchema).as("after"),
            col("op"), struct(col("pos")).as("source"),
            lit(null).cast("string").as("transaction"),
            col("pos").as("ts_ms"))
          sink.merge(env, epochId): Unit
        }
        .start()
      q.awaitTermination()
      sink.view(s)
    }),

    // S9: recorded binlog events (TABLE_MAP + ROWS v2) through the DSv2
    // source; row images are positional, so names + primary key resolve
    // from schema-history DDL passed as a source option (the reference's
    // split between row events and replayed schema history). The binary
    // parse runs in each segment's partition reader, never on the driver.
    // S9 end-to-end: recorded binlog tailed as a STREAM (names + PK from
    // schema-history DDL), decoded per segment in executors and merged
    // into the bucketed sink — binlog bytes to queryable latest state
    "s9_binlog_materialize" -> ((s, _) => {
      val dir = stageFixture("binlog_segment.blog", "blog",
        WireFixtures.binlogRowCount)
      val rowSchema = StructType(Seq(
        StructField("id", IntegerType), StructField("qty", LongType),
        StructField("label", StringType)))
      val sink = new graft.streaming.BucketedMergeSink(
        Files.createTempDirectory("bl-sink").toString, buckets = 8)
      val ckpt = Files.createTempDirectory("bl-ckpt").toString
      val q = s.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir)
        .option("binlogDdl",
          "CREATE TABLE testdb.bl_items (id INT PRIMARY KEY, qty BIGINT, label VARCHAR(40))")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          val env = batch
            .filter(col("table") === "testdb.bl_items")
            .select(
              from_json(col("key_json"), StructType(Seq(
                StructField("id", IntegerType)))).as("key"),
              lit(null).cast(rowSchema).as("before"),
              from_json(col("payload_json"), rowSchema).as("after"),
              col("op"), struct(col("pos")).as("source"),
              lit(null).cast("string").as("transaction"),
              col("pos").as("ts_ms"))
          sink.merge(env, epochId): Unit
        }
        .start()
      q.awaitTermination()
      sink.view(s)
    }),

    "s9_binlog_decode" -> ((s, _) => {
      val dir = stageFixture("binlog_segment.blog", "blog",
        WireFixtures.binlogRowCount)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir)
        .option("binlogDdl",
          "CREATE TABLE testdb.bl_items (id INT PRIMARY KEY, qty BIGINT, label VARCHAR(40));" +
            "CREATE TABLE testdb.bl_types (id INT PRIMARY KEY, t TINYINT, s SMALLINT," +
            " i3 MEDIUMINT, f REAL, d DOUBLE, y SMALLINT, dt DATE, ts DATETIME," +
            " dec DECIMAL(12,3), b BLOB);" +
            "CREATE TABLE testdb.bl_json (id INT PRIMARY KEY, j JSON);" +
            "CREATE TABLE testdb.bl_geo (id INT PRIMARY KEY, g TEXT)")
        .load()
    }),

    // S8 over a REAL SOCKET: the same binlog served by the loopback
    // fixture mysqld (graft.tools.MySqlWireServer) and streamed by the
    // live binlog-dump client — v10 handshake, verified
    // mysql_native_password token, COM_BINLOG_DUMP, per-event packets —
    // then through the standard DSv2 transport. Same oracle as
    // s9_binlog_decode.
    // S8 MariaDB flavor: GTID-opened event groups (domain-server-seq),
    // ANNOTATE_ROWS statement text attached to the rows it produced,
    // GTID_LIST replication state surfaced at the segment head
    "s8_mariadb_gtid_decode" -> ((s, _) => {
      import s.implicits._
      val (rows, gtidList) = graft.sources.wire.MySqlBinlog.segmentRowsMaria(
        graft.tools.WireFixtures.mariadbSegment,
        Map("testdb.bl_items" -> Seq("id", "qty", "label")))
      require(gtidList == """["0-1-41","1-1-6"]""",
        s"unexpected GTID_LIST state: $gtidList")
      rows.map { case (w, gtid, annotation) =>
        (w.table, w.op, w.pos, w.keyJson, w.payloadJson, gtid, annotation)
      }.toDF("table", "op", "pos", "key_json", "payload_json", "gtid",
        "annotation")
    }),

    // S10 OpenLogReplicator flavor (the reference's third Oracle adapter,
    // published protocol — OraProtoBuf.proto): length-prefixed protobuf
    // RedoResponses decoded into the shared envelope rows; pos is the
    // confirmable (c_scn, c_idx) pair
    "s10_olr_decode" -> ((s, _) => {
      val seg = graft.tools.WireFixtures.olrSegment
      val n = graft.sources.wire.OlrDecoder.segmentRows(seg).size
      val dir = Files.createTempDirectory("olr-fix").toString
      Files.write(Paths.get(dir, f"part-g${1L}%012d-b-p${0}%05d-n$n.olr"),
        seg)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S10 OLR over a REAL SOCKET: INFO → READY → START(scn) → REPLICATE
    // handshake against the loopback fixture server, every PAYLOAD
    // confirmed with its (c_scn, c_idx); the collected stream is
    // byte-identical to the recorded segment. Same oracle as the decode.
    "s10_olr_socket_stream" -> ((s, _) => {
      val (port, session, server) = graft.tools.OlrServer.serve(
        graft.tools.WireFixtures.olrResponses, "ORCLPDB1")
      val seg = graft.sources.net.OlrClient.fetchSegment(
        "127.0.0.1", port, "ORCLPDB1", scn = 990L)
      server.join(10000)
      require(session.startScn == 990L,
        s"unexpected START scn ${session.startScn}")
      require(session.confirms.size == 5 &&
        session.confirms.peek() == ((1000L, 1L)),
        s"confirm stream wrong: ${session.confirms}")
      require(java.util.Arrays.equals(seg,
        graft.tools.WireFixtures.olrSegment),
        "socket stream drifted from the recorded segment")
      val n = graft.sources.wire.OlrDecoder.segmentRows(seg).size
      val dir = Files.createTempDirectory("olr-socket").toString
      Files.write(Paths.get(dir, f"part-g${1L}%012d-b-p${0}%05d-n$n.olr"),
        seg)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
    }),

    // S10 OLR end-to-end: streamed .olr segments merged into table state
    // through the bucketed sink — the same socket→DSv2→merge shape the
    // other four protocols have
    "s10_olr_materialize" -> ((s, _) => {
      val seg = graft.tools.WireFixtures.olrSegment
      val n = graft.sources.wire.OlrDecoder.segmentRows(seg).size
      val dir = Files.createTempDirectory("olr-m").toString
      Files.write(Paths.get(dir, f"part-g${1L}%012d-b-p${0}%05d-n$n.olr"),
        seg)
      val olrSchema = StructType(Seq(
        StructField("ID", LongType), StructField("QTY", LongType),
        StructField("LABEL", StringType), StructField("SCORE", DoubleType)))
      val sink = new graft.streaming.BucketedMergeSink(
        Files.createTempDirectory("olr-sink").toString, buckets = 8)
      val ckpt = Files.createTempDirectory("olr-ckpt").toString
      val q = s.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          val env = batch
            .filter(col("table") === "GRAFT.OLR_ITEMS" &&
              col("op").isin("c", "u", "d"))
            .select(
              from_json(col("key_json"), StructType(Seq(
                StructField("ID", LongType)))).as("key"),
              lit(null).cast(olrSchema).as("before"),
              from_json(col("payload_json"), olrSchema).as("after"),
              col("op"), struct(col("pos")).as("source"),
              lit(null).cast("string").as("transaction"),
              col("pos").as("ts_ms"))
          sink.merge(env, epochId): Unit
        }
        .start()
      q.awaitTermination()
      sink.view(s)
    }),

    // S8 MySQL-GTID flavor: GTID_LOG_EVENT transaction framing (sid:gno
    // + 5.7 logical clock), PREVIOUS_GTIDS resume state at the head, and
    // the gtid.source.includes server-UUID filter dropping a whole
    // foreign-server transaction (reference debezium-connector-mysql
    // gtid/ + BinlogConnectorConfig.GTID_SOURCE_INCLUDES)
    "s8_mysql_gtid_decode" -> ((s, _) => {
      import s.implicits._
      import graft.sources.wire.GtidSet
      val keep = GtidSet.sourceFilter(includes = Some("a.*"), excludes = None)
      val (rows, previous) = graft.sources.wire.MySqlBinlog.segmentRowsGtid(
        graft.tools.WireFixtures.mysqlGtidSegment,
        Map("testdb.bl_items" -> Seq("id", "qty", "label")),
        sourceFilter = keep)
      require(previous.text ==
        s"${graft.tools.WireFixtures.GtidSidA}:1-41," +
          s"${graft.tools.WireFixtures.GtidSidB}:1-6",
        s"unexpected PREVIOUS_GTIDS state: ${previous.text}")
      rows.map { case (w, gtid, stmt) =>
        (w.table, w.op, w.pos, w.keyJson, w.payloadJson, gtid, stmt)
      }.toDF("table", "op", "pos", "key_json", "payload_json", "gtid",
        "stmt")
    }),

    // S8 `binlog_row_metadata=FULL` + `binlog_checksum=CRC32`: the
    // TABLE_MAP's WL#4618 optional metadata supplies column names,
    // UNSIGNED signedness and the primary key (no external DDL anywhere
    // in this query), and every event's trailing CRC32 is verified and
    // stripped. The values sit past the signed boundaries, so a signed
    // misread would corrupt every numeric column; unsigned BIGINT
    // surfaces as exact digits beyond int64
    "s9_binlog_metadata_decode" -> ((s, _) => {
      import s.implicits._
      val rows = graft.sources.wire.MySqlBinlog.segmentRows(
        graft.tools.WireFixtures.binlogMetadataSegment, Map.empty).toSeq
      rows.map(w => (w.table, w.op, w.pos, w.keyJson, w.payloadJson))
        .toDF("table", "op", "pos", "key_json", "payload_json")
    }),

    // §2.9: the schema-change feed (`include.schema.changes=true`) — DDL
    // carried by the binlog's QUERY events projects to one record per
    // statement (pos, database, table, kind, ddl); BEGIN and other
    // non-DDL statements are filtered, and the same events drive the
    // in-stream name evolution asserted by s9_binlog_decode's 993 rows
    "s9_binlog_schema_changes" -> ((s, _) => {
      import s.implicits._
      graft.sources.wire.MySqlBinlog.schemaChangeRows(
        graft.tools.WireFixtures.binlogSegment)
        .toDF("pos", "database", "table", "kind", "ddl")
    }),

    "s9_binlog_socket_stream" -> ((s, _) => {
      val events = graft.tools.MySqlWireServer.segmentEvents(
        graft.tools.WireFixtures.binlogSegment)
      val (port, _, _) = graft.tools.MySqlWireServer.serve(events, "sekrit")
      val seg = graft.sources.net.MySqlBinlogClient.fetchSegment(
        "127.0.0.1", port, "repl", "sekrit", serverId = 7,
        binlogFile = "binlog.000001")
      val n = graft.tools.WireFixtures.binlogRowCount
      val dir = Files.createTempDirectory("blog-socket").toString
      Files.write(Paths.get(dir, f"part-g${1L}%012d-b-p${0}%05d-n$n.blog"), seg)
      s.read.format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dir)
        .option("binlogDdl",
          "CREATE TABLE testdb.bl_items (id INT PRIMARY KEY, qty BIGINT, label VARCHAR(40));" +
            "CREATE TABLE testdb.bl_types (id INT PRIMARY KEY, t TINYINT, s SMALLINT," +
            " i3 MEDIUMINT, f REAL, d DOUBLE, y SMALLINT, dt DATE, ts DATETIME," +
            " dec DECIMAL(12,3), b BLOB);" +
            "CREATE TABLE testdb.bl_json (id INT PRIMARY KEY, j JSON);" +
            "CREATE TABLE testdb.bl_geo (id INT PRIMARY KEY, g TEXT)")
        .load()
    })
  )

  def oracles: Map[String, String] = baseOracles ++ Map(
    // the socket round-trips reassemble the same WAL/binlog
    // byte-identically
    "s8_pgoutput_socket_stream" -> baseOracles("s8_pgoutput_decode"),
    "s9_binlog_socket_stream" -> baseOracles("s9_binlog_decode"),

    "s9_binlog_schema_changes" ->
      """SELECT CAST(989 AS BIGINT) AS pos, 'testdb' AS "database",
        |  'testdb.audit_log' AS "table", 'CREATE' AS kind,
        |  'CREATE TABLE audit_log (id INT PRIMARY KEY, msg TEXT)' AS ddl
        |UNION ALL
        |SELECT 991, 'testdb', 'testdb.bl_items', 'ALTER',
        |  'ALTER TABLE bl_items ADD COLUMN note VARCHAR(20)'
        |UNION ALL
        |SELECT 995, 'testdb', 'testdb.bl_items_like', 'CREATE',
        |  'CREATE TABLE bl_items_like LIKE bl_items'
        |UNION ALL
        |SELECT 996, 'testdb', 'testdb.bl_types', 'ALTER',
        |  'ALTER TABLE bl_types PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (100), PARTITION p1 VALUES LESS THAN MAXVALUE)'""".stripMargin,
    "s12_change_stream_socket" -> baseOracles("s12_change_stream_dsv2"),

    // BSON type gamut: expected values reconstructed from the fixture
    // formulas — ObjectId hex, datetime ms, base64(binary), timestamp
    // (t,i), decimal string, regex — per op (deletes carry key only)
    "s12_bson_types" ->
      """WITH base AS (SELECT i,
        |  '65e0a1b2c3d4e5f6a7b8' || printf('%04x', i) AS oid,
        |  'tsku_' || i AS sku,
        |  CAST(1680000000000 + i*1000 AS BIGINT) AS created_ms,
        |  to_base64(('bin_' || i)::BLOB) AS bin_b64,
        |  '00' AS bin_subtype,
        |  '^doc_' || i AS re_pattern, 'i' AS re_options
        | FROM range(12) t(i))
        |SELECT 'c' AS op,
        |  CAST((1690000000+i)*4294967296 + 1 AS BIGINT) AS ord,
        |  oid, sku, created_ms, bin_b64, bin_subtype,
        |  CAST(1690000000+i AS BIGINT) AS ts_t,
        |  CAST(i+1 AS BIGINT) AS ts_i,
        |  i || '.25' AS amount, re_pattern, re_options
        |FROM base
        |UNION ALL
        |SELECT 'u', CAST((1690000100+i)*4294967296 + 1 AS BIGINT),
        |  oid, sku, created_ms, bin_b64, bin_subtype,
        |  CAST(1690000100+i AS BIGINT), CAST(i+2 AS BIGINT),
        |  (i+100) || '.75', re_pattern, re_options
        |FROM base WHERE i%4=0
        |UNION ALL
        |SELECT 'd', CAST((1690000200+i)*4294967296 + 1 AS BIGINT),
        |  oid, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        |FROM base WHERE i IN (3,7)""".stripMargin,
    "s11_cdc_socket_poll" -> baseOracles("s11_cdc_tables_decode"),
    "s8_mariadb_gtid_decode" ->
      """SELECT 'testdb.bl_items' AS "table", 'c' AS op,
        |  CAST(200 AS BIGINT) AS pos, '{"id":'||i||'}' AS key_json,
        |  '{"id":'||i||',"qty":'||(i*5)||',"label":"md_'||i||'"}' AS payload_json,
        |  '0-1-42' AS gtid,
        |  'INSERT INTO testdb.bl_items SELECT seq, seq*5, concat(''md_'', seq)' AS annotation
        | FROM range(12) t(i)
        |UNION ALL
        |SELECT 'testdb.bl_items', 'u', CAST(400 AS BIGINT), '{"id":'||i||'}',
        |  '{"id":'||i||',"qty":'||(i*5+1000)||',"label":"md_'||i||'"}',
        |  '1-1-7',
        |  'UPDATE testdb.bl_items SET qty = qty + 1000 WHERE id % 3 = 0'
        | FROM range(12) t(i) WHERE i%3=0""".stripMargin,

    "s10_olr_decode" -> olrOracle,
    // the socket round-trip is byte-identical to the recording
    "s10_olr_socket_stream" -> olrOracle,

    // latest state: inserts 0-11, qty+100 where i%4=0, i%5=0 deleted
    "s10_olr_materialize" ->
      """SELECT CAST(i AS BIGINT) AS "ID",
        | CAST(CASE WHEN i%4=0 THEN i*3+100 ELSE i*3 END AS BIGINT) AS "QTY",
        | 'olr_'||i AS "LABEL", i*0.5 AS "SCORE"
        |FROM range(12) t(i) WHERE i%5<>0""".stripMargin,

    // the sid-B update transaction is filtered out wholesale; the
    // anonymous group survives with an empty gtid
    "s8_mysql_gtid_decode" ->
      """SELECT 'testdb.bl_items' AS "table", 'c' AS op,
        |  CAST(200 AS BIGINT) AS pos, '{"id":'||i||'}' AS key_json,
        |  '{"id":'||i||',"qty":'||(i*5)||',"label":"mg_'||i||'"}' AS payload_json,
        |  'aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa:42' AS gtid,
        |  'INSERT INTO testdb.bl_items SELECT seq, seq*5, concat(''mg_'', seq)' AS stmt
        | FROM range(12) t(i)
        |UNION ALL
        |SELECT 'testdb.bl_items', 'c', CAST(600 AS BIGINT), '{"id":'||i||'}',
        |  '{"id":'||i||',"qty":'||(i*5)||',"label":"mg_'||i||'"}', '', ''
        | FROM range(100, 102) t(i)""".stripMargin,

    "s9_binlog_metadata_decode" ->
      """SELECT 'testdb.bl_unsigned' AS "table", 'c' AS op,
        |  CAST(200 AS BIGINT) AS pos, '{"id":'||i||'}' AS key_json,
        |  '{"id":'||i||',"name":"ux_'||i||'","u8":'||(200+i)||
        |  ',"u16":'||(65000+i*3)||',"u24":'||(16000000+i)||
        |  ',"u32":'||(4000000000+i)||
        |  ',"u64":'||CAST(CAST('9223372036854775808' AS HUGEINT)+i*7 AS VARCHAR)||
        |  ',"s64":'||(-1000-i)||',"ratio":'||CAST(i-0.5 AS VARCHAR)||'}'
        |    AS payload_json
        | FROM range(8) t(i)
        |UNION ALL
        |SELECT 'testdb.bl_unsigned', 'u', CAST(400 AS BIGINT),
        |  '{"id":'||i||'}',
        |  '{"id":'||i||',"name":"ux_'||i||'","u8":'||(200+i)||
        |  ',"u16":'||(65000+i*3)||',"u24":'||(16000000+i)||
        |  ',"u32":'||(4000000000+i)||
        |  ',"u64":'||CAST(CAST('9223372036854775808' AS HUGEINT)+i*7+1 AS VARCHAR)||
        |  ',"s64":'||(-1000-i)||',"ratio":'||CAST(i+99.5 AS VARCHAR)||'}'
        | FROM (VALUES (0),(4)) t(i)
        |UNION ALL
        |SELECT 'testdb.bl_unsigned', 'd', CAST(500 AS BIGINT),
        |  '{"id":5}', 'null'""".stripMargin)

  private val olrOracle: String =
    """SELECT 'GRAFT.OLR_ITEMS' AS "table", 'c' AS op,
      |  CAST(1000*65536+1 AS BIGINT) AS pos, '{"ID":'||i||'}' AS key_json,
      |  '{"ID":'||i||',"QTY":'||(i*3)||',"LABEL":"olr_'||i||'","SCORE":'||(i*0.5)||'}' AS payload_json
      | FROM range(12) t(i)
      |UNION ALL
      |SELECT 'GRAFT.OLR_ITEMS', 'u', CAST(1010*65536+1 AS BIGINT),
      |  '{"ID":'||i||'}',
      |  '{"ID":'||i||',"QTY":'||(i*3+100)||',"LABEL":"olr_'||i||'","SCORE":'||(i*0.5)||'}'
      | FROM range(12) t(i) WHERE i%4=0
      |UNION ALL
      |SELECT 'GRAFT.OLR_ITEMS', 'd', CAST(1020*65536+1 AS BIGINT),
      |  '{"ID":'||i||'}', 'null'
      | FROM range(12) t(i) WHERE i%5=0
      |UNION ALL
      |SELECT 'GRAFT.OLR_ITEMS', 'm', CAST(1030*65536+1 AS BIGINT),
      |  'null',
      |  '{"ddl":"ALTER TABLE GRAFT.OLR_ITEMS ADD NOTE VARCHAR2(30)"}'""".stripMargin

  private lazy val baseOracles: Map[String, String] = Map(
    "s8_pgoutput_decode" ->
      """SELECT 'public.cdc_items' AS "table", 'c' AS op, 1000+i AS pos,
        |  '{"id":'||i||'}' AS key_json,
        |  '{"id":'||i||',"qty":'||(i*7)||',"label":"item_'||i||'"}' AS payload_json
        | FROM range(40) t(i)
        |UNION ALL
        |SELECT 'public.cdc_items', 'u', 2000+i, '{"id":'||i||'}',
        |  '{"id":'||i||',"qty":'||(i*7+1000)||',"label":'||
        |    (CASE WHEN i%10=5 THEN '"__graft_unchanged_toast__"'
        |          ELSE '"item_'||i||'"' END)||'}'
        | FROM range(40) t(i) WHERE i%5=0
        |UNION ALL
        |SELECT 'public.cdc_tags', 'c', 2100+i, '{"id":'||i||'}',
        |  '{"id":'||i||',"tag":"tag_'||(i%3)||'"}'
        | FROM range(10) t(i)
        |UNION ALL
        |SELECT 'public.cdc_items', 'd', 3000+i, '{"id":'||i||'}', 'null'
        | FROM range(40) t(i) WHERE i%6=0
        |UNION ALL SELECT 'public.cdc_tags', 't', 4000, 'null',
        |  '{"cascade":false,"restart_identity":false}'
        |UNION ALL SELECT 'public.cdc_tags', 't', 4050, 'null',
        |  '{"cascade":true,"restart_identity":true}'
        |UNION ALL SELECT '', 'm', 4100, 'null',
        |  '{"prefix":"graft","content":"hello"}'
        |UNION ALL
        |SELECT 'public.cdc_arrays', 'c', 4200+i, '{"id":'||i||'}',
        |  '{"id":'||i||',"nums":['||i||','||(i*10)||',null]'||
        |  ',"tags":["a b","q\"'||i||'","plain'||i||'"]}'
        | FROM range(5) t(i)""".stripMargin,

    "s8_pgoutput_binary_decode" ->
      """SELECT 'public.cdc_bin' AS "table", 'c' AS op, 8000+i AS pos,
        |  '{"id":'||i||'}' AS key_json,
        |  '{"id":'||i||
        |  ',"flag":'||(CASE WHEN i%2=0 THEN 'true' ELSE 'false' END)||
        |  ',"s2":'||(i*3-5)||',"i8":'||(3000000000+i)||
        |  ',"f8":'||(CASE WHEN i=7 THEN '1.25e+23' WHEN i=10 THEN '2.5e-07'
        |             ELSE ((i+0.5)::DOUBLE)::VARCHAR END)||
        |  ',"dec":'||(CASE WHEN i%4=3 THEN '-' ELSE '' END)||(i*1234+7)||'.'||
        |    lpad((i*37)::VARCHAR,3,'0')||
        |  ',"name":"bin_'||i||'"'||
        |  ',"raw":"'||base64((chr((i+1)::INT)||chr((i+2)::INT)||
        |    chr((i*7+1)::INT))::BLOB)||'"'||
        |  ',"d":"'||(DATE '2022-03-01' + i::INTEGER)::VARCHAR||'"'||
        |  ',"ts":"2023-05-06 07:08:'||lpad(i::VARCHAR,2,'0')||'.'||
        |    lpad((i*80000+40)::VARCHAR,6,'0')||'"'||
        |  ',"uid":"11223344-5566-7788-0000-'||lpad(i::VARCHAR,12,'0')||'"}'
        |  AS payload_json
        | FROM range(12) t(i)""".stripMargin,

    // decoderbufs fixture reconstructed by formula: same shape as the
    // pgoutput oracles — see WireFixtures.pgprotoSegment
    "s8_pgproto_decode" ->
      """SELECT 'public.pb_items' AS "table", 'c' AS op, 5000+i AS pos,
        |  '{"id":'||i||'}' AS key_json,
        |  '{"id":'||i||',"qty":'||(i*3)||',"label":"pb_'||i||'"}' AS payload_json
        | FROM range(12) t(i)
        |UNION ALL
        |SELECT 'public.pb_items', 'u', 6000+i, '{"id":'||i||'}',
        |  '{"id":'||i||',"qty":'||(i*3+500)||',"label":'||
        |   (CASE WHEN i%8=4 THEN '"__graft_unchanged_toast__"'
        |         ELSE '"pb_'||i||'"' END)||'}'
        | FROM range(12) t(i) WHERE i%4=0
        |UNION ALL
        |SELECT 'public.pb_items', 'd', 7000+i, '{"id":'||i||'}', 'null'
        | FROM range(12) t(i) WHERE i%5=0
        |UNION ALL
        |SELECT 'public.pb_geo', 'c', 8000+i, '{"id":'||i||'}',
        |  '{"id":'||i||',"active":'||(CASE WHEN i%2=0 THEN 'true' ELSE 'false' END)||
        |  ',"score":'||(i*3)||'.5,"loc":{"x":'||i||'.0,"y":'||(i*2)||'.0}}'
        | FROM range(3) t(i)""".stripMargin,

    "s8_pgoutput_materialize" ->
      """SELECT i AS id,
        | CASE WHEN i%5=0 THEN i*7+1000 ELSE i*7 END AS qty,
        | CASE WHEN i%10=5 THEN '__graft_unchanged_toast__'
        |      ELSE 'item_'||i END AS label
        |FROM range(40) t(i) WHERE i%6<>0""".stripMargin,

    "s8_pgoutput_tx_stream" ->
      """SELECT 'tx601' AS tx_id, 100+i AS k, 'c' AS op, 6000+i AS pos,
        | 7000 AS commit_pos
        |FROM range(10) t(i)""".stripMargin,

    "s11_cdc_tables_decode" ->
      """SELECT 'dbo.products' AS "table", 'c' AS op,
        |  printf('%08x:%08x:%04x', 37, 256 + i//4, 3) AS commit_lsn,
        |  printf('%08x:%08x:%04x', 0, i, 1) AS seqval,
        |  '{"id":'||i||'}' AS key_json,
        |  CAST(NULL AS VARCHAR) AS before_json,
        |  '{"id":'||i||',"name":"prod_'||i||'","price":'||(i*2.5)::DOUBLE||
        |    ',"notes":"note_'||i||'"}' AS after_json,
        |  CAST(NULL AS VARCHAR) AS changed_cols
        | FROM range(40) t(i)
        |UNION ALL
        |SELECT 'dbo.products', 'u',
        |  printf('%08x:%08x:%04x', 37, 512 + i, 3),
        |  printf('%08x:%08x:%04x', 0, i, 2),
        |  '{"id":'||i||'}',
        |  '{"id":'||i||',"name":"prod_'||i||'","price":'||(i*2.5)::DOUBLE||
        |    ',"notes":'||(CASE WHEN i%8=0 THEN '"__unavailable"'
        |                       ELSE '"note_'||i||'"' END)||'}',
        |  CASE WHEN i%8=0
        |    THEN '{"id":'||i||',"name":"prod_'||i||'","price":'||
        |      (i*2.5+100)::DOUBLE||',"notes":"__unavailable"}'
        |    ELSE '{"id":'||i||',"name":null,"price":'||
        |      (i*2.5+100)::DOUBLE||',"notes":"edited_'||i||'"}' END,
        |  CASE WHEN i%8=0 THEN 'price' ELSE 'name,price,notes' END
        | FROM range(40) t(i) WHERE i%4=0
        |UNION ALL
        |SELECT 'dbo.products', 'd',
        |  printf('%08x:%08x:%04x', 37, 768 + i, 3),
        |  printf('%08x:%08x:%04x', 0, i, 3),
        |  '{"id":'||i||'}',
        |  '{"id":'||i||',"name":"prod_'||i||'","price":'||(i*2.5)::DOUBLE||
        |    ',"notes":"note_'||i||'"}',
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        | FROM range(40) t(i) WHERE i%6=3""".stripMargin,

    "s11_cdc_poll_stream" ->
      """SELECT i AS id,
        | CASE WHEN i%4=0 AND i%8<>0 THEN NULL ELSE 'prod_'||i END AS name,
        | CASE WHEN i%4=0 THEN i*2.5+100 ELSE i*2.5 END AS price,
        | CASE WHEN i%4=0 AND i%8<>0 THEN 'edited_'||i
        |      ELSE 'note_'||i END AS notes
        |FROM range(40) t(i) WHERE i%6<>3""".stripMargin,

    // pre-DDL rows carry the 3-column JSON, post-DDL rows the 5-column
    // one (STOCK/TAG), the update's images render nulls for columns
    // absent from its redo, and RATINGS exists only via its in-stream
    // CREATE (key from the per-column PRIMARY KEY clause)
    "s10_logminer_evolved_decode" ->
      """SELECT 'ORA.PRODUCTS' AS "table", 'c' AS op, 7001+i AS scn,
        |  7010 AS commit_scn, 'AA0001' AS xid,
        |  '{"ID":'||i||'}' AS key_json,
        |  CAST(NULL AS VARCHAR) AS before_json,
        |  '{"ID":'||i||',"NAME":"ev_'||i||'","PRICE":'||i||'.5}' AS after_json
        | FROM range(6) t(i)
        |UNION ALL
        |SELECT 'ORA.PRODUCTS', 'c', 7024+i, 7050, 'AA0002',
        |  '{"ID":'||i||'}', CAST(NULL AS VARCHAR),
        |  '{"ID":'||i||',"NAME":"ev_'||i||'","PRICE":'||i||'.5'||
        |    ',"STOCK":'||(i*10)||',"TAG":"tag_'||i||'"}'
        | FROM range(6,12) t(i)
        |UNION ALL
        |SELECT 'ORA.PRODUCTS', 'u', 7045, 7050, 'AA0002', '{"ID":3}',
        |  '{"ID":3,"NAME":"ev_3","PRICE":3.5,"STOCK":null,"TAG":null}',
        |  '{"ID":3,"NAME":"ev_3","PRICE":3.5,"STOCK":99,"TAG":null}'
        |UNION ALL
        |SELECT 'ORA.RATINGS', 'c', 7070+i, 7080, 'AA0003',
        |  '{"ID":'||i||'}', CAST(NULL AS VARCHAR),
        |  '{"ID":'||i||',"SCORE":'||i||'.75}'
        | FROM range(3) t(i)""".stripMargin,

    "s10_logminer_poll_stream" ->
      """SELECT i AS "ID",
        | CASE WHEN i IN (5,10,20,25) THEN NULL
        |      WHEN i=7 THEN 'it''s_7' ELSE 'ora_'||i END AS "NAME",
        | CASE WHEN i IN (5,10,20,25) THEN i+100.25
        |      WHEN i=11 THEN NULL ELSE i+0.25 END AS "PRICE",
        | CASE WHEN i=11 THEN NULL
        |      ELSE ('2021-03-15 10:00:'||lpad(i::VARCHAR,2,'0'))::TIMESTAMP
        | END AS "CREATED"
        |FROM range(30) t(i) WHERE i%7<>0""".stripMargin,

    "s10_logminer_schema_changes" ->
      """SELECT CAST(5990 AS BIGINT) AS scn, 'ORA' AS owner,
        |  'PRODUCTS' AS object_name, 'ALTER' AS kind,
        |  'ALTER TABLE "ORA"."PRODUCTS" ADD ("STOCK" NUMBER(10,0));' AS ddl
        |UNION ALL
        |SELECT 5995, 'ORA', 'AUDIT', 'TRUNCATE',
        |  'truncate table "ORA"."AUDIT";'""".stripMargin,

    "s10_logminer_decode" ->
      """SELECT 'ORA.PRODUCTS' AS "table", 'c' AS op,
        |  5001+i AS scn, 5100 AS commit_scn, '0A0001' AS xid,
        |  '{"ID":'||i||'}' AS key_json,
        |  CAST(NULL AS VARCHAR) AS before_json,
        |  '{"ID":'||i||',"NAME":'||
        |    (CASE WHEN i=7 THEN '"it''s_7"' ELSE '"ora_'||i||'"' END)||
        |  ',"PRICE":'||(CASE WHEN i=11 THEN '"__unavailable"'
        |                     ELSE i||'.25' END)||
        |  ',"CREATED":'||(CASE WHEN i=11 THEN 'null'
        |    ELSE '"2021-03-15 10:00:'||lpad(i::VARCHAR,2,'0')||'"' END)||
        |  '}' AS after_json
        | FROM range(30) t(i)
        |UNION ALL
        |SELECT 'ORA.PRODUCTS', 'u', 5200+i, 5300, '0B0002',
        |  '{"ID":'||i||'}',
        |  '{"ID":'||i||',"NAME":"ora_'||i||'","PRICE":'||i||'.25'||
        |    ',"CREATED":"2021-03-15 10:00:'||lpad(i::VARCHAR,2,'0')||'"}',
        |  '{"ID":'||i||',"NAME":null,"PRICE":'||(i+100)||'.25'||
        |    ',"CREATED":"2021-03-15 10:00:'||lpad(i::VARCHAR,2,'0')||'"}'
        | FROM range(30) t(i) WHERE i%5=0 AND i<>15
        |UNION ALL
        |SELECT 'ORA.PRODUCTS', 'd', 5400+i, 5500, '0C0003',
        |  '{"ID":'||i||'}',
        |  '{"ID":'||i||',"NAME":'||
        |    (CASE WHEN i=0 THEN 'null' WHEN i=7 THEN '"it''s_7"'
        |          ELSE '"ora_'||i||'"' END)||
        |  ',"PRICE":'||(CASE WHEN i=0 THEN '100.25' ELSE i||'.25' END)||
        |  ',"CREATED":"2021-03-15 10:00:'||lpad(i::VARCHAR,2,'0')||'"}',
        |  CAST(NULL AS VARCHAR)
        | FROM range(30) t(i) WHERE i%7=0
        |UNION ALL
        |-- LOB chains: tx5 insert + 2 CLOB chunks merged into the
        |-- after image; tx6 direct LOB mutation (write 8 chars, trim 5)
        |-- -> synthetic update, TITLE unavailable; tx7 BLOB hex chunks
        |-- at byte offsets; rolled-back tx8 absent
        |SELECT 'ORA.NOTES', 'c', 5800, 5810, '0E0005', '{"ID":1}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":1,"TITLE":"n1","BODY":"hello world"}'
        |UNION ALL
        |SELECT 'ORA.NOTES', 'u', 5820, 5830, '0E0006', '{"ID":2}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":2,"TITLE":"__unavailable","BODY":"abcde"}'
        |UNION ALL
        |SELECT 'ORA.FILES', 'c', 5840, 5850, '0E0007', '{"ID":3}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":3,"DATA":"DEADBEEF"}'
        |UNION ALL
        |-- XML chains: tx9 insert + 2 concatenating fragments merged
        |-- into the after image; tx10 direct mutation (binary begin +
        |-- HEXTORAW fragment with the missing-end-quote bug) ->
        |-- synthetic update; tx12 XML_REDO := NULL -> null column;
        |-- rolled-back tx11 absent
        |SELECT 'ORA.PAGES', 'c', 5880, 5890, '0F0009', '{"ID":1}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":1,"XDOC":"<page>hello</page>"}'
        |UNION ALL
        |SELECT 'ORA.PAGES', 'u', 5900, 5905, '0F000A', '{"ID":2}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":2,"XDOC":"<p>ab</p>"}'
        |UNION ALL
        |SELECT 'ORA.PAGES', 'u', 5920, 5925, '0F000C', '{"ID":4}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":4,"XDOC":null}'
        |UNION ALL
        |-- 32K chain: fragments concatenate into the insert's after
        |-- image; rolled-back tx14 absent
        |SELECT 'ORA.MEMOS', 'c', 5930, 5940, '0F000D', '{"ID":1}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":1,"BODY":"long text part one and part two"}'
        |UNION ALL
        |-- re-begin on the same column: the SECOND document wins
        |SELECT 'ORA.PAGES', 'u', 5970, 5978, '0F0010', '{"ID":6}',
        |  CAST(NULL AS VARCHAR),
        |  '{"ID":6,"XDOC":"<b/>"}'""".stripMargin,

    "s12_change_stream_decode" ->
      s"""SELECT 'shop.items' AS "table", 'c' AS op,
         |  printf('%016x%04x', (1680000000+i)*4294967296+1, 0) AS resume_token,
         |  (1680000000+i)*4294967296+1 AS ord,
         |  '{"_id":'||i||'}' AS key_json,
         |  CAST(NULL AS VARCHAR) AS before_json,
         |  '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7)||
         |    ',"price":'||(i*1.5)||'}' AS after_json,
         |  CAST(NULL AS VARCHAR) AS updated_json,
         |  CAST(NULL AS VARCHAR) AS removed_fields
         | FROM range(40) t(i)
         |UNION ALL
         |SELECT 'shop.items', 'u',
         |  printf('%016x%04x', (1680000100+i)*4294967296+1, 0),
         |  (1680000100+i)*4294967296+1,
         |  '{"_id":'||i||'}',
         |  '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7)||
         |    ',"price":'||(i*1.5)||'}',
         |  CASE WHEN i%10=5
         |    THEN '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7+1000)||'}'
         |    ELSE '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7+1000)||
         |      ',"price":'||(i*1.5)||'}' END,
         |  '{"qty":'||(i*7+1000)||'}',
         |  CASE WHEN i%10=5 THEN 'price' ELSE '' END
         | FROM range(40) t(i) WHERE i%5=0
         |UNION ALL
         |SELECT 'shop.items', 'u',
         |  printf('%016x%04x', (1680000200+i)*4294967296+1, 0),
         |  (1680000200+i)*4294967296+1,
         |  '{"_id":'||i||'}',
         |  '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7)||
         |    ',"price":'||(i*1.5)||'}',
         |  '{"_id":'||i||',"sku":"sku_'||i||'_v2","qty":'||(i*7)||
         |    ',"price":'||(i*1.5+10)||'}',
         |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
         | FROM range(40) t(i) WHERE i%10=7
         |UNION ALL
         |SELECT 'shop.items', 'd',
         |  printf('%016x%04x', (1680000300+i)*4294967296+1, 0),
         |  (1680000300+i)*4294967296+1,
         |  '{"_id":'||i||'}',
         |  '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||
         |    (CASE WHEN i%5=0 THEN i*7+1000 ELSE i*7 END)||
         |    ',"price":'||(i*1.5)||'}',
         |  CAST(NULL AS VARCHAR),
         |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
         | FROM range(40) t(i) WHERE i%6=0
         |UNION ALL
         |SELECT 'shop.items', 'c',
         |  printf('%016x%04x', 1680000500*4294967296+1, 3),
         |  1680000500*4294967296+1,
         |  '{"_id":999}',
         |  CAST(NULL AS VARCHAR),
         |  '{"_id":999,"sku":"sku_big","qty":0,"blob":"${"x" * 64}"}',
         |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)""".stripMargin,

    "s12_change_stream_dsv2" ->
      s"""SELECT 'shop.items' AS "table", 'c' AS op,
         |  (1680000000+i)*4294967296+1 AS pos,
         |  '{"_id":'||i||'}' AS key_json,
         |  '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7)||
         |    ',"price":'||(i*1.5)||'}' AS payload_json
         | FROM range(40) t(i)
         |UNION ALL
         |SELECT 'shop.items', 'u', (1680000100+i)*4294967296+1,
         |  '{"_id":'||i||'}',
         |  CASE WHEN i%10=5
         |    THEN '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7+1000)||'}'
         |    ELSE '{"_id":'||i||',"sku":"sku_'||i||'","qty":'||(i*7+1000)||
         |      ',"price":'||(i*1.5)||'}' END
         | FROM range(40) t(i) WHERE i%5=0
         |UNION ALL
         |SELECT 'shop.items', 'u', (1680000200+i)*4294967296+1,
         |  '{"_id":'||i||'}',
         |  '{"_id":'||i||',"sku":"sku_'||i||'_v2","qty":'||(i*7)||
         |    ',"price":'||(i*1.5+10)||'}'
         | FROM range(40) t(i) WHERE i%10=7
         |UNION ALL
         |SELECT 'shop.items', 'd', (1680000300+i)*4294967296+1,
         |  '{"_id":'||i||'}', 'null'
         | FROM range(40) t(i) WHERE i%6=0
         |UNION ALL
         |SELECT 'shop.items', 'c', 1680000500*4294967296+1,
         |  '{"_id":999}',
         |  '{"_id":999,"sku":"sku_big","qty":0,"blob":"${"x" * 64}"}'""".stripMargin,

    // the _id-chunked backfill + windowed stream dedup must converge to
    // the SAME latest state as the pure change-stream materialization
    "s12_incremental_snapshot" ->
      """SELECT i AS _id,
        | CASE WHEN i%10=7 THEN 'sku_'||i||'_v2' ELSE 'sku_'||i END AS sku,
        | CASE WHEN i%5=0 THEN i*7+1000 ELSE i*7 END AS qty,
        | CASE WHEN i%10=5 THEN NULL
        |      WHEN i%10=7 THEN i*1.5+10
        |      ELSE i*1.5 END AS price
        |FROM range(40) t(i) WHERE i%6<>0""".stripMargin,

    "s12_change_stream_materialize" ->
      """SELECT i AS _id,
        | CASE WHEN i%10=7 THEN 'sku_'||i||'_v2' ELSE 'sku_'||i END AS sku,
        | CASE WHEN i%5=0 THEN i*7+1000 ELSE i*7 END AS qty,
        | CASE WHEN i%10=5 THEN NULL
        |      WHEN i%10=7 THEN i*1.5+10
        |      ELSE i*1.5 END AS price
        |FROM range(40) t(i) WHERE i%6<>0""".stripMargin,

    "s9_binlog_materialize" ->
      """SELECT i AS id,
        | CASE WHEN i%4=0 THEN i*11+7 ELSE i*11 END AS qty,
        | CASE WHEN i%4=0 AND i%8=4 THEN NULL ELSE 'bl_'||i END AS label
        |FROM range(30) t(i) WHERE i%9<>0
        |UNION ALL
        |-- post-ALTER inserts (the static 3-column MERGE schema drops
        |-- the added `note` field on read)
        |SELECT i, i*11, 'bl_'||i FROM range(100,106) t(i)""".stripMargin,

    "s9_binlog_decode" ->
      """SELECT 'testdb.bl_items' AS "table", 'c' AS op,
        |  500+CAST(floor(i/10) AS BIGINT) AS pos,
        |  '{"id":'||i||'}' AS key_json,
        |  '{"id":'||i||',"qty":'||(i*11)||',"label":"bl_'||i||'"}' AS payload_json
        | FROM range(30) t(i)
        |UNION ALL
        |SELECT 'testdb.bl_items', 'u', 600, '{"id":'||i||'}',
        |  '{"id":'||i||',"qty":'||(i*11+7)||',"label":'||
        |    (CASE WHEN i%8=4 THEN 'null' ELSE '"bl_'||i||'"' END)||'}'
        | FROM range(30) t(i) WHERE i%4=0
        |UNION ALL
        |SELECT 'testdb.bl_items', 'd', 700, '{"id":'||i||'}', 'null'
        | FROM range(30) t(i) WHERE i%9=0
        |UNION ALL
        |SELECT 'testdb.bl_types', 'c', 901, '{"id":'||i||'}',
        |  '{"id":'||i||',"t":'||(i-5)||',"s":'||(i*100-500)||
        |  ',"i3":'||(i*10000-50000)||',"f":'||((i+0.5)::DOUBLE)||
        |  ',"d":'||((i*2.25)::DOUBLE)||',"y":'||(1990+i)||
        |  ',"dt":"2020-01-'||lpad((i+1)::VARCHAR,2,'0')||'"'||
        |  ',"ts":"2021-02-03 04:05:'||lpad(i::VARCHAR,2,'0')||'.'||
        |    lpad((i*100000)::VARCHAR,6,'0')||'"'||
        |  ',"dec":'||(CASE WHEN i%3=2 THEN '-' ELSE '' END)||(i*12345)||'.'||
        |    lpad((i*37)::VARCHAR,3,'0')||
        |  ',"b":"'||base64((chr((i+1)::INT)||chr((i+2)::INT)||
        |    chr((i*7+1)::INT))::BLOB)||'"}'
        | FROM range(10) t(i)
        |UNION ALL
        |SELECT 'testdb.bl_json', 'c', 951, '{"id":'||i||'}',
        |  '{"id":'||i||',"j":{"id":'||i||',"huge":'||(3000000000+i)||
        |  ',"name":"js_'||i||'"'||
        |  ',"flags":['||(CASE WHEN i%2=0 THEN 'true' ELSE 'false' END)||
        |    ',null,'||(i*1000)||']'||
        |  ',"nested":{"big":'||(100000+i)||',"depth":2}}}'
        | FROM range(10) t(i)
        |UNION ALL
        |-- PARTIAL_UPDATE_ROWS: diffs applied to the before image;
        |-- re-encoded post-image renders keys in storage order
        |SELECT 'testdb.bl_json', 'u', 970, '{"id":'||i||'}',
        |  '{"id":'||i||',"j":{"id":'||i||',"huge":'||(3000000000+i)||
        |  ',"name":"js_'||i||'_patched","extra":'||(i*5)||
        |  ',"flags":['||(CASE WHEN i%2=0 THEN 'true' ELSE 'false' END)||
        |    ',null,'||(i*1000+1)||']'||
        |  ',"nested":{"big":'||(100000+i)||'}}}'
        | FROM range(10) t(i) WHERE i%3=0
        |UNION ALL
        |-- wkb literals: base64(struct.pack('<BIdd', 1, 1, i, i+0.5)) —
        |-- the documented WKB little-endian POINT layout, derived
        |-- independently of the engine's encoder (python struct)
        |SELECT 'testdb.bl_geo', 'c', 961, '{"id":'||i||'}',
        |  '{"id":'||i||',"g":{"srid":4326,"wkb":"'||
        |  (CASE i
        |    WHEN 0 THEN 'AQEAAAAAAAAAAAAAAAAAAAAAAOA/'
        |    WHEN 1 THEN 'AQEAAAAAAAAAAADwPwAAAAAAAPg/'
        |    WHEN 2 THEN 'AQEAAAAAAAAAAAAAQAAAAAAAAARA'
        |    WHEN 3 THEN 'AQEAAAAAAAAAAAAIQAAAAAAAAAxA'
        |    WHEN 4 THEN 'AQEAAAAAAAAAAAAQQAAAAAAAABJA'
        |    WHEN 5 THEN 'AQEAAAAAAAAAAAAUQAAAAAAAABZA'
        |    WHEN 6 THEN 'AQIAAAACAAAAAAAAAAAA+D8AAAAAAAAEQAAAAAAAAAxAAAAAAAAAEkA='
        |    WHEN 7 THEN 'AQMAAAABAAAABAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAADwPwAAAAAAAAAAAAAAAAAA8D8AAAAAAADwPwAAAAAAAAAAAAAAAAAAAAA=' END)||'"}}'
        | FROM range(8) t(i)
        |UNION ALL
        |-- CHAR/ENUM/SET/BIT/TIME(3)/TIMESTAMP(6): names+pk+value lists
        |-- ride the TABLE_MAP's WL#4618 metadata (no DDL for this table);
        |-- ENUM renders its value name, SET the comma-joined members,
        |-- TIME in MySQL text form incl. the negative duration at i=5
        |SELECT 'testdb.bl_more', 'c', 981, '{"id":'||i||'}',
        |  '{"id":'||i||',"ch":"ch_'||i||'"'||
        |  ',"color":"'||(CASE i%3 WHEN 0 THEN 'red' WHEN 1 THEN 'green'
        |    ELSE 'blue' END)||'"'||
        |  ',"tags":"'||(CASE i WHEN 0 THEN '' WHEN 1 THEN 'a'
        |    WHEN 2 THEN 'b' WHEN 3 THEN 'a,b' WHEN 4 THEN 'c'
        |    ELSE 'a,c' END)||'"'||
        |  ',"bits":'||(i*257)||
        |  ',"dur":"'||(CASE WHEN i=5 THEN '-' ELSE '' END)||(10+i)||':'||
        |    lpad((i*2)::VARCHAR,2,'0')||':'||lpad((i*3)::VARCHAR,2,'0')||
        |    '.'||lpad((i*111)::VARCHAR,3,'0')||'"'||
        |  ',"at":"2023-11-14 22:13:'||(20+i)||'.'||
        |    lpad((i*7)::VARCHAR,6,'0')||'"}'
        | FROM range(6) t(i)
        |UNION ALL
        |-- post-ALTER rows: a QUERY event added `note` mid-segment, so
        |-- the 4th cell resolves its name from the evolved registry
        |SELECT 'testdb.bl_items', 'c', 993, '{"id":'||i||'}',
        |  '{"id":'||i||',"qty":'||(i*11)||',"label":"bl_'||i||'"'||
        |  ',"note":'||(CASE WHEN i%2=0 THEN '"n_'||i||'"'
        |    ELSE 'null' END)||'}'
        | FROM range(100,106) t(i)""".stripMargin
  )

  // range()/string-concat dialect is DuckDB-only
  override val duckdbOnly: Set[String] =
    Set("s8_mysql_gtid_decode", "s10_olr_decode", "s10_olr_socket_stream",
      "s10_olr_materialize",
      "s8_pgoutput_decode", "s8_pgoutput_socket_stream",
      "s8_pgoutput_materialize",
      "s8_pgoutput_binary_decode", "s8_pgproto_decode",
      "s8_pgoutput_tx_stream", "s9_binlog_decode", "s9_binlog_materialize",
      "s9_binlog_socket_stream",
      "s10_logminer_decode",
      "s10_logminer_evolved_decode",
      "s10_logminer_poll_stream",
      "s11_cdc_tables_decode", "s11_cdc_poll_stream",
      "s11_cdc_socket_poll",
      "s12_change_stream_decode", "s12_change_stream_dsv2",
      "s12_change_stream_socket", "s12_change_stream_materialize",
      "s12_incremental_snapshot", "s12_bson_types",
      "s8_mariadb_gtid_decode", "s9_binlog_metadata_decode",
      "s9_binlog_schema_changes")
}
