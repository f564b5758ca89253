package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType, StructField}
import graft.Pipeline
import graft.model.{Envelope, Snapshotter}
import graft.operators.{CustomConverter, Materialize, TypeHandling}
import graft.sources.ChangeFeedGen

/** Connector type/config surface: decimal/time/binary handling modes,
  * CustomConverter SPI, tombstones-on-delete, message.key.columns and the
  * snapshot-mode matrix (SURVEY §2.1 S7, §2.8; reference
  * `RelationalDatabaseConnectorConfig.java:323,337,419`,
  * `CommonConnectorConfig.java:690`, `spi/converter/CustomConverter.java`,
  * `spi/snapshot/Snapshotter.java`).
  */
object ConfigQueries extends QueryGroup {
  import TypeHandling._

  private def readsFeed(s: SparkSession, df: DataFrame): DataFrame =
    ChangeFeedGen.feed(df, "orders", df("o_orderkey").cast("long"), Map.empty,
      Some(Seq("o_orderkey"))).filter(col("op") === "r")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decimal.handling.mode: precise payload rendered as double AND string
    "c_decimal_handling" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
      val fd = ChangeFeedGen.feed(o, "orders", o("o_orderkey").cast("long"),
        Map.empty, Some(Seq("o_orderkey"))).filter(col("op") === "r")
      val dbl = convertEnvelope(fd, Config(decimalMode = DecimalMode.AsDouble))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.price").as("price_double"))
      val str = convertEnvelope(fd, Config(decimalMode = DecimalMode.AsString))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.price").as("price_string"))
      dbl.join(str, "o_orderkey")
    }),

    // time.precision.mode: adaptive (µs) vs connect (ms)
    "c_time_precision" -> ((s, dir) => {
      val fd = readsFeed(s, t(s, dir, "orders"))
      val adaptive = convertEnvelope(fd,
        Config(timePrecision = TimePrecisionMode.Adaptive))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.o_orderdate").as("ts_adaptive_us"))
      val connect = convertEnvelope(fd,
        Config(timePrecision = TimePrecisionMode.Connect))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.o_orderdate").as("ts_connect_ms"))
      adaptive.join(connect, "o_orderkey")
    }),

    // time.precision.mode isostring (3.x) and nanoseconds: ISO-8601 µs
    // strings and epoch-ns INT64 from the same temporal column
    "c_time_isostring" -> ((s, dir) => {
      val fd = readsFeed(s, t(s, dir, "orders"))
      val iso = convertEnvelope(fd,
        Config(timePrecision = TimePrecisionMode.IsoString))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.o_orderdate").as("ts_iso"))
      val ns = convertEnvelope(fd,
        Config(timePrecision = TimePrecisionMode.Nanoseconds))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.o_orderdate").as("ts_ns"))
      iso.join(ns, "o_orderkey")
    }),

    // 3.x structured temporals: value+precision calendar struct, no epoch
    // conversion (ref time/StructuredTimestamp.java) — flattened here so
    // the oracle checks every component; ts2 adds per-row sub-day and
    // sub-second parts so hour/minute/second/nanos are all exercised
    "c_structured_temporal" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        timestamp_micros(unix_micros(col("o_orderdate").cast("timestamp")) +
          col("o_orderkey") * 1000001L).as("ts2"))
      val fd = ChangeFeedGen.feed(o, "orders", o("o_orderkey").cast("long"),
        Map.empty, Some(Seq("o_orderkey"))).filter(col("op") === "r")
      val st = convertEnvelope(fd, Config(
        timePrecision = TimePrecisionMode.Structured, temporalPrecision = 6))
      st.select(col("after.o_orderkey").as("o_orderkey"),
        col("after.ts2.year").as("y"),
        col("after.ts2.month").cast("int").as("mo"),
        col("after.ts2.day").cast("int").as("d"),
        col("after.ts2.hour").cast("int").as("h"),
        col("after.ts2.minute").cast("int").as("mi"),
        col("after.ts2.second").cast("int").as("sec"),
        col("after.ts2.nanos").as("ns"),
        col("after.ts2.precision").as("prec"))
    }),

    // binary.handling.mode: base64 and hex renderings of a binary payload
    "c_binary_handling" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority").cast("binary").as("prio_bin"))
      val fd = ChangeFeedGen.feed(o, "orders", o("o_orderkey").cast("long"),
        Map.empty, Some(Seq("o_orderkey"))).filter(col("op") === "r")
      val b64 = convertEnvelope(fd, Config(binaryMode = BinaryMode.Base64))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.prio_bin").as("prio_base64"))
      val hx = convertEnvelope(fd, Config(binaryMode = BinaryMode.Hex))
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.prio_bin").as("prio_hex"))
      b64.join(hx, "o_orderkey")
    }),

    // CustomConverter SPI: a user converter overrides one temporal column
    "c_custom_converter" -> ((s, dir) => {
      val isoDates = new CustomConverter {
        def converterFor(table: String, field: StructField) =
          if (table == "orders" && field.name == "o_orderdate")
            Some((c: org.apache.spark.sql.Column) =>
              date_format(c, "yyyy-MM-dd"))
          else None
      }
      Pipeline(feed(s, dir, "orders"), Pipeline.Spec(
        converters = Seq(isoDates), tableName = "orders"))
        .filter(col("op") === "r")
        .select(col("after.o_orderkey").as("o_orderkey"),
          col("after.o_orderdate").as("order_date_iso"))
    }),

    // interval.handling.mode (ref PostgresConnectorConfig.java:988):
    // numeric (MicroDuration epoch-µs, the 365.25/12 month approximation)
    // vs string (ISO-8601 PnYnMnDTnHnMnS) from the same components —
    // synthesized per-row so every component (incl. µs=0 and the
    // trailing-zero strip) is exercised
    "c_interval_handling" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        (col("o_orderkey") % 3).as("y"), (col("o_orderkey") % 12).as("mo"),
        (col("o_orderkey") % 28).as("d"), (col("o_orderkey") % 24).as("h"),
        (col("o_orderkey") % 60).as("mi"), (col("o_orderkey") % 60).as("sec"),
        ((col("o_orderkey") * 7919) % 1000000).as("us"))
      val fd = ChangeFeedGen.feed(o, "orders", o("o_orderkey").cast("long"),
        Map.empty, Some(Seq("o_orderkey"))).filter(col("op") === "r")
      def comp(n: String) = col(s"after.$n")
      fd.select(col("after.o_orderkey").as("o_orderkey"),
        intervalMicros(comp("y"), comp("mo"), comp("d"), comp("h"),
          comp("mi"), comp("sec"), comp("us")).as("iv_micros"),
        intervalIso(comp("y"), comp("mo"), comp("d"), comp("h"),
          comp("mi"), comp("sec"), comp("us")).as("iv_iso"))
    }),

    // hstore.handling.mode (ref PostgresConnectorConfig.java:978): the
    // hstore text literal as a real MAP (looked up per key) and as a
    // JSON object string
    "c_hstore_handling" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"),
        concat(lit("\"seg\"=>\""), col("c_mktsegment"),
          lit("\", \"nation\"=>\""), col("c_nationkey").cast("string"),
          lit("\"")).as("attrs"))
      val fd = ChangeFeedGen.feed(c, "customer", c("c_custkey").cast("long"),
        Map.empty, Some(Seq("c_custkey"))).filter(col("op") === "r")
      val m = hstoreToMap(col("after.attrs"))
      fd.select(col("after.c_custkey").as("c_custkey"),
        element_at(m, "seg").as("seg_val"),
        element_at(m, "nation").as("nation_val"),
        hstoreToJson(col("after.attrs")).as("attrs_json"))
    }),

    // bigint.unsigned.handling.mode (ref BinlogConnectorConfig.java:506):
    // long (wrapped signed image, ≥2⁶³ appears negative) vs precise
    // (true unsigned value as DECIMAL(20,0))
    "c_unsigned_handling" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 1,
          -(col("o_orderkey") * 1000003 + 5))
          .otherwise(col("o_orderkey") * 1000003 + 5).as("u64"))
      val fd = ChangeFeedGen.feed(o, "orders", o("o_orderkey").cast("long"),
        Map.empty, Some(Seq("o_orderkey"))).filter(col("op") === "r")
      // u_precise surfaces as STRING in the verified output: its
      // DECIMAL(20,0) values reach ~1.8e19 > 2^53, beyond float64's
      // exact-integer range, so no float-side canonicalization can
      // round-trip it (the reference ships decimal.handling.mode=string
      // for exactly this reason). unsignedAsPrecise itself stays
      // decimal-typed for engine users (pinned in ConfigSurfaceSpec).
      fd.select(col("after.o_orderkey").as("o_orderkey"),
        unsignedAsLong(col("after.u64")).as("u_long"),
        unsignedAsPrecise(col("after.u64")).cast(StringType)
          .as("u_precise"))
    }),

    // PG MONEY via decimal.handling.mode with money.fraction.digits
    // (ref PostgresConnectorConfig.java:1151, convertMoney:951): precise
    // (DECIMAL at the configured scale, HALF_UP — exercised by a cents
    // value carrying 4 source decimals incl. a .xx5 tie), double, string
    "c_money_handling" -> ((s, dir) => {
      // exact 4-decimal source amounts built from integer parts (no
      // float anywhere); o_orderkey ≡ 25 (mod 50) rows land on a .xx50
      // tie, exercising the HALF_UP re-scale
      val n = col("o_orderkey") * 25 + col("o_orderkey") % 10000
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        concat(call_function("div", n, lit(10000L)).cast(StringType),
          lit("."), lpad((n % 10000).cast(StringType), 4, "0"))
          .cast(DecimalType(20, 4)).as("amount"))
      val fd = ChangeFeedGen.feed(o, "orders", o("o_orderkey").cast("long"),
        Map.empty, Some(Seq("o_orderkey"))).filter(col("op") === "r")
      // m_precise rendered as its plain decimal string in the verified
      // output (hash-stable across Spark decimal128 vs DuckDB's pandas
      // decimal→float64); moneyPrecise itself stays DECIMAL(38,2) for
      // engine users (pinned in ConfigSurfaceSpec).
      fd.select(col("after.o_orderkey").as("o_orderkey"),
        moneyPrecise(col("after.amount")).cast(StringType)
          .as("m_precise"),
        moneyDouble(col("after.amount")).as("m_double"),
        moneyString(col("after.amount")).as("m_string"))
    }),

    // tombstones.on.delete: the emitted post-delete tombstone records
    "k_tombstone_records" -> ((s, dir) =>
      ChangeFeedGen.standardFeed(t(s, dir, "orders"), "orders",
        tombstonesOnDelete = true)
        .filter(col("op") === Envelope.OpTombstone)
        .select(col("key.o_orderkey").as("o_orderkey"), col("op"),
          col("source.pos").as("pos"),
          col("before").isNull.as("before_null"),
          col("after").isNull.as("after_null"))),

    // ...and the sink dropping them: state with tombstones == state without
    "k_tombstones" -> ((s, dir) =>
      Materialize.latestState(
        ChangeFeedGen.standardFeed(t(s, dir, "orders"), "orders",
          tombstonesOnDelete = true))),

    // message.key.columns: record keys built from the override, not the PK
    "k_key_override" -> ((s, dir) =>
      ChangeFeedGen.standardFeed(t(s, dir, "orders"), "orders",
        pkOverride = Some(Seq("o_custkey", "o_orderkey")))
        .filter(col("op") === "r")
        .select(col("key.*"), col("op"), col("source.pos").as("pos"))),

    // T9 inference form: schemaless JSON extracted via sampled inference
    "t9_document_infer" -> ((s, dir) =>
      graft.operators.Transforms.extractDocumentInferred(
        t(s, dir, "events"), "props")
        .select(col("event_id"), col("__doc.k").as("k"))),

    // T5: source metadata propagated into field metadata, surfaced as rows
    "t5_metadata_propagation" -> ((s, dir) => {
      val df = t(s, dir, "orders")
      val schema = graft.operators.Transforms.propagateSourceMetadata(
        df.schema, "orders",
        Map("o_orderkey" -> "int8", "o_orderdate" -> "timestamp(3)"))
      import s.implicits._
      schema.fields.toSeq.map { f =>
        (f.name, f.metadata.getString("__graft.source.table"),
          if (f.metadata.contains("__graft.source.column.type"))
            f.metadata.getString("__graft.source.column.type") else "")
      }.toDF("field", "source_table", "native_type")
    }),

    // K7: schema history — append changes, recover the schema as of
    // several positions (restart path)
    // K7: offset storage backends — offsets written through the file
    // store survive a "restart" (a fresh store over the same file) and
    // resuming the feed from the recovered offset yields exactly the
    // events past the cut (reference FileOffsetBackingStore semantics)
    "k7_offset_store" -> ((s, dir) => {
      import graft.model.FileOffsetBackingStore
      val fd = feed(s, dir, "orders")
      // consume everything up to cut = max(k)*5 (≈ half the feed), then
      // record the offset and "crash"
      val cut = t(s, dir, "orders")
        .agg(max(col("o_orderkey")).cast("long")).head.getLong(0) * 5
      val f = java.nio.file.Files.createTempDirectory("k7-off")
        .resolve("offsets.dat")
      new FileOffsetBackingStore(f).set("orders", cut.toString)
      // restart: a new store instance recovers the committed offset
      val recovered = new FileOffsetBackingStore(f).get("orders").get.toLong
      fd.filter(col("source.pos") > recovered)
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          min(col("source.pos")).as("min_pos"),
          max(col("source.pos")).as("max_pos"))
    }),

    // K7: JDBC storage backend (reference debezium-storage-jdbc) — offsets
    // committed through embedded Derby survive a restart (fresh store over
    // the same database); a >65000-char schema-history record splits across
    // rows and reassembles byte-identically on recovery
    "k7_jdbc_store" -> ((s, dir) => {
      import graft.model.{JdbcHistoryStorage, JdbcOffsetBackingStore}
      val fd = feed(s, dir, "orders")
      val cut = t(s, dir, "orders")
        .agg(max(col("o_orderkey")).cast("long")).head.getLong(0) * 3
      val dbDir = java.nio.file.Files.createTempDirectory("k7-jdbc")
      val url = s"jdbc:derby:$dbDir/store;create=true"
      val st = new JdbcOffsetBackingStore(url)
      st.set("orders", cut.toString)
      st.set("lineitem", "41")
      st.close()
      val st2 = new JdbcOffsetBackingStore(url) // restart
      val recovered = st2.get("orders").get.toLong
      require(st2.snapshot == Map("orders" -> cut.toString, "lineitem" -> "41"),
        s"jdbc offset restart mismatch: ${st2.snapshot}")
      st2.close()
      val hs = new JdbcHistoryStorage(url)
      val big = "h" * 70000 + "!" // 2 parts at the 65000 split
      hs.append("first")
      hs.append(big)
      hs.close()
      val hs2 = new JdbcHistoryStorage(url) // restart
      hs2.append("third") // must sort after pre-restart records
      val recs = hs2.readAll()
      hs2.close()
      require(recs == Seq("first", big, "third"),
        s"jdbc history mismatch: ${recs.map(_.length)}")
      fd.filter(col("source.pos") > recovered)
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          min(col("source.pos")).as("min_pos"),
          max(col("source.pos")).as("max_pos"))
    }),

    // K7: RocksDB storage backend (reference debezium-storage-rocksdb) —
    // one durable put per offset flush (no full-file rewrite), append-only
    // history under sequence keys; both survive a restart
    "k7_rocksdb_store" -> ((s, dir) => {
      import graft.model.{RocksDbHistoryStorage, RocksDbOffsetBackingStore}
      val fd = feed(s, dir, "orders")
      val cut = t(s, dir, "orders")
        .agg(max(col("o_orderkey")).cast("long")).head.getLong(0) * 7
      val dbDir = java.nio.file.Files.createTempDirectory("k7-rocks")
      val st = new RocksDbOffsetBackingStore(s"$dbDir/offsets")
      st.set("orders", "0")
      st.set("orders", cut.toString) // overwrite, not append
      st.set("lineitem", "41")
      st.close()
      val st2 = new RocksDbOffsetBackingStore(s"$dbDir/offsets") // restart
      val recovered = st2.get("orders").get.toLong
      require(st2.snapshot == Map("orders" -> cut.toString, "lineitem" -> "41"),
        s"rocksdb offset restart mismatch: ${st2.snapshot}")
      st2.close()
      val hs = new RocksDbHistoryStorage(s"$dbDir/history")
      hs.append("first"); hs.append("second")
      hs.close()
      val hs2 = new RocksDbHistoryStorage(s"$dbDir/history") // restart
      hs2.append("third")
      val recs = hs2.readAll()
      hs2.close()
      require(recs == Seq("first", "second", "third"),
        s"rocksdb history mismatch: $recs")
      fd.filter(col("source.pos") > recovered)
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          min(col("source.pos")).as("min_pos"),
          max(col("source.pos")).as("max_pos"))
    }),

    "k7_schema_history" -> ((s, dir) => {
      import graft.model.SchemaHistory
      import graft.operators.SchemaEvolution.{AddColumn, DropColumn}
      val hdir = java.nio.file.Files.createTempDirectory("k7-history").toString
      val h = SchemaHistory.at(hdir, "orders")
      val initial = t(s, dir, "orders").schema
      h.append(100L, AddColumn("c_tier",
        org.apache.spark.sql.types.StringType))
      h.append(200L, DropColumn("o_orderpriority"))
      h.append(300L, AddColumn("x_new",
        org.apache.spark.sql.types.LongType))
      import s.implicits._
      Seq(0L, 150L, 250L, 400L).map { pos =>
        val rec = h.recover(initial, pos)
        (pos, rec.fields.length.toLong, rec.fieldNames.mkString(","))
      }.toDF("as_of_pos", "n_fields", "fields")
    }),

    // §2.9: DDL-text intake — ALTER statements parsed onto the structured
    // SchemaChange model and replayed over the catalog schema
    "k7_ddl_intake" -> ((s, dir) => {
      import graft.model.DdlParser
      import graft.operators.SchemaEvolution
      val initial = t(s, dir, "orders").schema
      val stmts = Seq(
        "ALTER TABLE public.orders ADD COLUMN c_tier VARCHAR(8)",
        "ALTER TABLE public.orders ADD discount DECIMAL(10,2) NOT NULL, " +
          "DROP COLUMN o_orderpriority",
        "ALTER TABLE \"public\".\"orders\" ALTER COLUMN discount TYPE DECIMAL(12,4)")
      val states = stmts.zipWithIndex.scanLeft(("initial", initial)) {
        case ((_, sch), (sql, i)) =>
          DdlParser.parse(sql) match {
            case DdlParser.AlterTable(_, changes) =>
              (s"stmt_$i", SchemaEvolution.applyAll(sch, changes))
            case DdlParser.CreateTable(_, schema) => (s"stmt_$i", schema)
          }
      }
      import s.implicits._
      states.map { case (nm, sch) =>
        (nm, sch.fields.length.toLong, sch.fieldNames.mkString(","))
      }.toDF("stmt", "n_fields", "fields")
    }),

    // P1: record-capped admission control through the DSv2 source — each
    // micro-batch admits whole segments up to the cap (cap 1 => one
    // segment per batch), nothing lost or duplicated
    "p1_admission_batches" -> ((s, dir) => {
      val wire = java.nio.file.Files.createTempDirectory("p1-wire").toString
      graft.streaming.ChangeLogPipeline.writeWire(
        feed(s, dir, "orders"), wire, files = 4)
      val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = s.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", wire).option("maxRecordsPerTrigger", "1")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          batches += b.count(); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import s.implicits._
      Seq((batches.size.toLong, batches.sum))
        .toDF("n_batches", "n_records")
    }),

    // snapshot.mode matrix: each mode × start-state → which phases run
    "s7_snapshot_matrix" -> ((s, dir) => {
      import Pipeline.SnapshotContext
      val customStreamOnly = new Snapshotter {
        val name = "custom_stream_only"
        def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean) = false
        val shouldStream = true
      }
      val cases: Seq[(String, Snapshotter, SnapshotContext)] = Seq(
        ("always_resume", Snapshotter.Always, SnapshotContext(true, true)),
        ("initial_fresh", Snapshotter.Initial, SnapshotContext(false, false)),
        ("initial_resume", Snapshotter.Initial, SnapshotContext(true, true)),
        ("initial_only_fresh", Snapshotter.InitialOnly, SnapshotContext(false, false)),
        ("no_data", Snapshotter.NoData, SnapshotContext(false, false)),
        ("when_needed_resume", Snapshotter.WhenNeeded, SnapshotContext(true, true)),
        ("when_needed_incomplete", Snapshotter.WhenNeeded, SnapshotContext(true, false)),
        ("recovery_resume", Snapshotter.Recovery, SnapshotContext(true, true)),
        ("config_data_only",
          Snapshotter.ConfigurationBased(snapshotData = true,
            snapshotSchema = true, stream = false),
          SnapshotContext(true, true)),
        ("custom_stream_only", customStreamOnly, SnapshotContext(false, false)))
      val fd = feed(s, dir, "orders")
      cases.map { case (nm, sn, ctx) =>
        Pipeline(fd, Pipeline.Spec(snapshotter = sn, snapshotContext = ctx))
          .agg(
            coalesce(sum(when(col("op") === "r", 1L).otherwise(0L)), lit(0L))
              .as("n_read"),
            coalesce(sum(when(col("op") =!= "r", 1L).otherwise(0L)), lit(0L))
              .as("n_stream"))
          .select(lit(nm).as("mode"), col("n_read"), col("n_stream"))
      }.reduce(_ unionAll _)
    })
  )

  private val ordersLatest =
    """SELECT o_orderkey, o_custkey,
      | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
      | o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey%13<>6""".stripMargin

  def oracles: Map[String, String] = Map(
    "c_decimal_handling" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_double,
        | CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_string
        |FROM orders""".stripMargin,

    "c_time_precision" ->
      """SELECT o_orderkey, epoch_us(o_orderdate) AS ts_adaptive_us,
        | epoch_ms(o_orderdate) AS ts_connect_ms
        |FROM orders""".stripMargin,

    "c_time_isostring" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS ts_iso,
        | epoch_ns(o_orderdate) AS ts_ns
        |FROM orders""".stripMargin,

    "c_structured_temporal" ->
      """WITH x AS (SELECT o_orderkey,
        |  make_timestamp(epoch_us(o_orderdate) + o_orderkey*1000001) AS ts2
        | FROM orders)
        |SELECT o_orderkey, year(ts2) AS y, month(ts2) AS mo, day(ts2) AS d,
        | hour(ts2) AS h, minute(ts2) AS mi, second(ts2) AS sec,
        | CAST((microsecond(ts2) % 1000000) * 1000 AS BIGINT) AS ns,
        | 6 AS prec
        |FROM x""".stripMargin,

    "c_binary_handling" ->
      """SELECT o_orderkey, base64(o_orderpriority::BLOB) AS prio_base64,
        | upper(hex(o_orderpriority::BLOB)) AS prio_hex
        |FROM orders""".stripMargin,

    "c_custom_converter" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date_iso
        |FROM orders""".stripMargin,

    // replays MicroDuration.durationMicros / Interval.toIsoString exactly:
    // same double-arithmetic fold and operator order as the Spark side, so
    // the IEEE result is bit-identical; floor() because the Java (long)
    // cast truncates (components are non-negative) while DuckDB's CAST
    // rounds
    "c_interval_handling" ->
      """WITH x AS (SELECT o_orderkey, o_orderkey%3 AS y, o_orderkey%12 AS mo,
        |  o_orderkey%28 AS d, o_orderkey%24 AS h, o_orderkey%60 AS mi,
        |  o_orderkey%60 AS s, (o_orderkey*7919)%1000000 AS us FROM orders)
        |SELECT o_orderkey,
        | CAST(floor((((((y*12+mo)*30.4375+d)*24+h)*60+mi)*60+s)*1e6
        |   + us) AS BIGINT) AS iv_micros,
        | 'P' || y || 'Y' || mo || 'M' || d || 'DT' || h || 'H' || mi || 'M'
        |   || CASE WHEN us=0 THEN CAST(s AS VARCHAR)
        |      ELSE s || '.' ||
        |        regexp_replace(lpad(CAST(us AS VARCHAR),6,'0'),'0+$','')
        |      END || 'S' AS iv_iso
        |FROM x""".stripMargin,

    "c_hstore_handling" ->
      """SELECT c_custkey, c_mktsegment AS seg_val,
        | CAST(c_nationkey AS VARCHAR) AS nation_val,
        | '{"seg":"' || c_mktsegment || '","nation":"' || c_nationkey
        |   || '"}' AS attrs_json
        |FROM customer""".stripMargin,

    "c_unsigned_handling" ->
      """WITH x AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey%2=1 THEN -(o_orderkey*1000003+5)
        |       ELSE o_orderkey*1000003+5 END AS u64 FROM orders)
        |SELECT o_orderkey, u64 AS u_long,
        | CAST(CAST(CASE WHEN u64<0
        |   THEN CAST(u64 AS DECIMAL(21,0))
        |     + CAST('18446744073709551616' AS DECIMAL(21,0))
        |   ELSE CAST(u64 AS DECIMAL(21,0)) END
        |  AS DECIMAL(20,0)) AS VARCHAR) AS u_precise
        |FROM x""".stripMargin,

    // replays convertMoney: precise re-scales HALF_UP (both engines round
    // decimal ties away from zero), double/string derive from the same
    // exact DECIMAL(20,4) amount — no float arithmetic anywhere upstream
    "c_money_handling" ->
      """WITH x AS (SELECT o_orderkey,
        |  o_orderkey*25 + o_orderkey%10000 AS n FROM orders),
        |y AS (SELECT o_orderkey, CAST(CAST(n//10000 AS VARCHAR) || '.' ||
        |  lpad(CAST(n%10000 AS VARCHAR),4,'0') AS DECIMAL(20,4)) AS amount
        |  FROM x)
        |SELECT o_orderkey,
        | CAST(CAST(round(amount,2) AS DECIMAL(38,2)) AS VARCHAR) AS m_precise,
        | CAST(amount AS DOUBLE) AS m_double,
        | CAST(CAST(round(amount,2) AS DECIMAL(38,2)) AS VARCHAR) AS m_string
        |FROM y""".stripMargin,

    "k_tombstone_records" ->
      """SELECT o_orderkey, 'x' AS op, o_orderkey*10+3 AS pos,
        | true AS before_null, true AS after_null
        |FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "k_tombstones" -> ordersLatest,

    "k_key_override" ->
      "SELECT o_custkey, o_orderkey, 'r' AS op, o_orderkey*10 AS pos FROM orders",

    "t9_document_infer" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "t5_metadata_propagation" ->
      """SELECT * FROM (VALUES
        | ('o_orderkey','orders','int8'),
        | ('o_custkey','orders',''),
        | ('o_orderstatus','orders',''),
        | ('o_totalprice','orders',''),
        | ('o_orderdate','orders','timestamp(3)'),
        | ('o_orderpriority','orders','')) t(field, source_table, native_type)""".stripMargin,

    "k7_offset_store" ->
      """WITH c AS (SELECT CAST(max(o_orderkey)*5 AS BIGINT) AS cut FROM orders),
        | ev AS (
        |  SELECT 'r' AS op, o_orderkey*10 AS pos FROM orders
        |  UNION ALL
        |  SELECT 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
        |  UNION ALL
        |  SELECT 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
        |SELECT op, count(*) AS n, min(pos) AS min_pos, max(pos) AS max_pos
        |FROM ev, c WHERE pos > cut GROUP BY op""".stripMargin,

    "k7_jdbc_store" ->
      """WITH c AS (SELECT CAST(max(o_orderkey)*3 AS BIGINT) AS cut FROM orders),
        | ev AS (
        |  SELECT 'r' AS op, o_orderkey*10 AS pos FROM orders
        |  UNION ALL
        |  SELECT 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
        |  UNION ALL
        |  SELECT 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
        |SELECT op, count(*) AS n, min(pos) AS min_pos, max(pos) AS max_pos
        |FROM ev, c WHERE pos > cut GROUP BY op""".stripMargin,

    "k7_rocksdb_store" ->
      """WITH c AS (SELECT CAST(max(o_orderkey)*7 AS BIGINT) AS cut FROM orders),
        | ev AS (
        |  SELECT 'r' AS op, o_orderkey*10 AS pos FROM orders
        |  UNION ALL
        |  SELECT 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
        |  UNION ALL
        |  SELECT 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
        |SELECT op, count(*) AS n, min(pos) AS min_pos, max(pos) AS max_pos
        |FROM ev, c WHERE pos > cut GROUP BY op""".stripMargin,

    "k7_schema_history" ->
      """SELECT * FROM (VALUES
        | (CAST(0 AS BIGINT), CAST(6 AS BIGINT),
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority'),
        | (150, 7,
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority,c_tier'),
        | (250, 6,
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,c_tier'),
        | (400, 7,
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,c_tier,x_new'))
        | t(as_of_pos, n_fields, fields)""".stripMargin,

    "k7_ddl_intake" ->
      """SELECT * FROM (VALUES
        | ('initial', CAST(6 AS BIGINT),
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority'),
        | ('stmt_0', 7,
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority,c_tier'),
        | ('stmt_1', 7,
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,c_tier,discount'),
        | ('stmt_2', 7,
        |  'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,c_tier,discount'))
        | t(stmt, n_fields, fields)""".stripMargin,

    "p1_admission_batches" ->
      """SELECT CAST(4 AS BIGINT) AS n_batches,
        | (SELECT count(*) FROM orders)
        | + (SELECT count(*) FROM orders WHERE o_orderkey%7=3)
        | + (SELECT count(*) FROM orders WHERE o_orderkey%13=6) AS n_records""".stripMargin,

    "s7_snapshot_matrix" ->
      """WITH c AS (SELECT count(*) AS r,
        |  (SELECT count(*) FROM orders WHERE o_orderkey%7=3)
        |  + (SELECT count(*) FROM orders WHERE o_orderkey%13=6) AS st
        | FROM orders)
        |SELECT 'always_resume' AS mode, r AS n_read, st AS n_stream FROM c
        |UNION ALL SELECT 'initial_fresh', r, st FROM c
        |UNION ALL SELECT 'initial_resume', 0, st FROM c
        |UNION ALL SELECT 'initial_only_fresh', r, 0 FROM c
        |UNION ALL SELECT 'no_data', 0, st FROM c
        |UNION ALL SELECT 'when_needed_resume', 0, st FROM c
        |UNION ALL SELECT 'when_needed_incomplete', r, st FROM c
        |UNION ALL SELECT 'recovery_resume', 0, st FROM c
        |UNION ALL SELECT 'config_data_only', r, 0 FROM c
        |UNION ALL SELECT 'custom_stream_only', 0, st FROM c""".stripMargin
  )

  override val duckdbOnly: Set[String] = Set(
    "c_decimal_handling", "c_time_precision", "c_time_isostring",
    "c_binary_handling", "c_interval_handling", "c_hstore_handling",
    "c_unsigned_handling", "c_money_handling",
    "c_custom_converter", "c_structured_temporal", "t9_document_infer")
}
