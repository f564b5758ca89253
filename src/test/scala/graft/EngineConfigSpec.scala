package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Snapshotter
import graft.operators.TypeHandling

/** Key-by-key parsing of the reference-properties surface
  * (`graft.EngineConfig` ← reference `EmbeddedEngineConfig.java` /
  * `CommonConnectorConfig.java` / `RelationalDatabaseConnectorConfig.java`
  * key names). The end-to-end pipeline semantics are oracled in
  * `EngineQueries` (`e_props_*`); this spec pins the config → spec
  * translation itself.
  */
class EngineConfigSpec extends AnyFunSuite {

  test("dynamic column key families resolve fully-qualified names per table") {
    val c = EngineConfig.compile(Map(
      "column.mask.hash.SHA-256.with.salt.pep" -> "db.part.p_name,db.other.o_x",
      "column.mask.with.6.chars" -> "db.part.p_type,bare_col",
      "column.truncate.to.12.chars" -> "db.part.p_comment"),
      table = "part")
    assert(c.spec.masks("p_name") == Pipeline.Mask.SaltedHash("pep"))
    // other-table entries are dropped
    assert(!c.spec.masks.contains("o_x"))
    assert(c.spec.masks("p_type") == Pipeline.Mask.Constant("******"))
    // bare column names always apply
    assert(c.spec.masks.contains("bare_col"))
    assert(c.spec.truncates("p_comment") == 12)
  }

  test("non-SHA-256 mask algorithms are rejected") {
    val e = intercept[IllegalArgumentException] {
      EngineConfig.compile(Map(
        "column.mask.hash.MD5.with.salt.s" -> "part.p_name"), table = "part")
    }
    assert(e.getMessage.contains("SHA-256"))
  }

  test("include lists become alternation regexes; skipped.operations parses") {
    val c = EngineConfig.compile(Map(
      "table.include.list" -> "inventory\\.orders, inventory\\.cust.*",
      "skipped.operations" -> "u,d"))
    assert(c.spec.tableInclude.contains("(?:inventory\\.orders)|(?:inventory\\.cust.*)"))
    assert(c.spec.skippedOperations == Seq("u", "d"))
    assert(EngineConfig.compile(Map("skipped.operations" -> "none"))
      .spec.skippedOperations.isEmpty)
    // reference default: truncates skipped
    assert(EngineConfig.compile(Map.empty).spec.skippedOperations == Seq("t"))
  }

  test("snapshot.mode matrix incl. configuration_based and custom SPI") {
    def mode(m: String, extra: (String, String)*) =
      EngineConfig.compile(Map("snapshot.mode" -> m) ++ extra,
        custom = Map("my_snap" -> Snapshotter.Always)).spec.snapshotter
    assert(mode("initial") == Snapshotter.Initial)
    assert(mode("initial_only") == Snapshotter.InitialOnly)
    assert(mode("no_data") == Snapshotter.NoData)
    assert(mode("never") == Snapshotter.NoData) // legacy alias
    assert(mode("when_needed") == Snapshotter.WhenNeeded)
    assert(mode("recovery") == Snapshotter.Recovery)
    assert(mode("configuration_based",
      "snapshot.mode.configuration.based.snapshot.data" -> "true",
      "snapshot.mode.configuration.based.start.stream" -> "true") ==
      Snapshotter.ConfigurationBased(snapshotData = true,
        snapshotSchema = false, stream = true))
    assert(mode("custom", "snapshot.mode.custom.name" -> "my_snap") ==
      Snapshotter.Always)
    intercept[IllegalArgumentException](mode("custom"))
    intercept[IllegalArgumentException](mode("bogus"))
  }

  test("type handling modes parse; absent keys leave handling unset") {
    val c = EngineConfig.compile(Map(
      "decimal.handling.mode" -> "string",
      "time.precision.mode" -> "isostring",
      "binary.handling.mode" -> "hex"))
    val th = c.spec.typeHandling.get
    assert(th.decimalMode == TypeHandling.DecimalMode.AsString)
    assert(th.timePrecision == TypeHandling.TimePrecisionMode.IsoString)
    assert(th.binaryMode == TypeHandling.BinaryMode.Hex)
    assert(EngineConfig.compile(Map.empty).spec.typeHandling.isEmpty)
    intercept[IllegalArgumentException](
      EngineConfig.compile(Map("decimal.handling.mode" -> "float")))
  }

  test("transform chain preserves order, resolves predicates, rejects unknowns") {
    val c = EngineConfig.compile(Map(
      "transforms" -> "a, b",
      "transforms.a.type" -> "io.debezium.transforms.ExtractChangedRecordState",
      "transforms.b.type" -> "io.debezium.transforms.Filter",
      "transforms.b.language" -> "spark.sql",
      "transforms.b.condition" -> "op = 'u'",
      "transforms.b.predicate" -> "p1",
      "transforms.b.negate" -> "true",
      "predicates" -> "p1",
      "predicates.p1.type" ->
        "org.apache.kafka.connect.transforms.predicates.RecordIsTombstone"))
    assert(c.chain.map(_.name) == Seq("a", "b"))
    assert(c.chain.head.smtClass.endsWith("ExtractChangedRecordState"))

    intercept[IllegalArgumentException](EngineConfig.compile(Map(
      "transforms" -> "x", "transforms.x.type" -> "com.example.Unknown")))
    // scripted SMTs only evaluate Spark SQL here (documented divergence)
    val e = intercept[IllegalArgumentException](EngineConfig.compile(Map(
      "transforms" -> "f",
      "transforms.f.type" -> "io.debezium.transforms.Filter",
      "transforms.f.language" -> "jsr223.groovy",
      "transforms.f.condition" -> "value.op == 'u'")))
    assert(e.getMessage.contains("spark.sql"))
  }

  test("DecodeLogicalDecodingMessageContent resolves from properties") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StructType
    val spark = SparkTestSession.get
    import spark.implicits._
    val c = EngineConfig.compile(Map(
      "transforms" -> "dm",
      "transforms.dm.type" ->
        "io.debezium.connector.postgresql.transforms.DecodeLogicalDecodingMessageContent"))
    val msgs = Seq(("""{"id":9,"who":"a"}""", 5L)).toDF("json", "ts_ms")
      .select(
        struct(lit("pfx").as("prefix")).as("key"),
        struct(lit("pfx").as("prefix"),
          col("json").cast("binary").as("content")).as("message"),
        lit("m").as("op"), col("ts_ms"))
    val out = c.chain.foldLeft(msgs)((df, l) => l.apply(df))
    val after = out.schema("after").dataType.asInstanceOf[StructType]
    assert(after.fieldNames.toSet == Set("id", "who"))
    val r = out.select(col("op"), col("after.id")).head()
    assert(r.getString(0) == "c" && r.getLong(1) == 9L)
  }

  test("message.key.columns parses the db.table:cols;... grammar") {
    val c = EngineConfig.compile(Map(
      "message.key.columns" ->
        "inventory.orders:o_custkey,o_orderdate;inventory.customer:c_name"))
    assert(c.keyOverrideFor("orders").contains(Seq("o_custkey", "o_orderdate")))
    assert(c.keyOverrideFor("customer").contains(Seq("c_name")))
    assert(c.keyOverrideFor("part").isEmpty)
  }

  test("storage backends resolve from reference class names and round-trip") {
    val tmp = Files.createTempDirectory("ec-store")
    val c = EngineConfig.compile(Map(
      "offset.storage" -> "org.apache.kafka.connect.storage.FileOffsetBackingStore",
      "offset.storage.file.filename" -> s"$tmp/o.dat",
      "schema.history.internal" -> "io.debezium.storage.file.history.FileSchemaHistory",
      "schema.history.internal.file.filename" -> s"$tmp/h.dat"))
    c.offsetStore.get.apply().set("k", "v1")
    assert(c.offsetStore.get.apply().get("k").contains("v1"))
    c.history.get.apply().append("ddl-1")
    assert(c.history.get.apply().readAll() == Seq("ddl-1"))

    val mem = EngineConfig.compile(Map(
      "offset.storage" -> "org.apache.kafka.connect.storage.MemoryOffsetBackingStore",
      "schema.history.internal" -> "io.debezium.relational.history.MemorySchemaHistory"))
    assert(mem.offsetStore.get.apply().snapshot.isEmpty)
    assert(mem.history.get.apply().readAll().isEmpty)

    // missing backend parameter is a config-time error
    intercept[IllegalArgumentException](EngineConfig.compile(Map(
      "offset.storage" -> "org.apache.kafka.connect.storage.FileOffsetBackingStore")))
    intercept[IllegalArgumentException](EngineConfig.compile(Map(
      "offset.storage" -> "com.example.UnknownStore")))
  }

  test("converters resolve through the SPI factory registry with their params") {
    import org.apache.spark.sql.types.StructField
    var seenParams: Map[String, String] = Map.empty
    val factory: EngineConfig.ConverterFactory = params => {
      seenParams = params
      new graft.operators.CustomConverter {
        def converterFor(table: String, field: StructField) = None
      }
    }
    val c = EngineConfig.compile(Map(
      "converters" -> "isbn",
      "isbn.type" -> "com.example.IsbnConverter",
      "isbn.schema.name" -> "io.example.isbn"),
      converterRegistry = Map("com.example.IsbnConverter" -> factory))
    assert(c.spec.converters.size == 1)
    assert(seenParams("schema.name") == "io.example.isbn")
    intercept[IllegalArgumentException](EngineConfig.compile(Map(
      "converters" -> "x", "x.type" -> "com.example.Unregistered")))
  }

  test("name adjustment modes map to the avro-safe sanitizer") {
    val c = EngineConfig.compile(Map(
      "schema.name.adjustment.mode" -> "avro",
      "field.name.adjustment.mode" -> "none"))
    assert(c.schemaNameAdjuster("9my-topic.x") == "_9my_topic_x")
    assert(c.fieldNameAdjuster("9my-topic.x") == "9my-topic.x")
    intercept[IllegalArgumentException](EngineConfig.compile(Map(
      "schema.name.adjustment.mode" -> "bogus")))
  }

  test("unwrap SMT: add.headers, custom prefixes, route.by.field from properties") {
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((5L, "A", "c"), (6L, "B", "u")).toDF("id", "v", "opv")
    val payload = struct(col("id"), col("v"))
    val fd = rows.select(
      struct(col("id")).as("key"),
      lit(null).cast("struct<id:bigint,v:string>").as("before"),
      payload.as("after"),
      col("opv").as("op"),
      graft.model.Envelope.sourceStruct("t", lit(1L), lit("tx1"),
        lit("false")).as("source"),
      lit(null).cast(graft.model.Envelope.transactionSchema).as("transaction"),
      lit(1700000000000L).as("ts_ms"))
    val c = EngineConfig.compile(Map(
      "transforms" -> "u",
      "transforms.u.type" -> "io.debezium.transforms.ExtractNewRecordState",
      "transforms.u.delete.tombstone.handling.mode" -> "rewrite",
      "transforms.u.add.fields" -> "op,source.pos",
      "transforms.u.add.fields.prefix" -> "meta_",
      "transforms.u.add.headers" -> "op",
      "transforms.u.route.by.field" -> "v"))
    val out = c.run(fd)
    assert(out.columns.toSeq ==
      Seq("id", "v", "__deleted", "meta_op", "meta_pos", "headers", "topic"))
    val r = out.orderBy("id").collect()
    assert(r(0).getAs[Map[String, String]]("headers") == Map("__op" -> "c"))
    assert(r(0).getAs[String]("topic") == "A")
    assert(r(1).getAs[Long]("meta_pos") == 1L)
  }

  test("snapshot override parses SELECT * WHERE; projections rejected") {
    val c = EngineConfig.compile(Map(
      "snapshot.select.statement.overrides" -> "db.orders",
      "snapshot.select.statement.overrides.db.orders" ->
        "SELECT * FROM db.orders WHERE price > 10"),
      table = "orders")
    assert(c.snapshotOverrideWhere.contains("price > 10"))
    // no override declared for this table
    assert(EngineConfig.compile(Map(
      "snapshot.select.statement.overrides.db.customer" -> "SELECT * FROM db.customer"),
      table = "orders").snapshotOverrideWhere.isEmpty)
    // bare SELECT * (no WHERE) is a no-op override
    assert(EngineConfig.compile(Map(
      "snapshot.select.statement.overrides.db.orders" -> "SELECT * FROM db.orders"),
      table = "orders").snapshotOverrideWhere.isEmpty)
    val e = intercept[IllegalArgumentException](EngineConfig.compile(Map(
      "snapshot.select.statement.overrides.db.orders" ->
        "SELECT a, b FROM db.orders"), table = "orders"))
    assert(e.getMessage.contains("column.include.list"))
  }

  test("failure handling: fail raises at execution, warn/skip drop") {
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, "ok"), (2, "bad")).toDF("id", "st")
    val skip = EngineConfig.compile(Map(
      "event.processing.failure.handling.mode" -> "skip"))
    assert(skip.handleFailures(df, col("st") === "ok").count() == 1)
    val failMode = EngineConfig.compile(Map.empty) // reference default: fail
    assert(failMode.failureHandlingMode == "fail")
    val e = intercept[Exception] {
      failMode.handleFailures(df, col("st") === "ok").count()
    }
    assert(e.getMessage.contains("event processing failed") ||
      Option(e.getCause).exists(_.getMessage.contains("event processing failed")))
    // all-valid passes untouched under fail
    assert(failMode.handleFailures(df, lit(true)).count() == 2)
  }

  test("tombstones.on.delete defaults true; engine identity fields surface") {
    val c = EngineConfig.compile(Map(
      "name" -> "engine-1",
      "connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
      "topic.prefix" -> "prod"))
    assert(c.tombstonesOnDelete)
    assert(!EngineConfig.compile(Map("tombstones.on.delete" -> "false"))
      .tombstonesOnDelete)
    assert(c.engineName == "engine-1")
    assert(c.connectorClass.endsWith("MySqlConnector"))
    assert(c.topicPrefix == "prod")
  }

  test("bootstrap lists and IPv6 addresses parse; kafka offset store resolves") {
    // multi-host bootstrap list: first entry wins
    val (port, _, _) = graft.tools.KafkaWireServer.serve()
    val c = graft.EngineConfig.compile(Map(
      "offset.storage" ->
        "org.apache.kafka.connect.storage.KafkaOffsetBackingStore",
      "offset.storage.kafka.bootstrap.servers" ->
        s"127.0.0.1:$port, other-host:9092",
      "offset.storage.topic" -> "cfg-offsets"))
    val st = c.offsetStore.get.apply()
    st.set("orders", "42")
    assert(st.get("orders").contains("42"))
    // IPv6 form parses (connection not attempted — parse only)
    intercept[IllegalArgumentException] {
      graft.EngineConfig.compile(Map(
        "offset.storage" ->
          "org.apache.kafka.connect.storage.KafkaOffsetBackingStore",
        "offset.storage.kafka.bootstrap.servers" -> "no-port-here",
        "offset.storage.topic" -> "t"))
    }
  }

  test("snapshot override WHERE survives literals containing column names") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.get
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val compiled = graft.EngineConfig.compile(Map(
      "snapshot.mode" -> "initial",
      "snapshot.select.statement.overrides" -> "inventory.orders",
      "snapshot.select.statement.overrides.inventory.orders" ->
        "SELECT * FROM inventory.orders WHERE o_orderpriority <> 'no o_orderkey here' AND o_totalprice > 200000"),
      table = "orders")
    val out = compiled.run(graft.sources.ChangeFeedGen.standardFeed(df, "orders"))
    val reads = out.filter(col("op") === "r")
    // the literal containing a column name must NOT be rewritten: the
    // predicate filters on price only (priority literal never matches)
    assert(reads.count() ==
      df.filter(col("o_totalprice") > 200000).count())
  }

  test("override WHERE resolves payload fields shadowing envelope columns") {
    // a payload column named like an envelope field (op, ts_ms, key …)
    // must neither throw AMBIGUOUS_REFERENCE nor resolve to the
    // envelope: the reference's override statement is SQL against the
    // SOURCE table and sees only its columns
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.get
    import spark.implicits._
    val base = Seq((1L, "keep", 5L), (2L, "drop", 6L), (3L, "keep", 0L))
      .toDF("id", "op", "ts_ms")
    val fd = graft.sources.ChangeFeedGen.feed(
      base, "t", base("id"), Map.empty, Some(Seq("id")))
    val compiled = graft.EngineConfig.compile(Map(
      "snapshot.select.statement.overrides" -> "db.t",
      "snapshot.select.statement.overrides.db.t" ->
        "SELECT * FROM db.t WHERE op = 'keep' AND ts_ms > 0"), table = "t")
    val out = compiled.run(fd)
    // envelope op is still the frame's op column after the rewrite
    val reads = out.filter(col("op") === "r")
    assert(reads.count() == 1)
    assert(reads.select(col("after.id")).head.getLong(0) == 1L)
    assert(out.columns.toSeq == fd.columns.toSeq)
  }
}
