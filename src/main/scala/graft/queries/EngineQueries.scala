package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.EngineConfig
import graft.sources.ChangeFeedGen

/** §3.1 embedded-engine entry: pipelines configured from a flat
  * reference-keyed properties map (`graft.EngineConfig`) — the exact key
  * names and SMT/storage class-name values a reference user's connector
  * `.properties` file carries, compiled to the engine's declarative
  * pipeline and verified against DuckDB oracles.
  */
object EngineQueries extends QueryGroup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The full connector-properties surface on one pipeline: include list,
    // column exclude, dynamic mask/truncate key families, a ContentBasedRouter,
    // a predicated scripted Filter (TopicNameMatches gate), and
    // ExtractNewRecordState with delete rewrite + add.fields — all from
    // reference property keys, nothing programmatic.
    "e_props_pipeline" -> ((s, dir) => {
      val props = Map(
        "name" -> "graft-engine-test",
        "connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
        "topic.prefix" -> "graft",
        "tombstones.on.delete" -> "true",
        "snapshot.mode" -> "initial",
        "table.include.list" -> "^part$",
        "column.exclude.list" -> "main.part.p_brand",
        "column.mask.hash.SHA-256.with.salt.s3cr3t" -> "main.part.p_name",
        "column.truncate.to.5.chars" -> "main.part.p_type",
        "transforms" -> "route,filter,unwrap",
        "transforms.route.type" -> "io.debezium.transforms.ContentBasedRouter",
        "transforms.route.language" -> "spark.sql",
        "transforms.route.topic.expression" ->
          "concat('part-', CAST(pmod(key.p_partkey, 2) AS STRING))",
        "transforms.filter.type" -> "io.debezium.transforms.Filter",
        "transforms.filter.language" -> "spark.sql",
        "transforms.filter.condition" ->
          "coalesce(after.p_size, before.p_size) > 25",
        "transforms.filter.null.handling.mode" -> "drop",
        "transforms.filter.predicate" -> "oddtopic",
        "transforms.filter.negate" -> "false",
        "predicates" -> "oddtopic",
        "predicates.oddtopic.type" ->
          "org.apache.kafka.connect.transforms.predicates.TopicNameMatches",
        "predicates.oddtopic.pattern" -> "part-1",
        "transforms.unwrap.type" -> "io.debezium.transforms.ExtractNewRecordState",
        "transforms.unwrap.delete.tombstone.handling.mode" -> "rewrite",
        "transforms.unwrap.add.fields" -> "op")
      val compiled = EngineConfig.compile(props, table = "part")
      val fd = ChangeFeedGen.standardFeed(t(s, dir, "part"), "part",
        tombstonesOnDelete = compiled.tombstonesOnDelete)
      compiled.run(fd)
        .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"),
          col("p_retailprice"), col("__deleted"), col("__op"))
    }),

    // snapshot.select.statement.overrides from properties: the snapshot
    // phase reads only rows matching the override WHERE; the stream phase
    // is untouched (ref RelationalDatabaseConnectorConfig.java:348)
    "e_props_snapshot_override" -> ((s, dir) => {
      val compiled = EngineConfig.compile(Map(
        "snapshot.mode" -> "initial",
        "snapshot.select.statement.overrides" -> "inventory.orders",
        "snapshot.select.statement.overrides.inventory.orders" ->
          "SELECT * FROM inventory.orders WHERE o_totalprice > 200000"),
        table = "orders")
      compiled.run(feed(s, dir, "orders"))
        .select(coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
          .as("o_orderkey"), col("op"), col("source.pos").as("pos"))
    }),

    // Outbox routing from properties only (reference outbox quick-start
    // config: one EventRouter SMT with the table.field.event.* keys)
    "e_props_outbox" -> ((s, dir) => {
      val ob = t(s, dir, "orders").select(
        col("o_orderkey").cast("string").as("id"),
        col("o_orderstatus").as("aggregatetype"),
        col("o_custkey").cast("string").as("aggregateid"),
        col("o_orderpriority").as("type"),
        concat(lit("{\"order\":"), col("o_orderkey"), lit("}")).as("payload"))
      val fd = ChangeFeedGen.feed(ob, "outbox", col("id").cast("long"),
        Map.empty, pkOverride = Some(Seq("id")))
      val compiled = EngineConfig.compile(Map(
        "snapshot.mode" -> "initial",
        "transforms" -> "outbox",
        "transforms.outbox.type" -> "io.debezium.transforms.outbox.EventRouter",
        "transforms.outbox.route.by.field" -> "aggregatetype",
        "transforms.outbox.table.field.event.key" -> "aggregateid",
        "transforms.outbox.table.field.event.payload" -> "payload"),
        table = "outbox")
      compiled.run(fd).select(col("topic"), col("key"), col("value"),
        col("id"), col("type"))
    }),

    // Storage backends resolved from reference class names: offsets commit
    // through a properties-selected FileOffsetBackingStore and survive a
    // "restart" (fresh instance over the same file); the schema history
    // replays through the properties-selected FileSchemaHistory.
    "e_props_storage" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("e-props-store")
      val compiled = EngineConfig.compile(Map(
        "offset.storage" -> "org.apache.kafka.connect.storage.FileOffsetBackingStore",
        "offset.storage.file.filename" -> s"$tmp/offsets.dat",
        "schema.history.internal" -> "io.debezium.storage.file.history.FileSchemaHistory",
        "schema.history.internal.file.filename" -> s"$tmp/history.dat"))
      val cut = t(s, dir, "orders")
        .agg(max(col("o_orderkey")).cast("long")).head.getLong(0) * 7
      compiled.offsetStore.get.apply().set("orders", cut.toString)
      val recovered = compiled.offsetStore.get.apply().get("orders").get.toLong
      val h = compiled.history.get.apply()
      h.append("CREATE TABLE t (id INT)")
      h.append("ALTER TABLE t ADD COLUMN v VARCHAR")
      val replayed = compiled.history.get.apply().readAll()
      require(replayed.size == 2 && replayed.head.startsWith("CREATE"),
        s"history replay mismatch: $replayed")
      feed(s, dir, "orders").filter(col("source.pos") > recovered)
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          min(col("source.pos")).as("min_pos"),
          max(col("source.pos")).as("max_pos"))
    }),

    // §3.3 JDBC sink, LIVE: the orders change feed applies to an embedded
    // Derby target through the reference-keyed sink config (upsert +
    // delete.enabled + record_key + basic evolution), partition-parallel
    // executor connections; the target table reads back declaratively and
    // must equal the latest materialized state.
    "k_jdbc_sink_upsert" -> ((s, dir) => {
      import graft.sinks.JdbcChangeEventSink
      val u = s"jdbc:derby:${java.nio.file.Files.createTempDirectory("k-jdbc-sink")}/db;create=true"
      val cfg = JdbcChangeEventSink.fromProps(Map(
        "connection.url" -> u,
        "insert.mode" -> "upsert",
        "delete.enabled" -> "true",
        "primary.key.mode" -> "record_key",
        "schema.evolution" -> "basic"))
      JdbcChangeEventSink.write(feed(s, dir, "orders"), "orders_sink", cfg,
        numPartitions = 8)
      val back = JdbcChangeEventSink.readTable(s, u, "orders_sink")
      back.toDF(back.columns.map(_.toLowerCase).toIndexedSeq: _*)
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    }),

    // The COMPLETE reference user story in two properties maps: a source
    // config (snapshot mode, include list, dynamic mask key, file offset
    // store) feeding a sink config (upsert + delete into Derby) — engine
    // wiring end to end with the offset committed after the flush, exactly
    // the embedded-engine lifecycle.
    "e_props_end_to_end" -> ((s, dir) => {
      import graft.sinks.JdbcChangeEventSink
      val tmp = java.nio.file.Files.createTempDirectory("e2e-props")
      val src = EngineConfig.compile(Map(
        "name" -> "orders-e2e",
        "snapshot.mode" -> "initial",
        "table.include.list" -> "^orders$",
        "column.mask.with.1.chars" -> "main.orders.o_orderpriority",
        "offset.storage" ->
          "org.apache.kafka.connect.storage.FileOffsetBackingStore",
        "offset.storage.file.filename" -> s"$tmp/offsets.dat"),
        table = "orders")
      val events = src.run(ChangeFeedGen.standardFeed(
        t(s, dir, "orders"), "orders",
        tombstonesOnDelete = src.tombstonesOnDelete))
      val url = s"jdbc:derby:$tmp/db;create=true"
      val sink = JdbcChangeEventSink.fromProps(Map(
        "connection.url" -> url,
        "insert.mode" -> "upsert",
        "delete.enabled" -> "true",
        "primary.key.mode" -> "record_key",
        "schema.evolution" -> "basic"))
      JdbcChangeEventSink.write(events, "orders_e2e", sink, numPartitions = 8)
      // the embedded-engine offset commit: flushed position -> store,
      // recovered by a fresh instance (the restart path)
      val maxPos = events.agg(max(col("source.pos"))).head.getLong(0)
      src.offsetStore.get.apply().set("orders", maxPos.toString)
      require(src.offsetStore.get.apply().get("orders")
        .contains(maxPos.toString), "offset restart recovery failed")
      val back = JdbcChangeEventSink.readTable(s, url, "orders_e2e")
      back.toDF(back.columns.map(_.toLowerCase).toIndexedSeq: _*)
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    }),

    // Multi-table connector run: ONE properties map whose
    // table.include.list admits two tables (and excludes a third —
    // verified to produce zero events), each table's feed flowing
    // through the compiled pipeline into its own sink table on one
    // Derby target — the reference's one-connector-many-tables shape.
    // Output: per-table integrity summary (integer-exact).
    "e_props_multi_table" -> ((s, dir) => {
      import graft.sinks.JdbcChangeEventSink
      val tmp = java.nio.file.Files.createTempDirectory("mt-props")
      val url = s"jdbc:derby:$tmp/db;create=true"
      val props = Map(
        "name" -> "multi-e2e",
        "snapshot.mode" -> "initial",
        "table.include.list" -> "^(customer|supplier)$")
      val sinkCfg = JdbcChangeEventSink.fromProps(Map(
        "connection.url" -> url, "insert.mode" -> "upsert",
        "delete.enabled" -> "true", "primary.key.mode" -> "record_key",
        "schema.evolution" -> "basic"))
      Seq("customer", "supplier").foreach { tbl =>
        val src = EngineConfig.compile(props, table = tbl)
        val events = src.run(ChangeFeedGen.standardFeed(
          t(s, dir, tbl), tbl, tombstonesOnDelete = src.tombstonesOnDelete))
        JdbcChangeEventSink.write(events, s"${tbl}_mt", sinkCfg)
      }
      // the include list must FILTER a non-admitted table to nothing
      val excluded = EngineConfig.compile(props, table = "part")
        .run(ChangeFeedGen.standardFeed(t(s, dir, "part"), "part"))
      require(excluded.isEmpty, "excluded table leaked events")
      def back(tbl: String) = {
        val b = JdbcChangeEventSink.readTable(s, url, s"${tbl}_mt")
        b.toDF(b.columns.map(_.toLowerCase).toIndexedSeq: _*)
      }
      back("customer").agg(
          lit("customer").as("tbl"), count(lit(1)).as("n_rows"),
          sum(col("c_custkey")).cast("long").as("key_sum"),
          sum(floor(col("c_acctbal") * 100).cast("long"))
            .as("check_cents"))
        .unionAll(back("supplier").agg(
          lit("supplier").as("tbl"), count(lit(1)).as("n_rows"),
          sum(col("s_suppkey")).cast("long").as("key_sum"),
          sum(floor(col("s_acctbal") * 100).cast("long"))
            .as("check_cents")))
    }),

    // MongoDB sink over the LIVE wire (reference debezium-connector-mongodb
    // sink): row events as bulk replaceOne-upserts on _id, deletes as bulk
    // deleteOne, one OP_MSG session per executor partition against the
    // protocol-faithful write fixture server; the collection reads back via
    // `find` and must equal the latest materialized state.
    "k_mongo_sink_socket" -> ((s, dir) => {
      import graft.sinks.MongoChangeEventSink
      val (port, _, stats, server) = graft.tools.MongoSinkServer.serve()
      try {
        val cfg = MongoChangeEventSink.Config("127.0.0.1", port)
        MongoChangeEventSink.write(feed(s, dir, "orders"), "orders", cfg,
          numPartitions = 8)
        require(stats.deletes.get() > 0 && stats.upserts.get() > 0,
          s"sink must exercise upsert AND delete write models: $stats")
        MongoChangeEventSink.readCollection(s, cfg, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"),
            timestamp_micros(col("o_orderdate")).cast("timestamp_ntz")
              .as("o_orderdate"),
            col("o_orderpriority"))
      } finally server.close()
    }),

    // STREAMING JDBC sink with exactly-once epochs: the change feed streams
    // through a pos-ordered parquet transport in micro-batches, each
    // foreachBatch applies through the epoch-guarded writer; a deliberate
    // replay of epoch 0 afterwards must be skipped. Terminal Derby state ==
    // latest materialized state.
    "stream_jdbc_sink" -> ((s, dir) => {
      import graft.sinks.JdbcChangeEventSink
      import graft.streaming.StreamingMaterialize
      val tmp = java.nio.file.Files.createTempDirectory("stream-jdbc")
      val fd = feed(s, dir, "orders")
      val transport = s"$tmp/transport"
      StreamingMaterialize.writeTransport(fd, transport)
      val url = s"jdbc:derby:$tmp/db;create=true"
      val cfg = JdbcChangeEventSink.fromProps(Map(
        "connection.url" -> url, "insert.mode" -> "upsert",
        "delete.enabled" -> "true", "primary.key.mode" -> "record_key",
        "schema.evolution" -> "basic"))
      // measured (r9, idle 32-cpu A/B): narrowing the stream width HURTS
      // this query (16.5 s → 24.2 s) — the per-epoch upsert work inside
      // foreachBatch wants the session's full parallelism, so it keeps
      // the default width (StreamTuning is for state-store streams)
      val schema = s.read.parquet(transport).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(transport)
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          JdbcChangeEventSink.writeEpoch(batch, "orders_stream", cfg, epochId)
          ()
        }
        .start()
      q.awaitTermination()
      // replay guard: re-delivering an already-committed epoch is a no-op
      require(!JdbcChangeEventSink.writeEpoch(fd, "orders_stream", cfg, 0L),
        "epoch replay must be skipped")
      require(JdbcChangeEventSink.committedEpoch(cfg, "orders_stream")
        .exists(_ >= 1), "multiple epochs must have committed")
      val back = JdbcChangeEventSink.readTable(s, url, "orders_stream")
      back.toDF(back.columns.map(_.toLowerCase).toIndexedSeq: _*)
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    }),

    // Sink-side field filtering (reference debezium-sink
    // FieldFilterFactory): field.exclude.list drops value columns by
    // `column` or `topic:column` entry before DDL and DML — the target
    // table is created without them and rows never carry them. Keys
    // always pass. Exercises both entry grammars in one list.
    "k_jdbc_sink_field_filter" -> ((s, dir) => {
      import graft.sinks.JdbcChangeEventSink
      val tmp = java.nio.file.Files.createTempDirectory("jdbc-ff")
      val url = s"jdbc:derby:$tmp/db;create=true"
      val cfg = JdbcChangeEventSink.fromProps(Map(
        "connection.url" -> url, "insert.mode" -> "upsert",
        "delete.enabled" -> "true", "primary.key.mode" -> "record_key",
        "schema.evolution" -> "basic",
        "field.exclude.list" -> "supplier:s_name, s_nationkey"))
      JdbcChangeEventSink.write(feed(s, dir, "supplier"), "supplier", cfg)
      val back = JdbcChangeEventSink.readTable(s, url, "supplier")
      back.toDF(back.columns.map(_.toLowerCase).toIndexedSeq: _*)
    }),

    // §3.3 dialect statement shapes (reference per-database dialects) pinned
    // as data: every row is one generated statement.
    "k_jdbc_sink_dialects" -> ((s, dir) => {
      import graft.sinks.SqlDialects
      val k = Seq("id"); val v = Seq("name", "score")
      val rows = Seq(
        ("postgres", "upsert", SqlDialects.Postgres.upsert("t", k, v)),
        ("postgres", "upsert_keyonly", SqlDialects.Postgres.upsert("t", k, Nil)),
        ("mysql", "upsert", SqlDialects.MySql.upsert("t", k, v)),
        ("sqlserver", "upsert", SqlDialects.SqlServer.upsert("t", k, v)),
        ("oracle", "upsert", SqlDialects.Oracle.upsert("t", k, v)),
        ("db2", "upsert", SqlDialects.Db2.upsert("t", k, v)),
        ("db2", "upsert_keyonly", SqlDialects.Db2.upsert("t", k, Nil)),
        ("db2i", "upsert", SqlDialects.Db2i.upsert("t", k, v)),
        ("mariadb", "upsert", SqlDialects.MariaDb.upsert("t", k, v)),
        ("cockroachdb", "upsert", SqlDialects.CockroachDb.upsert("t", k, v)),
        ("singlestore", "upsert", SqlDialects.SingleStore.upsert("t", k, v)),
        ("starrocks", "upsert", SqlDialects.StarRocks.upsert("t", k, v)),
        ("starrocks", "create_table",
          SqlDialects.StarRocks.createTable("t",
            Seq(("name", "STRING", true), ("id", "BIGINT", false),
              ("score", "DOUBLE", true)), k)),
        ("postgres", "insert", SqlDialects.Postgres.insert("t", k, v)),
        ("postgres", "update", SqlDialects.Postgres.update("t", k, v)),
        ("postgres", "delete", SqlDialects.Postgres.delete("t", k)),
        // postgres.unnest.insert batch mode: one ?::type[] per COLUMN —
        // SQL text constant in batch size (single cached plan)
        ("postgres", "unnest_insert", SqlDialects.Postgres.unnestInsert("t",
          Seq("id" -> "int8"), Seq("name" -> "text", "score" -> "float8"))),
        ("postgres", "unnest_upsert", SqlDialects.Postgres.unnestUpsert("t",
          Seq("id" -> "int8"), Seq("name" -> "text", "score" -> "float8"))),
        ("postgres", "unnest_upsert_keyonly",
          SqlDialects.Postgres.unnestUpsert("t", Seq("id" -> "int8"), Nil)),
        // sqlserver.identity.insert: bracket with SET IDENTITY_INSERT
        ("sqlserver", "identity_insert",
          SqlDialects.SqlServer.identityInsertWrap("t",
            SqlDialects.SqlServer.insert("t", k, v))))
      import s.implicits._
      rows.toDF("dialect", "kind", "sql")
    })
  )

  def oracles: Map[String, String] = Map(
    "e_props_pipeline" ->
      """WITH ev AS (
        |  SELECT p_partkey AS k, 'r' AS op, p_name, p_type, p_size, p_retailprice FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'u', p_name, p_type, p_size, p_retailprice + 1.0 FROM part WHERE p_partkey % 7 = 3
        |  UNION ALL
        |  SELECT p_partkey, 'd', p_name, p_type, p_size, p_retailprice FROM part WHERE p_partkey % 13 = 6),
        | filt AS (
        |  SELECT * FROM ev WHERE (k % 2 = 0) OR (p_size > 25))
        |SELECT k AS p_partkey, sha256('s3cr3t' || p_name) AS p_name,
        | substring(p_type, 1, 5) AS p_type, p_size, p_retailprice,
        | CASE WHEN op = 'd' THEN 'true' ELSE 'false' END AS __deleted,
        | op AS __op
        |FROM filt""".stripMargin,

    "e_props_snapshot_override" ->
      """SELECT o_orderkey, 'r' AS op, o_orderkey*10 AS pos FROM orders WHERE o_totalprice > 200000
        |UNION ALL
        |SELECT o_orderkey, 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "e_props_outbox" ->
      """WITH ob AS (
        |  SELECT CAST(o_orderkey AS VARCHAR(30)) AS id, o_orderstatus AS aggregatetype,
        |   CAST(o_custkey AS VARCHAR(30)) AS key, o_orderpriority AS type,
        |   concat('{"order":', o_orderkey, '}') AS value, o_orderkey AS k
        |  FROM orders)
        |SELECT 'outbox.event.' || aggregatetype AS topic, key, value, id, type FROM ob
        |UNION ALL
        |SELECT 'outbox.event.' || aggregatetype, key, value, id, type FROM ob WHERE k % 7 = 3""".stripMargin,

    "e_props_storage" ->
      """WITH c AS (SELECT CAST(max(o_orderkey)*7 AS BIGINT) AS cut FROM orders),
        | ev AS (
        |  SELECT 'r' AS op, o_orderkey*10 AS pos FROM orders
        |  UNION ALL
        |  SELECT 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
        |  UNION ALL
        |  SELECT 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
        |SELECT op, count(*) AS n, min(pos) AS min_pos, max(pos) AS max_pos
        |FROM ev, c WHERE pos > cut GROUP BY op""".stripMargin,

    // mask.with.1.chars renders o_orderpriority as a single star in BOTH
    // images before the sink sees the event
    "e_props_end_to_end" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        | o_totalprice, o_orderdate, '*' AS o_orderpriority
        |FROM orders WHERE o_orderkey%13<>6""".stripMargin,

    "e_props_multi_table" ->
      """WITH c AS (SELECT c_custkey,
        |   CASE WHEN c_custkey%7=3 THEN c_acctbal+100.0 ELSE c_acctbal END AS bal
        |  FROM customer WHERE c_custkey%13<>6),
        | sp AS (SELECT s_suppkey,
        |   CASE WHEN s_suppkey%7=3 THEN s_acctbal+100.0 ELSE s_acctbal END AS bal
        |  FROM supplier WHERE s_suppkey%13<>6)
        |SELECT 'customer' AS tbl, count(*) AS n_rows,
        | CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(floor(bal*100) AS BIGINT)) AS BIGINT) AS check_cents
        |FROM c
        |UNION ALL
        |SELECT 'supplier', count(*),
        | CAST(sum(s_suppkey) AS BIGINT),
        | CAST(sum(CAST(floor(bal*100) AS BIGINT)) AS BIGINT)
        |FROM sp""".stripMargin,

    "k_mongo_sink_socket" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        | o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey%13<>6""".stripMargin,

    "stream_jdbc_sink" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        | o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey%13<>6""".stripMargin,

    "k_jdbc_sink_upsert" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        | o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey%13<>6""".stripMargin,

    "k_jdbc_sink_field_filter" ->
      """SELECT s_suppkey,
        | CASE WHEN s_suppkey%7=3 THEN s_acctbal+100.0 ELSE s_acctbal END AS s_acctbal
        |FROM supplier WHERE s_suppkey%13<>6""".stripMargin,

    "k_jdbc_sink_dialects" ->
      """SELECT * FROM (VALUES
        | ('postgres', 'upsert', 'INSERT INTO t (id,name,score) VALUES (?,?,?) ON CONFLICT (id) DO UPDATE SET name=EXCLUDED.name,score=EXCLUDED.score'),
        | ('postgres', 'upsert_keyonly', 'INSERT INTO t (id) VALUES (?) ON CONFLICT (id) DO NOTHING'),
        | ('mysql', 'upsert', 'INSERT INTO t (id, name, score) VALUES (?, ?, ?) AS new ON DUPLICATE KEY UPDATE name=new.name,score=new.score'),
        | ('sqlserver', 'upsert', 'MERGE INTO t WITH (HOLDLOCK) AS TARGET USING (SELECT ? AS id, ? AS name, ? AS score) AS INCOMING ON (TARGET.id=INCOMING.id) WHEN MATCHED THEN UPDATE SET name=INCOMING.name,score=INCOMING.score WHEN NOT MATCHED THEN INSERT (name, score, id) VALUES (INCOMING.name,INCOMING.score,INCOMING.id);'),
        | ('oracle', 'upsert', 'MERGE INTO t USING (SELECT ? id, ? name, ? score FROM dual) INCOMING ON (t.id=INCOMING.id) WHEN MATCHED THEN UPDATE SET t.name=INCOMING.name,t.score=INCOMING.score WHEN NOT MATCHED THEN INSERT (name,score,id) VALUES (INCOMING.name,INCOMING.score,INCOMING.id)'),
        | ('db2', 'upsert', 'merge into t using (values(?,?,?)) as DAT(id,name,score) on t.id=DAT.id WHEN MATCHED THEN UPDATE SET t.name=DAT.name, t.score=DAT.score WHEN NOT MATCHED THEN INSERT(name,score,id) values (DAT.name,DAT.score,DAT.id)'),
        | ('db2', 'upsert_keyonly', 'merge into t using (values(?)) as DAT(id) on t.id=DAT.id WHEN NOT MATCHED THEN INSERT(id) values (DAT.id)'),
        | ('db2i', 'upsert', 'merge into t as TGT using (select ? as id,? as name,? as score from sysibm.sysdummy1) as DAT on TGT.id=DAT.id WHEN MATCHED THEN UPDATE SET name=DAT.name, score=DAT.score WHEN NOT MATCHED THEN INSERT(name,score,id) values (DAT.name,DAT.score,DAT.id)'),
        | ('mariadb', 'upsert', 'INSERT INTO t (id, name, score) VALUES (?, ?, ?) ON DUPLICATE KEY UPDATE name=VALUES(name),score=VALUES(score)'),
        | ('cockroachdb', 'upsert', 'INSERT INTO t (id,name,score) VALUES (?,?,?) ON CONFLICT (id) DO UPDATE SET name=EXCLUDED.name,score=EXCLUDED.score'),
        | ('singlestore', 'upsert', 'INSERT INTO t (id, name, score) VALUES (?, ?, ?) ON DUPLICATE KEY UPDATE name=VALUES(name),score=VALUES(score)'),
        | ('starrocks', 'upsert', 'INSERT INTO t (id, name, score) VALUES (?, ?, ?)'),
        | ('starrocks', 'create_table', 'CREATE TABLE t (id BIGINT NOT NULL, name STRING NULL, score DOUBLE NULL) PRIMARY KEY (id) DISTRIBUTED BY HASH (id)'),
        | ('postgres', 'insert', 'INSERT INTO t (id, name, score) VALUES (?, ?, ?)'),
        | ('postgres', 'update', 'UPDATE t SET name=?, score=? WHERE id=?'),
        | ('postgres', 'delete', 'DELETE FROM t WHERE id=?'),
        | ('postgres', 'unnest_insert', 'INSERT INTO t (id,name,score) SELECT * FROM UNNEST(?::int8[],?::text[],?::float8[])'),
        | ('postgres', 'unnest_upsert', 'INSERT INTO t (id,name,score) SELECT * FROM UNNEST(?::int8[],?::text[],?::float8[]) ON CONFLICT (id) DO UPDATE SET name=EXCLUDED.name,score=EXCLUDED.score'),
        | ('postgres', 'unnest_upsert_keyonly', 'INSERT INTO t (id) SELECT * FROM UNNEST(?::int8[]) ON CONFLICT (id) DO NOTHING'),
        | ('sqlserver', 'identity_insert', 'SET IDENTITY_INSERT t ON ;INSERT INTO t (id, name, score) VALUES (?, ?, ?);SET IDENTITY_INSERT t OFF ;')
        |) AS t(dialect, kind, sql)""".stripMargin
  )

  override val duckdbOnly: Set[String] = Set("e_props_pipeline")
}
