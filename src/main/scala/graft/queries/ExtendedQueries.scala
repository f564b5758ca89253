package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.operators.{Docling, IncrementalSnapshot, Router, Transforms}
import graft.streaming.{MergeSink, Notifications}

/** Pipeline DSL, sink insert modes, remaining converters and the sketch /
  * grouping analytics (SURVEY §7.1, K3, T11, T20, R4, P7, §2.6 extras).
  */
object ExtendedQueries extends QueryGroup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §7.1: full connector-config pipeline compiled to one Catalyst chain
    "pl_pipeline_dsl" -> ((s, dir) =>
      Pipeline(feed(s, dir, "customer"), Pipeline.Spec(
        columnExclude = Set("c_nationkey"),
        masks = Map("c_name" -> Pipeline.Mask.SaltedHash("s")),
        truncates = Map("c_mktsegment" -> 4),
        filterExpr = Some("coalesce(after.c_acctbal, before.c_acctbal) > 0"),
        unwrapDeleteMode = Some("rewrite"),
        unwrapAddFields = Seq("op", "source.pos")))),

    // K3: insert modes — upsert, then update-only, then insert-only
    "k3_insert_modes" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def env(df: DataFrame, status: org.apache.spark.sql.Column,
              posOff: Long, op: String) = df.select(
        struct(col("o_orderkey")).as("key"),
        lit(null).cast(o.schema).as("before"),
        struct(col("o_orderkey"), col("o_custkey"), status.as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
          .as("after"),
        lit(op).as("op"),
        struct((col("o_orderkey") + posOff).as("pos")).as("source"),
        lit(null).cast("string").as("transaction"),
        (col("o_orderkey") + posOff).as("ts_ms"))
      val sinkDir = java.nio.file.Files.createTempDirectory("k3-sink").toString
      val sink = new MergeSink(sinkDir)
      sink.merge(env(o.filter(col("o_orderkey") % 2 === 0),
        col("o_orderstatus"), 0L, "r"), 0L, "upsert")
      sink.merge(env(o, lit("U2"), 1000000000L, "u"), 1L, "update")
      sink.merge(env(o, lit("I"), 2000000000L, "c"), 2L, "insert")
      sink.view(s)
    }),

    // T11: schema metadata into a sub-struct
    "t11_extract_schema" -> ((s, dir) =>
      Transforms.extractSchemaInfo(feed(s, dir, "orders"))
        .filter(col("op") === "r")
        .select(col("key.o_orderkey").as("o_orderkey"), col("__schema.*"))),

    // T20: docling conversion via partition-session stub client
    "t20_docling" -> ((s, dir) => {
      val md = Docling.fieldToDocling(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", "markdown")
      md.select(col("doc_id"), md5(col("markdown")).as("md_hash"),
        length(col("markdown")).as("md_len"))
    }),

    // T20 over the LIVE service socket: every document POSTed to the
    // docling-serve REST endpoint, conversion done server-side,
    // md_content parsed from the JSON response
    "t20_docling_socket" -> ((s, dir) => {
      val (port, state, server) = graft.tools.DoclingHttpServer.serve()
      val md = Docling.fieldToDoclingHttp(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", "markdown", "127.0.0.1", port)
      val out = md.select(col("doc_id"), md5(col("markdown")).as("md_hash"),
        length(col("markdown")).as("md_len"))
      out.cache().count() // materialize before asserting on the service
      require(state.requests.get > 0 && state.badRequests == 0,
        s"service saw ${state.requests.get} requests, ${state.badRequests} bad")
      server.stop(0)
      out
    }),

    // R4: TimescaleDB chunk→hypertable routing
    "r4_timescale_router" -> ((s, dir) => {
      val chunks = t(s, dir, "part").select(col("p_partkey"),
        concat(lit("_hyper_"), col("p_size") % 5, lit("_"), col("p_partkey"),
          lit("_chunk")).as("chunk_table"))
      Router.timescale(chunks, col("chunk_table"))
        .select(col("p_partkey"), col("physical_table"), col("hypertable"))
    }),

    // P7: snapshot progress notifications
    "p7_notifications" -> ((s, dir) =>
      Notifications.snapshotNotifications(
        IncrementalSnapshot.chunked(
          t(s, dir, "orders").select(col("o_orderkey")),
          Seq(col("o_orderkey")), 1024))),

    // §1.4 CRDT counters, distributed: per-replica G-Counter states with
    // at-least-once delivery (every 3rd state re-delivered); merge = MAX
    // per replica then SUM — double delivery must not double-count, so
    // the merged value equals the exact event count. Two map-side-
    // combinable aggregations, no window state at merge time.
    "q_crdt_counters" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type").as("k"),
        pmod(col("user_id"), lit(8)).as("replica"), col("ts"),
        col("event_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k"), col("replica"))
        .orderBy(col("ts"), col("event_id"))
      val states = e.withColumn("cum",
        count(lit(1)).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      val delivered = states.unionAll(states.filter(col("cum") % 3 === 0))
      delivered.groupBy(col("k"), col("replica"))
        .agg(max(col("cum")).as("m"))
        .groupBy(col("k")).agg(sum(col("m")).as("value"))
    }),

    // §2.6: exact distinct counts (approx twin asserted in spec)
    "q_distinct_users" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),

    // §2.6: hierarchical rollup aggregation
    "q_rollup" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .rollup(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
    }),

    // §2.6: CUBE — all grouping-set combinations incl. grouping ids
    // (distinguishes "NULL because aggregated away" from data NULLs)
    "q_cube" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("c_mktsegment")).cast("long").as("g_seg"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"))
    }),

    // §2.6: quantile summary (exact interpolated percentiles)
    "q_stats_summary" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))),

    // §2.8 serde: typed Dataset[ChangeEvent[K, V]] consumption (the
    // DebeziumSerdes equivalent) — lambdas over case-class views, deletes
    // unwrapped to None by `value`
    "f_serde_values" -> ((s, dir) => {
      import s.implicits._
      graft.serde.ChangeEvents
        .events[OrderKey, OrderPayload](feed(s, dir, "orders"))
        .flatMap(e => e.value.map(v =>
          (e.key.o_orderkey, v.o_orderstatus, e.source.pos, e.op)))
        .toDF("o_orderkey", "o_orderstatus", "pos", "op")
    }),

    // embedded-engine Avro format: flat change values encoded to Avro
    // BINARY per partition (real org.apache.avro codec, nullable-union
    // schema) and decoded back — the round trip must be identity, so
    // the oracle checks the decoded values directly
    "f_avro_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val flat = feed(s, dir, "orders").select(
        coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
          .as("o_orderkey"),
        coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))
          .as("o_orderstatus"),
        col("source.pos").as("pos"), col("op"))
      val schema = flat.schema
      val bytesDs = flat.mapPartitions { rows =>
        val avro = graft.serde.AvroFormat.avroSchema(schema) // per partition
        rows.map(r => graft.serde.AvroFormat.encode(r, schema, avro))
      }
      bytesDs.mapPartitions { payloads =>
        val avro = graft.serde.AvroFormat.avroSchema(schema)
        payloads.map { b =>
          // 4 union tags + varints + 2 strings: anything shorter is a
          // truncated payload
          require(b.length >= 8, s"implausible avro payload: ${b.length}B")
          val vs = graft.serde.AvroFormat.decode(b, schema, avro)
          (vs(0).asInstanceOf[Long], vs(1).asInstanceOf[String],
            vs(2).asInstanceOf[Long], vs(3).asInstanceOf[String])
        }
      }.toDF("o_orderkey", "o_orderstatus", "pos", "op")
    }),

    // §2.8 CloudEvents BINARY content mode with the avro data
    // content-type: attributes ride as ce_-prefixed HEADERS (Kafka
    // protocol binding), the value section holds ONLY the data,
    // serialized per the declared content-type through the real Avro
    // codec — the round trip decodes it back so the oracle can check
    // headers AND payload in one frame
    "f_cloudevents_binary" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val b = graft.functions.CloudEvents.binaryMode(
        feed(s, dir, "orders"), dataSerializer = "avro")
      val hm = map_from_entries(col("headers"))
      val flat = b.select(
        element_at(hm, "ce_id").as("ce_id"),
        element_at(hm, "ce_type").as("ce_type"),
        element_at(hm, "content-type").as("content_type"),
        coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
          .as("o_orderkey"),
        coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))
          .as("o_orderstatus"),
        col("op"))
      val dataSchema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("op", StringType)))
      flat.mapPartitions { rows =>
        val avro = graft.serde.AvroFormat.avroSchema(dataSchema)
        rows.map { r =>
          val data = org.apache.spark.sql.Row(
            r.getAs[Long]("o_orderkey"), r.getAs[String]("o_orderstatus"),
            r.getAs[String]("op"))
          val payload = graft.serde.AvroFormat.encode(data, dataSchema, avro)
          require(payload.length >= 4,
            s"implausible avro payload: ${payload.length}B")
          val vs = graft.serde.AvroFormat.decode(payload, dataSchema, avro)
          (r.getAs[String]("ce_id"), r.getAs[String]("ce_type"),
            r.getAs[String]("content_type"), vs(0).asInstanceOf[Long],
            vs(1).asInstanceOf[String], vs(2).asInstanceOf[String])
        }
      }.toDF("ce_id", "ce_type", "content_type", "o_orderkey",
        "o_orderstatus", "op")
    }),

    // §2.8 CloudEvents structured mode, AVRO ENVELOPE serializer: the
    // whole envelope record (attributes + serialized data bytes)
    // Avro-encodes through the real codec — here with the json DATA
    // content type, the reference's avro/json serializer combination —
    // and the round trip decodes both layers back for the oracle
    "f_cloudevents_avro" -> ((s, dir) => {
      import s.implicits._
      val fd = feed(s, dir, "orders")
      val env = graft.functions.CloudEvents.avroEnvelope(fd,
        data = to_json(struct(
          coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
            .as("o_orderkey"),
          coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))
            .as("o_orderstatus"),
          col("op"))).cast("binary"),
        dataSerializer = "json")
      val envSchema = env.schema
      val wire = env.mapPartitions { rows =>
        val avro = graft.serde.AvroFormat.avroSchema(envSchema)
        rows.map { r =>
          val bytes = graft.serde.AvroFormat.encode(r, envSchema, avro)
          require(bytes.length >= 8,
            s"implausible avro envelope: ${bytes.length}B")
          val vs = graft.serde.AvroFormat.decode(bytes, envSchema, avro)
          (vs(0).asInstanceOf[String], vs(3).asInstanceOf[String],
            vs(5).asInstanceOf[String],
            new String(vs(6).asInstanceOf[Array[Byte]],
              java.nio.charset.StandardCharsets.UTF_8))
        }
      }.toDF("ce_id", "ce_type", "ce_datacontenttype", "data_json")
      wire.select(col("ce_id"), col("ce_type"), col("ce_datacontenttype"),
        get_json_object(col("data_json"), "$.o_orderkey").cast("long")
          .as("o_orderkey"),
        get_json_object(col("data_json"), "$.o_orderstatus")
          .as("o_orderstatus"),
        get_json_object(col("data_json"), "$.op").as("op"))
    }),

    // embedded-engine Protobuf format: positional proto3 message over
    // the in-repo wire codec (varint/fixed64/length-delimited, absent =
    // null presence), identity round trip incl. a double field
    "f_protobuf_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val flat = feed(s, dir, "orders").select(
        coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
          .as("o_orderkey"),
        coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))
          .as("o_orderstatus"),
        coalesce(col("after.o_totalprice"), col("before.o_totalprice"))
          .as("o_totalprice"),
        col("source.pos").as("pos"), col("op"))
      val schema = flat.schema
      flat.mapPartitions { rows =>
        rows.map(r => graft.serde.ProtoFormat.encode(r, schema))
      }.mapPartitions { payloads =>
        payloads.map { b =>
          val vs = graft.serde.ProtoFormat.decode(b, schema)
          (vs(0).asInstanceOf[Long], vs(1).asInstanceOf[String],
            vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Long],
            vs(4).asInstanceOf[String])
        }
      }.toDF("o_orderkey", "o_orderstatus", "o_totalprice", "pos", "op")
    })
  )

  def oracles: Map[String, String] = Map(
    "pl_pipeline_dsl" ->
      """SELECT c_custkey, sha256('s' || c_name) AS c_name, c_acctbal,
        |  substring(c_mktsegment,1,4) AS c_mktsegment,
        |  'false' AS __deleted, 'r' AS __op, c_custkey*10 AS __pos
        | FROM customer WHERE c_acctbal > 0
        |UNION ALL
        |SELECT c_custkey, sha256('s' || c_name), c_acctbal + 100.0,
        |  substring(c_mktsegment,1,4), 'false', 'u', c_custkey*10+1
        | FROM customer WHERE c_custkey%7=3 AND c_acctbal + 100.0 > 0
        |UNION ALL
        |SELECT c_custkey, sha256('s' || c_name), c_acctbal,
        |  substring(c_mktsegment,1,4), 'true', 'd', c_custkey*10+2
        | FROM customer WHERE c_custkey%13=6 AND c_acctbal > 0""".stripMargin,

    "k3_insert_modes" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey%2=0 THEN 'U2' ELSE 'I' END AS o_orderstatus,
        | o_totalprice, o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,

    "t11_extract_schema" ->
      """SELECT o_orderkey, 'orders' AS table,
        | 'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority' AS fields,
        | 6 AS n_fields
        |FROM orders""".stripMargin,

    "t20_docling" ->
      """SELECT doc_id,
        | md5('# doc ' || doc_id || chr(10) || chr(10) || text) AS md_hash,
        | 8 + length(CAST(doc_id AS VARCHAR)) + length(text) AS md_len
        |FROM documents""".stripMargin,

    "t20_docling_socket" ->
      """SELECT doc_id,
        | md5('# doc ' || doc_id || chr(10) || chr(10) || text) AS md_hash,
        | 8 + length(CAST(doc_id AS VARCHAR)) + length(text) AS md_len
        |FROM documents""".stripMargin,

    "r4_timescale_router" ->
      """SELECT p_partkey,
        | '_hyper_' || (p_size%5) || '_' || p_partkey || '_chunk' AS physical_table,
        | 'metrics_' || (p_size%5) AS hypertable
        |FROM part""".stripMargin,

    "p7_notifications" ->
      """SELECT 'snapshot-started' AS notification_type, CAST(-1 AS BIGINT) AS chunk,
        | CAST(0 AS BIGINT) AS row_count
        |UNION ALL
        |SELECT 'snapshot-in-progress', chunk, count(*) FROM (
        | SELECT CAST(floor((row_number() OVER (ORDER BY o_orderkey)-1)/1024) AS BIGINT) AS chunk
        | FROM orders) x GROUP BY chunk
        |UNION ALL
        |SELECT 'snapshot-completed', -1, count(*) FROM orders""".stripMargin,

    "q_crdt_counters" ->
      "SELECT event_type AS k, count(*) AS value FROM events GROUP BY event_type",

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    "q_rollup" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)""".stripMargin,

    "q_cube" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
        | CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        | CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)""".stripMargin,

    "q_stats_summary" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "f_serde_values" ->
      """SELECT o_orderkey, o_orderstatus, o_orderkey*10 AS pos, 'r' AS op
        | FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'U' AS o_orderstatus, o_orderkey*10+1 AS pos,
        | 'u' AS op FROM orders WHERE o_orderkey%7=3""".stripMargin,

    // deletes round-trip too (their before-image rides the value)
    "f_avro_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_orderkey*10 AS pos, 'r' AS op
        | FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'U', o_orderkey*10+1, 'u'
        | FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_orderkey*10+2, 'd'
        | FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "f_cloudevents_binary" ->
      """SELECT concat('orders-', o_orderkey*10) AS ce_id,
        | 'io.graft.orders.r' AS ce_type, 'application/avro' AS content_type,
        | o_orderkey, o_orderstatus, 'r' AS op FROM orders
        |UNION ALL
        |SELECT concat('orders-', o_orderkey*10+1), 'io.graft.orders.u',
        | 'application/avro', o_orderkey, 'U', 'u'
        | FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT concat('orders-', o_orderkey*10+2), 'io.graft.orders.d',
        | 'application/avro', o_orderkey, o_orderstatus, 'd'
        | FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "f_cloudevents_avro" ->
      """SELECT concat('orders-', o_orderkey*10) AS ce_id,
        | 'io.graft.orders.r' AS ce_type,
        | 'application/json' AS ce_datacontenttype,
        | o_orderkey, o_orderstatus, 'r' AS op FROM orders
        |UNION ALL
        |SELECT concat('orders-', o_orderkey*10+1), 'io.graft.orders.u',
        | 'application/json', o_orderkey, 'U', 'u'
        | FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT concat('orders-', o_orderkey*10+2), 'io.graft.orders.d',
        | 'application/json', o_orderkey, o_orderstatus, 'd'
        | FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "f_protobuf_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        | o_orderkey*10 AS pos, 'r' AS op FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'U', o_totalprice, o_orderkey*10+1, 'u'
        | FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderkey*10+2, 'd'
        | FROM orders WHERE o_orderkey%13=6""".stripMargin
  )

  override val duckdbOnly: Set[String] = Set(
    "pl_pipeline_dsl", "t20_docling", "t20_docling_socket",
    "r4_timescale_router", "q_stats_summary", "t11_extract_schema")
}

/** Typed key/payload views for the serde query (by-name subsets of the
  * orders envelope structs).
  */
final case class OrderKey(o_orderkey: Long)
final case class OrderPayload(o_orderkey: Long, o_custkey: Long,
    o_orderstatus: String, o_totalprice: Double)
