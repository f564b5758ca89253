package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Router, Transforms, TxMetadata}

/** Routing, outbox, partition assignment, transaction metadata and signal
  * parsing (SURVEY R1-R5, P4, P6/S13).
  */
object RoutingQueries extends QueryGroup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T7/R5: content-based router — topic from a record expression
    "t7_content_router" -> ((s, dir) =>
      Transforms.contentRouter(feed(s, dir, "orders"),
        concat(lit("orders."),
          coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))))
        .select(coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
          .as("o_orderkey"), col("op"), col("source.pos").as("pos"), col("topic"))),

    // T6 predicated chain (Connect transforms.X.predicate/negate): mask
    // applies ONLY to records routed to the update topic; read→insert
    // rewrite applies ONLY outside it (negate) — untouched records pass
    // through both links unchanged
    "t6_predicated_chain" -> ((s, dir) => {
      import graft.operators.Predicates
      val routed = Transforms.contentRouter(feed(s, dir, "orders"),
        concat(lit("orders."),
          coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))))
      val masked = Predicates.predicated(routed,
        Predicates.topicNameMatches("orders\\.U"))(df =>
        df.withColumn("after",
          col("after").withField("o_orderstatus", lit("***"))))
      val out = Predicates.predicated(masked,
        Predicates.topicNameMatches("orders\\.U"), negate = true)(
        Transforms.readToInsert)
      out.select(col("key.o_orderkey").as("o_orderkey"), col("op"),
        col("source.pos").as("pos"), col("topic"),
        coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))
          .as("status"))
    }),

    // R1: logical table router — shard topics collapse to one logical topic,
    // physical table id folded into the key
    "r1_logical_router" -> ((s, dir) =>
      Router.logicalTableRouter(feed(s, dir, "orders"),
        "^graft\\.public\\.", "graft.all_shards.")
        .select(col("key.o_orderkey").as("o_orderkey"),
          col("key.__graft_physicalTableIdentifier").as("physical_table"),
          col("topic"), col("source.pos").as("pos"))),

    // R2: partition routing — stable hash of selected fields mod N
    "r2_partition_route" -> ((s, dir) =>
      Router.partitionRouting(feed(s, dir, "orders"), 8, col("key.o_orderkey"))
        .select(col("key.o_orderkey").as("o_orderkey"), col("op"),
          col("source.pos").as("pos"), col("partition"))),

    // R3: outbox event router over an outbox-shaped table derived from orders
    "r3_outbox" -> ((s, dir) => {
      val ob = t(s, dir, "orders").select(
        col("o_orderkey").cast("string").as("id"),
        col("o_orderstatus").as("aggregatetype"),
        col("o_custkey").cast("string").as("aggregateid"),
        col("o_orderpriority").as("type"),
        concat(lit("{\"order\":"), col("o_orderkey"), lit("}")).as("payload"))
      Router.outbox(ob).select(col("topic"), col("key"), col("value"),
        col("id"), col("type"))
    }),

    // R3 with table.expand.json.payload=true: the payload string parses
    // into a structured value (schema inferred from the payload corpus),
    // so consumers read typed fields instead of JSON text
    "r3_outbox_expanded" -> ((s, dir) => {
      val ob = t(s, dir, "orders").select(
        col("o_orderkey").cast("string").as("id"),
        col("o_orderstatus").as("aggregatetype"),
        col("o_custkey").cast("string").as("aggregateid"),
        concat(lit("{\"order\":"), col("o_orderkey"),
          lit(",\"priority\":\""), col("o_orderpriority"),
          lit("\"}")).as("payload"))
      Router.outboxExpanded(ob).select(col("topic"), col("key"),
        col("value.order").as("order"),
        col("value.priority").as("priority"), col("id"))
    }),

    // R3 (MongoDB): outbox router over a change-stream feed of an outbox
    // COLLECTION — the after image is an extended-JSON STRING, fields
    // resolve out of the document ($oid/$numberLong/$date unwrapped), a
    // sub-document payload stays a JSON string (collection.expand.json
    // .payload=false), Kafka timestamp overridden from the document's
    // timestamp field (ref mongodb/transforms/outbox/MongoEventRouter.java)
    "r3_outbox_mongo" -> ((s, dir) => {
      Router.mongoOutbox(mongoOutboxFeed(s, dir),
        timestampField = Some("timestamp"))
        .select(col("topic"), col("key"), col("value"), col("id"),
          col("type"), col("ts_ms"))
    }),

    // R3 (MongoDB) with collection.expand.json.payload=true: the payload
    // sub-document parses into a DECLARED-schema struct — the caller
    // states the payload contract, so the outbox is read exactly once
    // (no inference pre-scan; PlanSpec guards the zero-extra-jobs
    // property). Inference stays the default for schema-free callers
    // (r3_outbox_expanded covers that path).
    "r3_outbox_mongo_expanded" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      Router.mongoOutbox(mongoOutboxFeed(s, dir),
        timestampField = Some("timestamp"), expandPayload = true,
        payloadSchema = Some(StructType(Seq(
          StructField("order", LongType), StructField("priority", StringType)))))
        .select(col("topic"), col("key"),
          col("value.order").as("order"),
          col("value.priority").as("priority"), col("id"))
    }),

    // P4: per-event transaction ordering metadata
    "p4_tx_order" -> ((s, dir) =>
      TxMetadata.attach(feed(s, dir, "orders"))
        .select(col("key.o_orderkey").as("o_orderkey"), col("op"),
          col("source.pos").as("pos"), col("transaction.id").as("tx_id"),
          col("transaction.total_order").as("total_order"),
          col("transaction.data_collection_order").as("data_collection_order"))),

    // P4: transaction BEGIN/END boundary records
    "p4_tx_boundaries" -> ((s, dir) =>
      TxMetadata.boundaries(feed(s, dir, "orders"))),

    // S13/P6: signal parsing — JSON payload of the control-plane stream
    "s13_signal_parse" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("signal_k"))
        .filter(col("event_type") === "signup"))
  )

  /** An outbox-collection change-stream feed derived from orders: each
    * insert's `after_json` is the extended-JSON rendering of an outbox
    * document — ObjectId `_id`, `$numberLong` aggregate id, `$date`
    * timestamp, sub-document payload — exactly the shape
    * `MongoChangeStream.decode` emits for a real outbox collection.
    */
  private def mongoOutboxFeed(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val afterJson = concat(
      lit("{\"_id\":{\"$oid\":\""),
      substring(md5(col("o_orderkey").cast("string")), 1, 24),
      lit("\"},\"aggregatetype\":\""), col("o_orderstatus"),
      lit("\",\"aggregateid\":{\"$numberLong\":\""),
      col("o_custkey").cast("string"),
      lit("\"},\"type\":\""), col("o_orderpriority"),
      lit("\",\"timestamp\":{\"$date\":{\"$numberLong\":\""),
      (col("o_orderkey") * 1000).cast("string"),
      lit("\"}},\"payload\":{\"order\":"), col("o_orderkey").cast("string"),
      lit(",\"priority\":\""), col("o_orderpriority"), lit("\"}}"))
    o.select(lit("c").as("op"),
      (col("o_orderkey") * 10).cast("long").as("pos"),
      afterJson.as("after_json"))
  }

  private val txExpr = "concat('tx', CAST(floor(o_orderkey/100) AS BIGINT))"
  private val streamEvents =
    """SELECT o_orderkey, 'u' AS op, o_orderkey*10+1 AS pos FROM orders WHERE o_orderkey%7=3
      |UNION ALL
      |SELECT o_orderkey, 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6""".stripMargin

  def oracles: Map[String, String] = Map(
    "t7_content_router" ->
      """SELECT o_orderkey, 'r' AS op, o_orderkey*10 AS pos, 'orders.' || o_orderstatus AS topic FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'u', o_orderkey*10+1, 'orders.U' FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, 'd', o_orderkey*10+2, 'orders.' || o_orderstatus FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "t6_predicated_chain" ->
      """SELECT o_orderkey, 'c' AS op, o_orderkey*10 AS pos,
        | 'orders.'||o_orderstatus AS topic, o_orderstatus AS status
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'u', o_orderkey*10+1, 'orders.U', '***'
        |FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, 'd', o_orderkey*10+2,
        | 'orders.'||o_orderstatus, o_orderstatus
        |FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "r1_logical_router" ->
      """SELECT o_orderkey, 'orders' AS physical_table,
        | 'graft.all_shards.orders' AS topic, o_orderkey*10 AS pos FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'orders', 'graft.all_shards.orders', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, 'orders', 'graft.all_shards.orders', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "r2_partition_route" ->
      """SELECT o_orderkey, 'r' AS op, o_orderkey*10 AS pos, CAST(o_orderkey%8 AS INT) AS partition FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'u', o_orderkey*10+1, CAST(o_orderkey%8 AS INT) FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, 'd', o_orderkey*10+2, CAST(o_orderkey%8 AS INT) FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "r3_outbox" ->
      """SELECT 'outbox.event.' || o_orderstatus AS topic,
        | CAST(o_custkey AS VARCHAR) AS key,
        | concat('{"order":', o_orderkey, '}') AS value,
        | CAST(o_orderkey AS VARCHAR) AS id,
        | o_orderpriority AS type
        |FROM orders""".stripMargin,

    "r3_outbox_expanded" ->
      """SELECT 'outbox.event.' || o_orderstatus AS topic,
        | CAST(o_custkey AS VARCHAR) AS key,
        | o_orderkey AS "order", o_orderpriority AS priority,
        | CAST(o_orderkey AS VARCHAR) AS id
        |FROM orders""".stripMargin,

    "r3_outbox_mongo" ->
      """SELECT 'outbox.event.' || o_orderstatus AS topic,
        | CAST(o_custkey AS VARCHAR) AS key,
        | concat('{"order":', o_orderkey, ',"priority":"', o_orderpriority, '"}') AS value,
        | substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 24) AS id,
        | o_orderpriority AS type,
        | o_orderkey * 1000 AS ts_ms
        |FROM orders""".stripMargin,

    "r3_outbox_mongo_expanded" ->
      """SELECT 'outbox.event.' || o_orderstatus AS topic,
        | CAST(o_custkey AS VARCHAR) AS key,
        | o_orderkey AS "order", o_orderpriority AS priority,
        | substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 24) AS id
        |FROM orders""".stripMargin,

    "p4_tx_order" ->
      s"""WITH ev AS ($streamEvents)
         |SELECT o_orderkey, op, pos, $txExpr AS tx_id,
         | CAST(row_number() OVER (PARTITION BY $txExpr ORDER BY pos) AS BIGINT) AS total_order,
         | CAST(row_number() OVER (PARTITION BY $txExpr ORDER BY pos) AS BIGINT) AS data_collection_order
         |FROM ev""".stripMargin,

    "p4_tx_boundaries" ->
      s"""WITH ev AS ($streamEvents)
         |SELECT $txExpr AS tx_id, count(*) AS event_count,
         | min(pos) AS begin_pos, max(pos) AS end_pos
         |FROM ev GROUP BY 1""".stripMargin,

    // DuckDB-only oracle (json_extract_string); Spark side uses
    // get_json_object — the parity spec skips it, the driver checks it.
    "s13_signal_parse" ->
      """SELECT event_id, event_type,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS signal_k
        |FROM events WHERE event_type = 'signup'""".stripMargin
  )

  override val duckdbOnly: Set[String] =
    Set("s13_signal_parse", "r3_outbox", "r3_outbox_expanded",
      "r3_outbox_mongo", "r3_outbox_mongo_expanded")
}
