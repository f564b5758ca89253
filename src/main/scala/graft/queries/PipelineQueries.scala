package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.Sessionize
import graft.operators._
import graft.sources.ChangeFeedGen

/** Pipeline mechanics and temporal analytics: snapshot modes/overrides,
  * dispatcher fan-out, dead-letter routing, header/value moves, reselect,
  * schema-change filtering, collection naming, as-of join, sessionization,
  * salted aggregation (SURVEY S2/S6/S7, P2/P8, T9/T12/T15/T22, K6, §2.6).
  */
object PipelineQueries extends QueryGroup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2: snapshot with per-table statement override (filter + projection
    // pushed into the source read — PushedFilters visible in .explain)
    "s2_snapshot_override" -> ((s, dir) => {
      val overridden = t(s, dir, "orders")
        .filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      ChangeFeedGen.feed(overridden, "orders",
        overridden("o_orderkey").cast("long"), Map.empty,
        Some(Seq("o_orderkey")))
        .filter(col("op") === "r")
        .select(col("after.*"), col("op"), col("source.pos").as("pos"))
    }),

    // S6: blocking snapshot — a re-snapshot at higher positions overrides
    // all previously streamed state
    "s6_blocking_snapshot" -> ((s, dir) => {
      val base = feed(s, dir, "orders")
      val o = t(s, dir, "orders")
      val reSnap = ChangeFeedGen.feed(o, "orders",
        o("o_orderkey").cast("long") + 100000000L, Map.empty)
        .filter(col("op") === "r")
      Materialize.latestState(base.unionAll(reSnap))
    }),

    // S7: no_data snapshot mode — stream only, no backfill
    "s7_no_data_mode" -> ((s, dir) =>
      Materialize.latestState(feed(s, dir, "orders").filter(col("op") =!= "r"))),

    // T9: document payload extraction (schemaless JSON → typed columns)
    "t9_document_extract" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k").as("k"))),

    // T12: header → value field
    "t12_header_to_value" -> ((s, dir) => {
      val withHeaders = feed(s, dir, "orders").withColumn("headers",
        map(lit("trace"), concat(lit("tr-"), col("source.pos"))))
      Transforms.headerToValue(withHeaders, "trace", "trace_id", move = true)
        .select(col("key.o_orderkey").as("o_orderkey"), col("op"),
          col("source.pos").as("pos"), col("trace_id"),
          size(map_keys(col("headers"))).as("n_headers"))
    }),

    // T15: schema-change event filter (drop DROPs)
    "t15_schema_change_filter" -> ((s, dir) => {
      val changes = t(s, dir, "part").select(col("p_partkey"),
        when(col("p_partkey") % 3 === 0, "CREATE")
          .when(col("p_partkey") % 3 === 1, "ALTER")
          .otherwise("DROP").as("change_type"))
      Transforms.schemaChangeFilter(changes, Seq("DROP"))
    }),

    // T22: reselect placeholder columns from the source table
    "t22_reselect" -> ((s, dir) => {
      val updates = t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 3)
        .select(col("o_orderkey"), lit("__unavailable").as("o_orderpriority"),
          lit("u").as("op"))
      Transforms.reselectColumns(updates, t(s, dir, "orders"), "o_orderkey",
        Seq("o_orderpriority"))
    }),

    // T22 with the RESELECT CACHE (MemoryReselectColumnCache): an
    // unavailable value refills from the key's newest value already
    // seen in the stream (cache hit — here the stream's own 'S-'
    // prefixed reads, distinguishable from the table), and only keys
    // with no in-stream history fall back to the source-table re-query
    // (odd keys here fill with the PLAIN table value)
    "t22_reselect_cached" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val reads = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), lit("r").as("op"),
          concat(lit("S-"), col("o_orderpriority")).as("o_orderpriority"),
          (col("o_orderkey") * 10).as("pos"))
      val updates = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("u").as("op"),
          lit("__unavailable").as("o_orderpriority"),
          (col("o_orderkey") * 10 + 5).as("pos"))
      Transforms.reselectColumnsCached(reads.unionByName(updates), orders,
        "o_orderkey", "pos", Seq("o_orderpriority"))
        .select(col("o_orderkey"), col("op"), col("o_orderpriority"))
    }),

    // P2: dispatcher fan-out counts over a mixed stream
    "p2_dispatch_counts" -> ((s, dir) => {
      val fd = feed(s, dir, "orders")
      val hb = Heartbeat.intervals(fd, 10000L)
        .select(lit("m").as("op"))
      val truncates = t(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0).select(lit("t").as("op"))
      val mixed = fd.select(col("op")).unionAll(hb).unionAll(truncates)
      Dispatcher.classCounts(mixed, Dispatcher.eventClass(col("op")))
    }),

    // P8: dead-letter routing counts
    "p8_dlq_counts" -> ((s, dir) =>
      ErrorHandling.outcomeCounts(feed(s, dir, "orders"),
        coalesce(col("after.o_totalprice"), col("before.o_totalprice")) < 400000)),

    // K6: collection naming strategy (topic → target collection)
    "k6_collection_naming" -> ((s, dir) => {
      val topics = Seq("orders", "customer", "part")
        .map(n => feed(s, dir, n).select(col("source.schema").as("sch"),
          col("source.table").as("tbl")))
        .reduce(_ unionAll _).distinct()
      topics.select(
        concat_ws(".", lit("graft"), col("sch"), col("tbl")).as("topic"),
        translate(concat_ws(".", col("sch"), col("tbl")), ".", "_")
          .as("collection"))
    }),

    // §2.6 as-of join: each click enriched with the user's latest prior
    // purchase (union-tag-window form — one keyed shuffle, no range join)
    // (ts normalized to epoch-µs: DuckDB's timestamp type is µs-precision,
    // so the oracle can only see µs — both sides compute on the same axis)
    "a_asof_join" -> ((s, dir) => {
      val e0 = t(s, dir, "events")
      val e = e0.withColumn("ts_us", graft.sources.Tables.epochUs(e0))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"),
          col("value"))
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts_us", "ts_us",
        Seq("purchase_id", "value"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("asof_purchase_id"), col("asof_value"))
    }),

    // Temporal dimension join: each fact row joined to the DIMENSION
    // VERSION valid at its log position — the SCD-2 history table's
    // purpose (training-data reproducibility: the feature value as it
    // WAS, not as it is). Equi-join on the key with interval predicates:
    // one keyed shuffle, no range/cartesian join; history per key is its
    // change count, so the join side stays balanced.
    "a_temporal_dim_join" -> ((s, dir) => {
      val hist = graft.operators.Scd2.historyTable(feed(s, dir, "customer"))
      val facts = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), (col("o_orderkey") * 10).cast("long").as("p"))
      facts.join(hist,
          facts("o_custkey") === hist("c_custkey") &&
            hist("valid_from_pos") <= facts("p") &&
            (hist("valid_to_pos").isNull || hist("valid_to_pos") > facts("p")),
          "left")
        .select(col("o_orderkey"), col("o_custkey"), col("p"),
          col("c_acctbal"))
    }),

    // §2.6 sessionization (1h gap over µs timestamps)
    "a_sessionize" -> ((s, dir) => {
      val e0 = t(s, dir, "events")
      Sessionize.sessions(
        e0.withColumn("ts_us", graft.sources.Tables.epochUs(e0)),
        col("user_id"), col("ts_us"), 3600000000L, col("value"))
    }),

    // scale mechanics: two-phase salted aggregation == direct aggregation
    "a_salted_agg" -> ((s, dir) =>
      Salting.saltedSumCount(t(s, dir, "events"), col("event_type"),
        col("value"), col("event_id"), 16))
  )

  def oracles: Map[String, String] = Map(
    "s2_snapshot_override" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, 'r' AS op, o_orderkey*10 AS pos
        |FROM orders WHERE o_totalprice > 200000""".stripMargin,

    "s6_blocking_snapshot" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders",

    "s7_no_data_mode" ->
      """SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice,
        | o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey%7=3 AND o_orderkey%13<>6""".stripMargin,

    "t9_document_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "t12_header_to_value" ->
      """SELECT o_orderkey, 'r' AS op, o_orderkey*10 AS pos,
        | concat('tr-', o_orderkey*10) AS trace_id, 0 AS n_headers FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'u', o_orderkey*10+1, concat('tr-', o_orderkey*10+1), 0
        | FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT o_orderkey, 'd', o_orderkey*10+2, concat('tr-', o_orderkey*10+2), 0
        | FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "t15_schema_change_filter" ->
      """SELECT p_partkey,
        | CASE WHEN p_partkey%3=0 THEN 'CREATE' ELSE 'ALTER' END AS change_type
        |FROM part WHERE p_partkey%3 <> 2""".stripMargin,

    "t22_reselect" ->
      """SELECT o_orderkey, o_orderpriority, 'u' AS op
        |FROM orders WHERE o_orderkey%7=3""".stripMargin,

    // hits (even keys) fill with the STREAM's S- value; misses (odd
    // keys, no in-stream history) fill with the plain table value
    "t22_reselect_cached" ->
      """SELECT o_orderkey, 'r' AS op,
        | concat('S-', o_orderpriority) AS o_orderpriority
        |FROM orders WHERE o_orderkey%2=0
        |UNION ALL
        |SELECT o_orderkey, 'u',
        | CASE WHEN o_orderkey%2=0 THEN concat('S-', o_orderpriority)
        |      ELSE o_orderpriority END
        |FROM orders WHERE o_orderkey%3=0""".stripMargin,

    "p2_dispatch_counts" ->
      """SELECT 'data' AS event_class,
        |  count(*) + (SELECT count(*) FROM orders WHERE o_orderkey%7=3)
        |           + (SELECT count(*) FROM orders WHERE o_orderkey%13=6) AS n
        | FROM orders
        |UNION ALL
        |SELECT 'heartbeat', count(DISTINCT CAST(floor(o_orderkey/1000) AS BIGINT)) FROM orders
        |UNION ALL
        |SELECT 'schema', count(*) FROM orders WHERE o_orderkey%500=0""".stripMargin,

    "p8_dlq_counts" ->
      """SELECT 'ok' AS outcome, count(*) AS n FROM (
        | SELECT o_totalprice FROM orders
        | UNION ALL SELECT o_totalprice FROM orders WHERE o_orderkey%7=3
        | UNION ALL SELECT o_totalprice FROM orders WHERE o_orderkey%13=6) x
        |WHERE o_totalprice < 400000
        |UNION ALL
        |SELECT 'dead_letter', count(*) FROM (
        | SELECT o_totalprice FROM orders
        | UNION ALL SELECT o_totalprice FROM orders WHERE o_orderkey%7=3
        | UNION ALL SELECT o_totalprice FROM orders WHERE o_orderkey%13=6) y
        |WHERE o_totalprice >= 400000""".stripMargin,

    "k6_collection_naming" ->
      """SELECT 'graft.public.orders' AS topic, 'public_orders' AS collection
        |UNION ALL SELECT 'graft.public.customer', 'public_customer'
        |UNION ALL SELECT 'graft.public.part', 'public_part'""".stripMargin,

    // dimension version valid at p, re-derived from the scripted feed:
    // before the customer's read → none; after its delete → none; after
    // its update → mutated acctbal; else the snapshot value
    "a_temporal_dim_join" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderkey*10 AS p FROM orders)
        |SELECT o.o_orderkey, o.o_custkey, o.p,
        | CASE WHEN o.p < c_custkey*10 THEN NULL
        |      WHEN c_custkey%13=6 AND o.p >= c_custkey*10+2 THEN NULL
        |      WHEN c_custkey%7=3 AND o.p >= c_custkey*10+1 THEN c_acctbal+100.0
        |      ELSE c_acctbal END AS c_acctbal
        |FROM o JOIN customer ON o.o_custkey = c_custkey""".stripMargin,

    "a_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'click'),
        | p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS purchase_id, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us,
        | p.purchase_id AS asof_purchase_id, p.value AS asof_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us""".stripMargin,

    "a_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        | s AS (SELECT user_id, t, value,
        |   CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 3600000000
        |        THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        | g AS (SELECT user_id, t, value,
        |   CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id AS key, session_id, count(*) AS n_events,
        | min(t) AS session_start, max(t) AS session_end,
        | sum(CAST(floor(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
        |FROM g GROUP BY user_id, session_id""".stripMargin,

    "a_salted_agg" ->
      """SELECT event_type AS key, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin
  )

  override val duckdbOnly: Set[String] = Set(
    "t9_document_extract", "a_asof_join", "a_sessionize",
    "p2_dispatch_counts", "k6_collection_naming")
}
