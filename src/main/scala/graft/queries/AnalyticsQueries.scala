package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The added analytics surface (SURVEY §2.6): aggregations, joins, windows,
  * sorts, set ops over the star schema — all declarative so Catalyst handles
  * pushdown/pruning/join strategy; small dimensions broadcast.
  */
object AnalyticsQueries extends QueryGroup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: map-side partial aggregation, 4 groups
    "q01_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1997-06-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Multi-way join with broadcast dims: revenue per nation
    // (nation/region are tiny → broadcast; the only shuffle is the
    // customer⋈orders⋈lineitem key exchange)
    "q05_revenue_by_nation" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Window + top-k: 3 highest-value orders per customer segment
    "q18_topk_per_segment" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
          col("o_totalprice"))
    }),

    // Set ops + semi/anti joins: customers with orders but no high-value order
    "q_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      val high = o.filter(col("o_totalprice") > 400000)
      withOrders.join(high, c("c_custkey") === high("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // Set operators: INTERSECT / EXCEPT over key sets
    "q_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val both = c.intersect(o).withColumn("side", lit("with_orders"))
      val none = c.except(o).withColumn("side", lit("no_orders"))
      both.unionAll(none)
    }),

    // Pivot: order counts per segment pivoted by order status
    "q_pivot" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .count()
        .na.fill(0) // pivot yields null for empty cells; oracle counts 0
    }),

    // TPC-H Q10-style: revenue from returned items per customer, top 20
    "q10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Full outer join with aggregated sides
    "q_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, c("c_nationkey") === sup("s_nationkey"), "full_outer")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          col("n_cust"), col("n_supp"))
    }),

    // Running cumulative revenue per customer (ordered window frame)
    "q_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("running_total"))
    }),

    // Streaming-style event-time windowed aggregation over the events table
    // (event time normalized to epoch-µs, window = 1h tumbling; works for
    // both fixture generations — ns BIGINT and µs TIMESTAMP_NTZ)
    "q_event_window" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.withColumn("hour_bucket",
          floor(graft.sources.Tables.epochUs(e) / lit(3600000000L)).cast("long"))
        .groupBy(col("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    }),

    // Per-user event-type transition matrix (first-order Markov counts
    // + row-normalized probabilities): ONE shuffle on user_id for the
    // lead() window — per-user event history is bounded, so partitions
    // stay balanced at any corpus size; the from-type totals join runs
    // on the (type² bounded) count table.
    "a_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val trans = e
        .withColumn("ts_us", graft.sources.Tables.epochUs(e))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = trans.groupBy(col("from_type"))
        .agg(sum(col("n")).as("tn"))
      trans.join(totals, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          (floor(col("n").cast("double") / col("tn") * 10000) / 10000.0)
            .as("p_q4"))
    }),

    // Portable-hash HLL sketch (expressions/Hll.scala): per-event-type
    // distinct-user sketches as PLAIN register bytes — persistable and
    // re-aggregatable, unlike approx_count_distinct's opaque buffer. The
    // oracle recomputes every register bit-for-bit in DuckDB SQL (md5
    // nibble arithmetic + bin() zero counts), so the sketch itself — not
    // just a final estimate — is cross-engine verified. One map-side-
    // combinable agg; partial state = 256 bytes per group regardless of
    // input size.
    "a_hll_registers" -> ((s, dir) => {
      graft.expressions.GraftFunctions.register(s)
      import graft.expressions.GraftFunctions
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(GraftFunctions.hllSketch(col("user_id").cast("string"), 8)
          .as("sketch"))
        .select(col("event_type"),
          posexplode(GraftFunctions.hllRegisters(col("sketch")))
            .as(Seq("bucket", "reg")))
        .filter(col("reg") > 0)
        .select(col("event_type"), col("bucket").cast("long").as("bucket"),
          col("reg").cast("long").as("reg"))
    }),

    // Sketch roll-up: the per-type sketches above merged (register-wise
    // max) into one corpus sketch — the per-epoch/per-source rollup path
    // at 100 TB: stored sketches re-aggregate without re-reading the
    // corpus. Oracle = registers computed over ALL users directly, so
    // merge(sketch_1..n) == sketch(union) is verified exactly.
    "a_hll_union" -> ((s, dir) => {
      graft.expressions.GraftFunctions.register(s)
      import graft.expressions.GraftFunctions
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(GraftFunctions.hllSketch(col("user_id").cast("string"), 8)
          .as("sketch"))
        .agg(GraftFunctions.hllMerge(col("sketch")).as("sketch"))
        .select(posexplode(GraftFunctions.hllRegisters(col("sketch")))
          .as(Seq("bucket", "reg")))
        .filter(col("reg") > 0)
        .select(col("bucket").cast("long").as("bucket"),
          col("reg").cast("long").as("reg"))
    }),

    // Incremental sketch maintenance: the events stream in arrival-order
    // micro-batches, each epoch persists ONE 256-byte sketch row, and the
    // rollup merges the stored sketches WITHOUT re-reading the corpus —
    // the per-epoch distinct-count pattern at 100 TB (a day's sketch is
    // bytes; history re-aggregates in milliseconds). Merged registers ==
    // whole-input registers, exactly.
    "stream_hll_rollup" -> ((s, dir) => {
      import graft.expressions.GraftFunctions
      GraftFunctions.register(s)
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"))
      val tmp = java.nio.file.Files.createTempDirectory("hll-roll")
      val transport = s"$tmp/transport"
      e.repartitionByRange(4, col("event_id"))
        .write.mode("overwrite").parquet(transport)
      graft.streaming.StreamingMaterialize.stampLogOrder(transport)
      val skDir = s"$tmp/sketches"
      val schema = s.read.parquet(transport).schema
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(transport)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          GraftFunctions.register(batch.sparkSession)
          batch.agg(GraftFunctions
              .hllSketch(col("user_id").cast("string"), 8).as("sketch"))
            .withColumn("epoch", lit(epochId))
            .write.mode("append").parquet(skDir)
          ()
        }
        .start()
      q.awaitTermination()
      val stored = s.read.parquet(skDir)
      require(stored.count() >= 4, "one sketch row per micro-batch epoch")
      stored.agg(GraftFunctions.hllMerge(col("sketch")).as("sketch"))
        .select(posexplode(GraftFunctions.hllRegisters(col("sketch")))
          .as(Seq("bucket", "reg")))
        .filter(col("reg") > 0)
        .select(col("bucket").cast("long").as("bucket"),
          col("reg").cast("long").as("reg"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-06-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q05_revenue_by_nation" ->
      """SELECT n_name, r_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name""".stripMargin,

    "q18_topk_per_segment" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders JOIN customer ON o_custkey = c_custkey) x
        |WHERE rk <= 3""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        | AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_set_ops" ->
      """SELECT k, 'with_orders' AS side FROM
        | (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders) a
        |UNION ALL
        |SELECT k, 'no_orders' FROM
        | (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders) b""".stripMargin,

    "q_pivot" ->
      """SELECT c_mktsegment,
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_outer_join" ->
      """SELECT coalesce(a.c_nationkey, b.s_nationkey) AS nationkey,
        | a.n_cust, b.n_supp
        |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) a
        |FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) b
        |  ON a.c_nationkey = b.s_nationkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2)
        |   AS running_total
        |FROM orders""".stripMargin,

    "q_event_window" ->
      """SELECT CAST(floor(epoch_ns(ts) / 3600000000000) AS BIGINT) AS hour_bucket,
        | event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "a_event_transitions" ->
      """WITH e2 AS (SELECT user_id, event_type,
        |   lead(event_type) OVER (PARTITION BY user_id
        |     ORDER BY epoch_us(ts), event_id) AS to_type
        | FROM events),
        | c AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |   FROM e2 WHERE to_type IS NOT NULL GROUP BY 1, 2),
        | tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY 1)
        |SELECT from_type, to_type, n,
        | floor(n::DOUBLE / tn * 10000) / 10000.0 AS p_q4
        |FROM c JOIN tot USING (from_type)""".stripMargin,

    // Register-exact HLL recomputation: bucket = md5 nibbles 1-2,
    // w = nibbles 3-15 (52 bits), rank = 53 - bitlength(w) (53 at w=0)
    "a_hll_registers" ->
      """WITH h AS (SELECT event_type,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(user_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(2-i)) for i in range(1, 3)]) AS BIGINT) AS bucket,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(user_id::VARCHAR), i+2, 1))-1)::BIGINT
        |      << (4*(13-i)) for i in range(1, 14)]) AS BIGINT) AS w
        | FROM events)
        |SELECT event_type, bucket,
        | max(CASE WHEN w = 0 THEN 53
        |          ELSE 53 - length(bin(w)) END)::BIGINT AS reg
        |FROM h GROUP BY 1, 2""".stripMargin,

    "a_hll_union" ->
      """WITH h AS (SELECT
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(user_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(2-i)) for i in range(1, 3)]) AS BIGINT) AS bucket,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(user_id::VARCHAR), i+2, 1))-1)::BIGINT
        |      << (4*(13-i)) for i in range(1, 14)]) AS BIGINT) AS w
        | FROM events)
        |SELECT bucket,
        | max(CASE WHEN w = 0 THEN 53
        |          ELSE 53 - length(bin(w)) END)::BIGINT AS reg
        |FROM h GROUP BY 1""".stripMargin,

    // identical whole-input registers: merged per-epoch sketches must
    // reproduce them exactly
    "stream_hll_rollup" ->
      """WITH h AS (SELECT
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(user_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(2-i)) for i in range(1, 3)]) AS BIGINT) AS bucket,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(user_id::VARCHAR), i+2, 1))-1)::BIGINT
        |      << (4*(13-i)) for i in range(1, 14)]) AS BIGINT) AS w
        | FROM events)
        |SELECT bucket,
        | max(CASE WHEN w = 0 THEN 53
        |          ELSE 53 - length(bin(w)) END)::BIGINT AS reg
        |FROM h GROUP BY 1""".stripMargin
  )

  // q_pivot: FILTER-with-quoted-identifiers oracle is DuckDB dialect;
  // a_hll_*: list-comprehension register recomputation is DuckDB dialect
  override val duckdbOnly: Set[String] =
    Set("q_event_window", "q_pivot", "a_hll_registers", "a_hll_union",
      "stream_hll_rollup", "a_event_transitions")
}
