package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{ChangeFeedGen, Tables}
import graft.operators.{Materialize, Transforms}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator from SURVEY.md §2 exercised over the
  * driver test tables; `oracleSql` holds the DuckDB-equivalent SQL. The
  * change feed is the deterministic script of ChangeFeedGen (pure function of
  * the PK), so CDC operators are oracle-checkable in plain SQL.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def feed(s: SparkSession, dir: String, name: String): DataFrame =
    ChangeFeedGen.standardFeed(t(s, dir, name), name)

  /** Flagship: materialize the orders change stream into latest table state
    * on /root/testdata/sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Materialize.latestState(feed(spark, "/root/testdata/sf0.001", "orders"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- S1: snapshot scan → op=r envelopes ---
    "s1_snapshot_read" -> ((s, dir) =>
      feed(s, dir, "orders").filter(col("op") === "r")
        .select(col("after.*"), col("op"), col("source.pos").as("pos"))),

    // --- K2/K3: flagship CDC materialization (upsert/delete replay) ---
    "k2_materialize" -> ((s, dir) =>
      Materialize.latestState(feed(s, dir, "orders"))),

    // --- K2 on a composite PK (two key parts; exercises the struct-key
    //     group path of the reference's composite-key chunking, SURVEY S4) ---
    "k2_materialize_composite" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val df = o
        .withColumn("ok1", col("o_orderkey") % 97)
        .withColumn("ok2", floor(col("o_orderkey") / 97).cast("long"))
      val fd = ChangeFeedGen.feed(df, "orders", df("o_orderkey").cast("long"),
        ChangeFeedGen.mutationsFor("orders", df), Some(Seq("ok1", "ok2")))
      Materialize.latestState(fd)
    }),

    // --- K5: reduced buffer — last envelope per key ---
    "k5_reduced_buffer" -> ((s, dir) =>
      Materialize.reduceByKey(feed(s, dir, "orders"))
        .select(col("key.o_orderkey").as("o_orderkey"), col("op"),
          col("source.pos").as("pos"))),

    // --- P10: at-least-once replay + offset dedup == exactly-once ---
    "p10_offset_dedup" -> ((s, dir) => {
      val f = feed(s, dir, "orders")
      val replayed = f.unionAll(f.filter(col("source.pos") % 2 === 0))
      Materialize.latestState(Materialize.offsetDedup(replayed))
    }),

    // --- T8: ExtractNewRecordState, rewrite-delete mode ---
    "t8_unwrap_rewrite" -> ((s, dir) =>
      Transforms.unwrap(feed(s, dir, "orders"), "rewrite", Seq("op", "source.pos"))),

    // --- Analytics surface: TPC-H Q1 pricing summary ---
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
    })
  )

  /** DuckDB-equivalent SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = {
    val ordersCols = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    val ordersMut = "o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    val liCols = "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
    val liMut = "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity + 1.0 AS l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
    Map(
      "s1_snapshot_read" ->
        s"SELECT $ordersCols, 'r' AS op, o_orderkey*10 AS pos FROM orders",

      "k2_materialize" ->
        s"""SELECT o_orderkey, o_custkey,
           | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
           | o_totalprice, o_orderdate, o_orderpriority
           |FROM orders WHERE o_orderkey%13<>6""".stripMargin,

      "k2_materialize_composite" ->
        s"""SELECT o_orderkey, o_custkey,
           | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
           | o_totalprice, o_orderdate, o_orderpriority,
           | o_orderkey%97 AS ok1, CAST(floor(o_orderkey/97) AS BIGINT) AS ok2
           |FROM orders WHERE o_orderkey%13<>6""".stripMargin,

      "k5_reduced_buffer" ->
        """SELECT o_orderkey,
          | CASE WHEN o_orderkey%13=6 THEN 'd' WHEN o_orderkey%7=3 THEN 'u' ELSE 'r' END AS op,
          | CASE WHEN o_orderkey%13=6 THEN o_orderkey*10+2 WHEN o_orderkey%7=3 THEN o_orderkey*10+1 ELSE o_orderkey*10 END AS pos
          |FROM orders""".stripMargin,

      "p10_offset_dedup" ->
        s"""SELECT o_orderkey, o_custkey,
           | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
           | o_totalprice, o_orderdate, o_orderpriority
           |FROM orders WHERE o_orderkey%13<>6""".stripMargin,

      "t8_unwrap_rewrite" ->
        s"""SELECT $ordersCols, 'false' AS __deleted, 'r' AS __op, o_orderkey*10 AS __pos FROM orders
           |UNION ALL
           |SELECT $ordersMut, 'false' AS __deleted, 'u' AS __op, o_orderkey*10+1 AS __pos FROM orders WHERE o_orderkey%7=3
           |UNION ALL
           |SELECT $ordersCols, 'true' AS __deleted, 'd' AS __op, o_orderkey*10+2 AS __pos FROM orders WHERE o_orderkey%13=6""".stripMargin,

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
          |GROUP BY l_returnflag, l_linestatus""".stripMargin
    )
  }
}
