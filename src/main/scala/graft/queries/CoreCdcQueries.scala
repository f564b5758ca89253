package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Materialize, Transforms}
import graft.sources.ChangeFeedGen

/** Core CDC pipeline operators: snapshot scan, materialization, sink
  * buffers, replay dedup, envelope unwrap (SURVEY S1, K2/K3/K5, P10, T8).
  */
object CoreCdcQueries extends QueryGroup {

  private val ordersCols =
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
  private val ordersMut =
    "o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
  private val ordersLatest =
    """SELECT o_orderkey, o_custkey,
      | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
      | o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey%13<>6""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: snapshot scan → op=r envelopes
    "s1_snapshot_read" -> ((s, dir) =>
      feed(s, dir, "orders").filter(col("op") === "r")
        .select(col("after.*"), col("op"), col("source.pos").as("pos"))),

    // K2/K3: flagship CDC materialization (upsert/delete replay)
    "k2_materialize" -> ((s, dir) =>
      Materialize.latestState(feed(s, dir, "orders"))),

    // K2 on a composite PK (struct-key group path; reference composite-key
    // chunking, SURVEY S4)
    "k2_materialize_composite" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val df = o
        .withColumn("ok1", col("o_orderkey") % 97)
        .withColumn("ok2", floor(col("o_orderkey") / 97).cast("long"))
      val fd = ChangeFeedGen.feed(df, "orders", df("o_orderkey").cast("long"),
        ChangeFeedGen.mutationsFor("orders", df), Some(Seq("ok1", "ok2")))
      Materialize.latestState(fd)
    }),

    // K5: reduced buffer — last envelope per key
    "k5_reduced_buffer" -> ((s, dir) =>
      Materialize.reduceByKey(feed(s, dir, "orders"))
        .select(col("key.o_orderkey").as("o_orderkey"), col("op"),
          col("source.pos").as("pos"))),

    // P10: at-least-once replay + offset dedup == exactly-once
    "p10_offset_dedup" -> ((s, dir) => {
      val f = feed(s, dir, "orders")
      val replayed = f.unionAll(f.filter(col("source.pos") % 2 === 0))
      Materialize.latestState(Materialize.offsetDedup(replayed))
    }),

    // T8: ExtractNewRecordState, rewrite-delete mode
    "t8_unwrap_rewrite" -> ((s, dir) =>
      Transforms.unwrap(feed(s, dir, "orders"), "rewrite", Seq("op", "source.pos"))),

    // SCD-2 history table (operators/Scd2.scala): every key version with
    // its validity interval — updates close the prior version, deletes
    // close without a successor; one lead() shuffle on the key.
    "k2_history_table" -> ((s, dir) =>
      graft.operators.Scd2.historyTable(feed(s, dir, "orders"))),

    // As-of read from the history: pure range filter, no join. The log
    // interleaves snapshot reads with stream events (pos = k*10 + phase),
    // so state as of the LAST read position has every earlier key's
    // update/delete applied and the final key's pending — exactly what
    // the oracle re-derives.
    "k2_history_asof" -> ((s, dir) => {
      val asOfPos = t(s, dir, "orders")
        .agg(max(col("o_orderkey")).cast("long")).head.getLong(0) * 10
      graft.operators.Scd2.asOf(
        graft.operators.Scd2.historyTable(feed(s, dir, "orders")), asOfPos)
    })
  )

  def oracles: Map[String, String] = Map(
    "s1_snapshot_read" ->
      s"SELECT $ordersCols, 'r' AS op, o_orderkey*10 AS pos FROM orders",
    "k2_materialize" -> ordersLatest,
    "k2_materialize_composite" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey%7=3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        | o_totalprice, o_orderdate, o_orderpriority,
        | o_orderkey%97 AS ok1, CAST(floor(o_orderkey/97) AS BIGINT) AS ok2
        |FROM orders WHERE o_orderkey%13<>6""".stripMargin,
    "k5_reduced_buffer" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey%13=6 THEN 'd' WHEN o_orderkey%7=3 THEN 'u' ELSE 'r' END AS op,
        | CASE WHEN o_orderkey%13=6 THEN o_orderkey*10+2 WHEN o_orderkey%7=3 THEN o_orderkey*10+1 ELSE o_orderkey*10 END AS pos
        |FROM orders""".stripMargin,
    "p10_offset_dedup" -> ordersLatest,
    "t8_unwrap_rewrite" ->
      s"""SELECT $ordersCols, 'false' AS __deleted, 'r' AS __op, o_orderkey*10 AS __pos FROM orders
         |UNION ALL
         |SELECT $ordersMut, 'false' AS __deleted, 'u' AS __op, o_orderkey*10+1 AS __pos FROM orders WHERE o_orderkey%7=3
         |UNION ALL
         |SELECT $ordersCols, 'true' AS __deleted, 'd' AS __op, o_orderkey*10+2 AS __pos FROM orders WHERE o_orderkey%13=6""".stripMargin,

    // r versions: closed by the update (k%7=3) or the delete (k%13=6);
    // u versions: exist for k%7=3, closed only by the delete
    "k2_history_table" ->
      s"""SELECT $ordersCols, o_orderkey*10 AS valid_from_pos,
         | CASE WHEN o_orderkey%7=3 THEN o_orderkey*10+1
         |      WHEN o_orderkey%13=6 THEN o_orderkey*10+2 END AS valid_to_pos,
         | (o_orderkey%7<>3 AND o_orderkey%13<>6) AS is_current
         |FROM orders
         |UNION ALL
         |SELECT $ordersMut, o_orderkey*10+1,
         | CASE WHEN o_orderkey%13=6 THEN o_orderkey*10+2 END,
         | o_orderkey%13<>6
         |FROM orders WHERE o_orderkey%7=3""".stripMargin,

    "k2_history_asof" ->
      """WITH mk AS (SELECT max(o_orderkey) AS m FROM orders)
        |SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey%7=3 AND o_orderkey < m THEN 'U'
        |      ELSE o_orderstatus END AS o_orderstatus,
        | o_totalprice, o_orderdate, o_orderpriority
        |FROM orders, mk
        |WHERE NOT (o_orderkey%13=6 AND o_orderkey < m)""".stripMargin
  )
}
