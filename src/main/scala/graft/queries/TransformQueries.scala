package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Transforms
import graft.sources.Tables

/** Projection / filter / per-record transforms (SURVEY T1-T16, P11). */
object TransformQueries extends QueryGroup {

  private def snapshotRows(fd: DataFrame): DataFrame =
    fd.filter(col("op") === "r").select(col("after.*"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T1: table include/exclude regex over a multi-table stream
    // (the two feeds project to a common schema — same `source` struct —
    // before the union, as the reference does when many tables share one
    // event pipe)
    "t1_table_filter" -> ((s, dir) => {
      val both = Seq("orders", "customer").map { n =>
        feed(s, dir, n).select(col("source"), col("op"),
          col("source.pos").as("pos"), Envelope_keyLong(n))
      }.reduce(_ unionAll _)
      Transforms.tableFilter(both, include = Some("^cust.*"), exclude = Some(".*x$"))
        .select(col("source.table").as("tbl"), col("op"), col("pos"), col("k"))
    }),

    // T2: column include/exclude projection
    "t2_column_filter" -> ((s, dir) => {
      val kept = Set("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      snapshotRows(Transforms.columnFilter(feed(s, dir, "orders"), kept))
    }),

    // T3: masking — salted SHA-256 on c_name, constant stars on c_mktsegment
    "t3_mask_columns" -> ((s, dir) => {
      val masked = Transforms.maskConstant(
        Transforms.maskHash(feed(s, dir, "customer"), "c_name", "s3cr3t"),
        "c_mktsegment")
      snapshotRows(masked)
    }),

    // T4: truncation
    "t4_truncate_column" -> ((s, dir) =>
      snapshotRows(Transforms.truncateColumn(
        Transforms.truncateColumn(feed(s, dir, "part"), "p_name", 8),
        "p_type", 5))),

    // T6: SQL-expression filter (replaces scripted Filter SMT)
    "t6_filter_expr" -> ((s, dir) =>
      Transforms.filterExpr(feed(s, dir, "orders"),
        "after.o_totalprice > 250000 OR op = 'd'")
        .select(coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
          .as("o_orderkey"), col("op"), col("source.pos").as("pos"))),

    // T10: changed-fields diff between before/after images
    "t10_changed_fields" -> ((s, dir) =>
      Transforms.changedFields(feed(s, dir, "orders").filter(col("op") === "u"))
        .select(col("key.o_orderkey").as("o_orderkey"), col("changed_fields"))),

    // T13: record-size enforcement (size over declared text fields)
    "t13_enforce_size" -> ((s, dir) => {
      val fd = feed(s, dir, "orders")
      Transforms.enforceRecordSize(fd, 9,
        Seq("o_orderstatus", "o_orderpriority"))
        .select(coalesce(col("after.o_orderkey"), col("before.o_orderkey"))
          .as("o_orderkey"), col("op"), col("source.pos").as("pos"))
    }),

    // T14: timezone conversion of temporal payload fields
    "t14_convert_tz" -> ((s, dir) =>
      snapshotRows(Transforms.convertTimezone(feed(s, dir, "orders"),
        Seq("o_orderdate"), "Asia/Kolkata"))
        // base col is TIMESTAMP_NTZ (parquet ms, not UTC-adjusted);
        // from_utc_timestamp yields TIMESTAMP — normalize back to NTZ
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))),

    // T16: read→insert op rewrite; P11 covered by t16_skip below
    "t16_read_to_insert" -> ((s, dir) =>
      Transforms.readToInsert(feed(s, dir, "orders"))
        .groupBy(col("op")).agg(count(lit(1)).as("n"))),

    // P11: skipped operations (drop op codes)
    "p11_skip_ops" -> ((s, dir) =>
      Transforms.skipOperations(feed(s, dir, "orders"), Seq("u"))
        .groupBy(col("op")).agg(count(lit(1)).as("n"))),

    // T23: logical-decoding-message content decode — a message-monitor feed
    // (op="m", `message {prefix, content}`; content = JSON bytes as
    // pg_logical_emit_message would carry) becomes INSERT-shaped records
    // with a structured after image. `note` is null in EVERY message, so
    // the default fields.null.include=false drops it from the decoded
    // schema (the reference's IGNORE behavior) — the oracle never sees it.
    "t23_decode_message" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val msgs = docs.select(
        struct(lit("outbox").as("prefix")).as("key"),
        struct(lit("outbox").as("prefix"),
          to_json(struct(col("doc_id"), col("lang"),
              lit(null).cast("string").as("note")),
            Map("ignoreNullFields" -> "false")).cast("binary").as("content"))
          .as("message"),
        lit("m").as("op"),
        struct((col("doc_id") * 10).as("pos")).as("source"),
        (col("doc_id") * 10).as("ts_ms"))
      Transforms.decodeMessageContent(msgs)
        .select(col("op"), col("ts_ms"), col("after.*"))
    })
  )

  /** surrogate key column per table for t1 (both tables' PKs as one name) */
  private def Envelope_keyLong(n: String) = n match {
    case "orders"   => col("key.o_orderkey").cast("long").as("k")
    case "customer" => col("key.c_custkey").cast("long").as("k")
  }

  def oracles: Map[String, String] = Map(
    "t1_table_filter" ->
      """SELECT 'customer' AS tbl, 'r' AS op, c_custkey*10 AS pos, c_custkey AS k FROM customer
        |UNION ALL
        |SELECT 'customer', 'u', c_custkey*10+1, c_custkey FROM customer WHERE c_custkey%7=3
        |UNION ALL
        |SELECT 'customer', 'd', c_custkey*10+2, c_custkey FROM customer WHERE c_custkey%13=6""".stripMargin,

    "t2_column_filter" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority FROM orders",

    "t3_mask_columns" ->
      """SELECT c_custkey, sha256('s3cr3t' || c_name) AS c_name, c_nationkey,
        | c_acctbal, '***' AS c_mktsegment FROM customer""".stripMargin,

    "t4_truncate_column" ->
      """SELECT p_partkey, substring(p_name, 1, 8) AS p_name, p_brand,
        | substring(p_type, 1, 5) AS p_type, p_size, p_retailprice FROM part""".stripMargin,

    "t6_filter_expr" ->
      """SELECT o_orderkey, 'r' AS op, o_orderkey*10 AS pos FROM orders WHERE o_totalprice > 250000
        |UNION ALL
        |SELECT o_orderkey, 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3 AND o_totalprice > 250000
        |UNION ALL
        |SELECT o_orderkey, 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "t10_changed_fields" ->
      "SELECT o_orderkey, 'o_orderstatus' AS changed_fields FROM orders WHERE o_orderkey%7=3",

    "t13_enforce_size" ->
      """SELECT o_orderkey, 'r' AS op, o_orderkey*10 AS pos FROM orders
        | WHERE length(o_orderstatus)+length(o_orderpriority) <= 9
        |UNION ALL
        |SELECT o_orderkey, 'u', o_orderkey*10+1 FROM orders
        | WHERE o_orderkey%7=3 AND 1+length(o_orderpriority) <= 9
        |UNION ALL
        |SELECT o_orderkey, 'd', o_orderkey*10+2 FROM orders
        | WHERE o_orderkey%13=6 AND length(o_orderstatus)+length(o_orderpriority) <= 9""".stripMargin,

    "t14_convert_tz" ->
      "SELECT o_orderkey, o_orderdate + INTERVAL 330 MINUTE AS o_orderdate FROM orders",

    "t16_read_to_insert" ->
      """SELECT 'c' AS op, count(*) AS n FROM orders
        |UNION ALL SELECT 'u', count(*) FROM orders WHERE o_orderkey%7=3
        |UNION ALL SELECT 'd', count(*) FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "p11_skip_ops" ->
      """SELECT 'r' AS op, count(*) AS n FROM orders
        |UNION ALL SELECT 'd', count(*) FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "t23_decode_message" ->
      """SELECT 'c' AS op, doc_id*10 AS ts_ms, doc_id, lang
        |FROM documents""".stripMargin
  )

  // sha256() is the DuckDB spelling (Spark: sha2(x, 256))
  override val duckdbOnly: Set[String] = Set("t3_mask_columns")
}
