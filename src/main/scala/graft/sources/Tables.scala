package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-provided test tables (see TESTDATA.md / FIXTURES.md)
  * with their engine-declared primary keys — the Spark analogue of the
  * reference's `relational/Tables.java` catalog (table id -> schema + PK).
  *
  * `surrogate` maps the (possibly composite) PK to one collision-free BIGINT
  * used as the deterministic change-feed ordering key.
  */
object Tables {
  final case class TableDef(
      name: String,
      pk: Seq[String],
      /** collision-free BIGINT surrogate of the PK */
      surrogate: DataFrame => Column)

  private def c1(col: String): DataFrame => Column = df => df(col).cast("long")

  val defs: Map[String, TableDef] = Map(
    "region"   -> TableDef("region", Seq("r_regionkey"), c1("r_regionkey")),
    "nation"   -> TableDef("nation", Seq("n_nationkey"), c1("n_nationkey")),
    "customer" -> TableDef("customer", Seq("c_custkey"), c1("c_custkey")),
    "supplier" -> TableDef("supplier", Seq("s_suppkey"), c1("s_suppkey")),
    "part"     -> TableDef("part", Seq("p_partkey"), c1("p_partkey")),
    "orders"   -> TableDef("orders", Seq("o_orderkey"), c1("o_orderkey")),
    // composite PK: linenumber is 1..7, so *10 is collision-free
    "lineitem" -> TableDef("lineitem", Seq("l_orderkey", "l_linenumber"),
      df => df("l_orderkey").cast("long") * 10 + df("l_linenumber").cast("long")),
    "events"    -> TableDef("events", Seq("event_id"), c1("event_id")),
    "documents" -> TableDef("documents", Seq("doc_id"), c1("doc_id")),
    "embeddings" -> TableDef("embeddings", Seq("vec_id"), c1("vec_id"))
  )

  /** Load one base table from an sf directory. Column pruning + filter
    * pushdown reach the parquet scan because this is a plain declarative
    * read (verify with `.explain`: PushedFilters / ReadSchema).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

  /** Epoch-µs event time from an event-time column, whichever physical
    * encoding the fixture generation stored: epoch-ns BIGINT (parquet
    * ns-int64 read under `nanosAsLong`) or µs-precision TIMESTAMP /
    * TIMESTAMP_NTZ. The reference normalizes temporal encodings the same
    * way at ingest (debezium-core io/debezium/time/MicroTimestamp.java:30
    * — everything becomes epoch-µs before downstream math). Session tz is
    * UTC in every entrypoint, so the NTZ→timestamp cast is wall-clock
    * identity and matches DuckDB's `epoch_us(ts)` exactly.
    */
  def epochUs(schema: StructType, name: String = "ts"): Column =
    schema(name).dataType match {
      case LongType                         => expr(s"$name div 1000")
      case TimestampType | TimestampNTZType => unix_micros(col(name).cast("timestamp"))
      case other =>
        throw new IllegalArgumentException(s"unsupported event-time dtype for $name: $other")
    }

  def epochUs(df: DataFrame): Column = epochUs(df.schema, "ts")
}
