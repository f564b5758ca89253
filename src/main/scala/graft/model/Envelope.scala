package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical change-event envelope — the engine IR.
  *
  * Mirrors the reference's envelope shape (see reference
  * `debezium-connector-common/src/main/java/io/debezium/data/Envelope.java:90-127`):
  * every record is a keyed row struct with `before`/`after` images, an
  * operation code, provenance (`source`), optional transaction block and a
  * processing timestamp. Here the envelope is a set of top-level DataFrame
  * columns (not one nested value struct) so Catalyst can prune/push-down
  * through it.
  *
  * Columns:
  *   - `key`:    STRUCT of the table's primary-key columns
  *   - `before`: STRUCT payload image before the change (null for r/c)
  *   - `after`:  STRUCT payload image after the change (null for d)
  *   - `op`:     r | c | u | d | t | m
  *   - `source`: STRUCT<connector, db, schema, table, pos, txId, ts_ms, snapshot>
  *   - `ts_ms`:  processing timestamp (deterministic in tests)
  */
object Envelope {
  val OpRead = "r"
  val OpCreate = "c"
  val OpUpdate = "u"
  val OpDelete = "d"
  val OpTruncate = "t"
  val OpMessage = "m"
  /** Post-delete tombstone (ref `tombstones.on.delete`,
    * `CommonConnectorConfig.java:690`): key only, both images null — a
    * compaction marker, ignored by state-materializing sinks.
    */
  val OpTombstone = "x"

  /** Provenance struct schema. `pos` is the monotonic total-order position
    * standing in for lsn/scn/binlog-pos; `txId` groups events into source
    * transactions.
    */
  val sourceSchema: StructType = StructType(Seq(
    StructField("connector", StringType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("pos", LongType),
    StructField("txId", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType)
  ))

  val transactionSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("total_order", LongType),
    StructField("data_collection_order", LongType)
  ))

  /** Full envelope schema for a payload `P` and key `K`. */
  def schemaFor(key: StructType, payload: StructType): StructType = StructType(Seq(
    StructField("key", key),
    StructField("before", payload),
    StructField("after", payload),
    StructField("op", StringType, nullable = false),
    StructField("source", sourceSchema),
    StructField("transaction", transactionSchema),
    StructField("ts_ms", LongType)
  ))

  /** Column helper: build the `source` struct. */
  def sourceStruct(table: String, pos: Column, txId: Column, snapshot: Column): Column =
    struct(
      lit("graft").as("connector"),
      lit("testdb").as("db"),
      lit("public").as("schema"),
      lit(table).as("table"),
      pos.cast(LongType).as("pos"),
      txId.cast(StringType).as("txId"),
      (lit(1700000000000L) + pos.cast(LongType)).as("ts_ms"),
      snapshot.as("snapshot")
    )

  /** Fully-qualified 3-part table identity (reference `relational/TableId.java`). */
  final case class TableId(catalog: String, schema: String, table: String) {
    override def toString: String = s"$catalog.$schema.$table"
  }

  object TableId {
    /** Quoting-aware parse of `catalog.schema.table` (1-3 parts; quotes:
      * double quotes or backticks, doubled quote escapes — the grammar of
      * the reference's `relational/TableIdParser.java`).
      */
    def parse(s: String): TableId = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var quote: Option[Char] = None
      var i = 0
      while (i < s.length) {
        val c = s(i)
        quote match {
          case Some(q) =>
            if (c == q) {
              if (i + 1 < s.length && s(i + 1) == q) { cur += q; i += 1 }
              else quote = None
            } else cur += c
          case None =>
            if (c == '"' || c == '`') quote = Some(c)
            else if (c == '.') { parts += cur.result(); cur.clear() }
            else cur += c
        }
        i += 1
      }
      parts += cur.result()
      parts.toSeq match {
        case Seq(t) => TableId(null, null, t)
        case Seq(sch, t) => TableId(null, sch, t)
        case Seq(cat, sch, t) => TableId(cat, sch, t)
        case _ => throw new IllegalArgumentException(s"bad table id: $s")
      }
    }
  }
}
