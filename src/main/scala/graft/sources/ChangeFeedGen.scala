package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** Deterministic change-feed generator: derives an envelope stream from a
  * base table, mirroring the reference's test pattern (apply a scripted DML
  * sequence, assert the emitted envelopes — see reference
  * `debezium-embedded/src/test/java/io/debezium/embedded/AbstractConnectorTest.java:93`).
  *
  * The script is a pure function of the PK surrogate `k`, so the exact same
  * feed is expressible in ANSI SQL for the DuckDB oracle:
  *
  *   - snapshot read  (op=r): every row,        pos = k*10,   snapshot='true'
  *   - update         (op=u): rows k%7==3,      pos = k*10+1, after = mutated
  *   - delete         (op=d): rows k%13==6,     pos = k*10+2, after = null
  *
  * `pos` is a collision-free monotonic total order (the stand-in for
  * lsn/scn/binlog position); streamed events carry txId = 'tx' || k/100.
  */
object ChangeFeedGen {

  /** Standard per-table update mutation — must stay SQL-expressible because
    * oracle queries re-derive it (see SparkEntry.oracleSql).
    */
  def mutationsFor(table: String, df: DataFrame): Map[String, Column] = table match {
    case "orders"   => Map("o_orderstatus" -> lit("U"))
    case "customer" => Map("c_acctbal" -> (df("c_acctbal") + lit(100.0)))
    case "lineitem" => Map("l_quantity" -> (df("l_quantity") + lit(1.0)))
    case "supplier" => Map("s_acctbal" -> (df("s_acctbal") + lit(100.0)))
    case "part"     => Map("p_retailprice" -> (df("p_retailprice") + lit(1.0)))
    case _          => Map.empty
  }

  /** Full feed: snapshot (op=r) + scripted stream (u, d).
    *
    * @param pkOverride the `message.key.columns` override (ref
    *   `RelationalDatabaseConnectorConfig.java:323`): key struct columns
    *   instead of the table's declared PK
    * @param tombstonesOnDelete emit a post-delete tombstone record (key
    *   only, null images, pos = delete pos + 1) per delete — ref
    *   `tombstones.on.delete` (`CommonConnectorConfig.java:690`)
    */
  def feed(df: DataFrame, table: String, k: Column,
           mutations: Map[String, Column],
           pkOverride: Option[Seq[String]] = None,
           tombstonesOnDelete: Boolean = false): DataFrame = {
    val payloadCols = df.columns.toSeq
    val pk = pkOverride.orElse(Tables.defs.get(table).map(_.pk))
      .getOrElse(payloadCols.take(1))
    val payload = struct(payloadCols.map(df(_)): _*)
    val mutated = struct(payloadCols.map(c => mutations.getOrElse(c, df(c)).as(c)): _*)
    val keyStruct = struct(pk.map(df(_)): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payloadCols.map(df.schema(_))))
    val txId = concat(lit("tx"), (k / 100).cast("long").cast("string"))

    def env(rows: DataFrame, op: String, pos: Column, before: Column,
            after: Column, snap: Boolean): DataFrame = {
      val tx = if (snap) lit(null).cast("string") else txId
      // struct() over `rows`' columns still resolves because env() is only
      // called with filters of `df` (same lineage).
      rows.select(
        keyStruct.as("key"),
        before.as("before"),
        after.as("after"),
        lit(op).as("op"),
        Envelope.sourceStruct(table, pos, tx,
          if (snap) lit("true") else lit("false")).as("source"),
        lit(null).cast(Envelope.transactionSchema).as("transaction"),
        (lit(1700000000000L) + pos.cast("long")).as("ts_ms"))
    }

    val reads   = env(df, Envelope.OpRead, k * 10, nullPayload, payload, snap = true)
    val updates = env(df.filter(k % 7 === 3), Envelope.OpUpdate, k * 10 + 1,
      payload, mutated, snap = false)
    val deletes = env(df.filter(k % 13 === 6), Envelope.OpDelete, k * 10 + 2,
      payload, nullPayload, snap = false)
    val base = reads.unionAll(updates).unionAll(deletes)
    if (!tombstonesOnDelete) base
    else base.unionAll(
      env(df.filter(k % 13 === 6), Envelope.OpTombstone, k * 10 + 3,
        nullPayload, nullPayload, snap = false))
  }

  /** Feed with the standard mutation script for a named test table. */
  def standardFeed(df: DataFrame, table: String,
                   pkOverride: Option[Seq[String]] = None,
                   tombstonesOnDelete: Boolean = false): DataFrame = {
    val k = Tables.defs(table).surrogate(df)
    feed(df, table, k, mutationsFor(table, df), pkOverride, tombstonesOnDelete)
  }
}
