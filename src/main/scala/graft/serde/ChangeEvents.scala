package graft.serde

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.model.Envelope

/** Provenance block of a change event (`source` struct, see
  * [[graft.model.Envelope.sourceSchema]]).
  */
final case class SourceInfo(
    connector: String, db: String, schema: String, table: String,
    pos: Long, txId: String, ts_ms: Long, snapshot: String)

/** Transaction block (`transaction` struct). */
final case class TxInfo(
    id: String, total_order: Long, data_collection_order: Long)

/** Typed view of one envelope record: key `K`, payload images `V`.
  *
  * The typed consumption surface the reference ships as
  * `debezium-core/src/main/java/io/debezium/serde/DebeziumSerdes.java:20,38`
  * (Kafka Serdes materializing envelope JSON into user POJOs). Here the
  * wire format is the envelope DataFrame itself and the serde is a Spark
  * `Encoder`, so a consuming app writes `Dataset[ChangeEvent[K, V]]`
  * lambdas with full type safety and pays one codegen'd
  * serialization boundary, exactly like any other typed Dataset.
  */
final case class ChangeEvent[K, V](
    key: K,
    before: Option[V],
    after: Option[V],
    op: String,
    source: SourceInfo,
    transaction: Option[TxInfo],
    ts_ms: Long) {

  /** The unwrapped payload a state-consuming app wants: the after image,
    * or None for deletes/tombstones (`DebeziumSerdes`'s
    * `payload.unwrap=true` behavior).
    */
  def value: Option[V] =
    if (op == Envelope.OpDelete || op == Envelope.OpTombstone) None else after

  def isTombstone: Boolean = op == Envelope.OpTombstone
  def isSnapshot: Boolean = op == Envelope.OpRead
}

/** Encoders + conversions between envelope DataFrames and typed
  * `Dataset[ChangeEvent[K, V]]`.
  */
object ChangeEvents {

  /** Encoder for a typed change event; K and V are case classes matching
    * (a by-name subset of) the envelope's key/payload struct fields.
    */
  def encoder[K <: Product : TypeTag, V <: Product : TypeTag]
      : Encoder[ChangeEvent[K, V]] =
    Encoders.product[ChangeEvent[K, V]]

  /** Typed view of an envelope DataFrame. Extra struct fields beyond K/V
    * are dropped by name-based resolution; missing ones are an
    * AnalysisException at plan time (schema mismatch surfaces before any
    * data moves).
    */
  def events[K <: Product : TypeTag, V <: Product : TypeTag](
      df: DataFrame): Dataset[ChangeEvent[K, V]] = {
    implicit val enc: Encoder[ChangeEvent[K, V]] = encoder[K, V]
    val withTx =
      if (df.columns.contains("transaction")) df
      else df.withColumn("transaction",
        lit(null).cast(Envelope.transactionSchema))
    withTx
      .select("key", "before", "after", "op", "source", "transaction",
        "ts_ms")
      .as[ChangeEvent[K, V]]
  }

  /** Unwrapped current values: after images of reads/creates/updates
    * (deletes and tombstones contribute nothing) — the typed equivalent of
    * `Transforms.unwrap(df, "drop")`.
    */
  def values[K <: Product : TypeTag, V <: Product : TypeTag](
      df: DataFrame): Dataset[V] = {
    implicit val venc: Encoder[V] = Encoders.product[V]
    events[K, V](df).flatMap(_.value)
  }

  /** Back to the envelope wire shape (inverse of [[events]]); key/payload
    * schemas are those of K and V.
    */
  def toEnvelope[K <: Product : TypeTag, V <: Product : TypeTag](
      ds: Dataset[ChangeEvent[K, V]]): DataFrame = ds.toDF()
}
