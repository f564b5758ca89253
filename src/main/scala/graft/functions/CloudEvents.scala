package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CloudEvents output format (SURVEY §2.8; reference
  * `debezium-connect-plugins/.../converters/CloudEventsConverter.java:90,258`):
  * wrap each change event in the CloudEvents 1.0 attribute set. The whole
  * converter is one projection — `ce_*` attribute columns plus an optional
  * JSON rendering for wire formats.
  */
object CloudEvents {

  /** Attribute columns for an envelope frame. */
  def attributes(df: DataFrame, sourcePrefix: String = "/graft"): DataFrame =
    df.select(
      concat(col("source.table"), lit("-"), col("source.pos")).as("ce_id"),
      concat(lit(sourcePrefix), lit("/"), col("source.db"), lit("/"),
        col("source.table")).as("ce_source"),
      lit("1.0").as("ce_specversion"),
      concat(lit("io.graft."), col("source.table"), lit("."), col("op"))
        .as("ce_type"),
      col("ts_ms").as("ce_time_ms"),
      col("key"), col("before"), col("after"), col("op"), col("source"))

  /** Full JSON rendering (structured content mode). */
  def toJsonWire(df: DataFrame): DataFrame = {
    val a = attributes(df)
    a.select(col("ce_id"),
      to_json(struct(a.columns.toIndexedSeq.map(col): _*)).as("ce_json"))
  }

  /** Media type declared for the data per the reference's data
    * `SerializerType` (`CloudEventsConverter.java:90,258` —
    * `cloudevents.data.serializer.type` json|avro).
    */
  def dataContentType(dataSerializer: String): String = dataSerializer match {
    case "json" => "application/json"
    case "avro" => "application/avro"
    case other => throw new IllegalArgumentException(
      s"unsupported CloudEvents data serializer: $other (json|avro)")
  }

  /** STRUCTURED mode with the AVRO envelope serializer
    * (`cloudevents.serializer.type=avro`, reference
    * `CloudEventsConverter.java:70-77` — both the envelope format and
    * the data format are independently json|avro): one flat record per
    * event carrying the CE attribute set plus the SERIALIZED data bytes
    * (the reference keeps the data schema under a separate `-data`
    * registry subject, `DATA_SCHEMA_SUFFIX` — here the caller supplies
    * it the same way). Returns `(ce_id, ce_source, ce_specversion,
    * ce_type, ce_time_ms, ce_datacontenttype, data)` ready for the
    * per-partition Avro codec (see the `f_cloudevents_avro` round trip).
    */
  def avroEnvelope(df: DataFrame, data: Column,
                   sourcePrefix: String = "/graft",
                   dataSerializer: String = "avro"): DataFrame =
    attributes(df, sourcePrefix).select(
      col("ce_id"), col("ce_source"), col("ce_specversion"),
      col("ce_type"), col("ce_time_ms"),
      lit(dataContentType(dataSerializer)).as("ce_datacontenttype"),
      data.as("data"))

  /** BINARY content mode (`CloudEventsConverter.java:81-87`): event
    * attributes map to `ce_`-prefixed message HEADERS per the CloudEvents
    * Kafka protocol binding, the message value carries ONLY the event
    * data, and the `content-type` header declares the data's media type
    * from the data serializer (json → `application/json`, avro →
    * `application/avro`). Returns one row per event:
    * `(headers: array<struct<key,value>>, content_type, key, before,
    * after, op)` — the data still structured; a wire writer serializes it
    * per the declared type (the `f_cloudevents_binary` query round-trips
    * the avro case through the real codec). Map-only projection.
    */
  def binaryMode(df: DataFrame, sourcePrefix: String = "/graft",
                 dataSerializer: String = "json"): DataFrame = {
    val ct = dataContentType(dataSerializer)
    val a = attributes(df, sourcePrefix)
    def h(name: String, v: Column) =
      struct(lit(name).as("key"), v.cast("string").as("value"))
    a.select(
      array(
        h("ce_id", col("ce_id")),
        h("ce_source", col("ce_source")),
        h("ce_specversion", col("ce_specversion")),
        h("ce_type", col("ce_type")),
        h("ce_time", col("ce_time_ms")),
        h("content-type", lit(ct))).as("headers"),
      lit(ct).as("content_type"),
      col("key"), col("before"), col("after"), col("op"))
  }
}
