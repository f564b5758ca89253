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
}
