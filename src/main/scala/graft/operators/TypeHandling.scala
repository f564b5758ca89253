package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column type-handling configuration — the day-one relational knobs
  * (reference `relational/RelationalDatabaseConnectorConfig.java:337`
  * `decimal.handling.mode`, `:419` `time.precision.mode`, and
  * `CommonConnectorConfig.java` `binary.handling.mode`): one enum per
  * family drives how the envelope payload represents the source type.
  * Applied as a pure struct-rebuild expression over `before`/`after`, so
  * Catalyst still prunes and pushes through it.
  */
object TypeHandling {

  /** ref `decimal.handling.mode`: precise | double | string. */
  sealed trait DecimalMode
  object DecimalMode {
    case object Precise extends DecimalMode
    case object AsDouble extends DecimalMode
    case object AsString extends DecimalMode
  }

  /** ref `time.precision.mode`: adaptive (µs since epoch) | connect (ms). */
  sealed trait TimePrecisionMode
  object TimePrecisionMode {
    case object Adaptive extends TimePrecisionMode
    case object Connect extends TimePrecisionMode
    /** keep native timestamp columns untouched */
    case object Native extends TimePrecisionMode
    /** 3.x structured temporals: calendar/clock components preserved as a
      * struct, no epoch conversion (ref `time/StructuredTimestamp.java:27-36`,
      * `time/StructuredDate.java`) — year int32, month..second int8,
      * nanos int32, plus `special_value` (±infinity markers) and the
      * source column's declared fractional `precision`.
      */
    case object Structured extends TimePrecisionMode
    /** 3.x `isostring`: every temporal rendered as an ISO-8601 string
      * (ref `RelationalDatabaseConnectorConfig` TemporalPrecisionMode
      * ISOSTRING; `time/IsoTimestamp.java` family) — µs fraction for
      * timestamps, plain dates for DATE.
      */
    case object IsoString extends TimePrecisionMode
    /** `nanoseconds`: epoch-ns INT64 (ref `time/NanoTimestamp.java`). */
    case object Nanoseconds extends TimePrecisionMode
  }

  /** ref `binary.handling.mode`: bytes | base64 | hex. */
  sealed trait BinaryMode
  object BinaryMode {
    case object Bytes extends BinaryMode
    case object Base64 extends BinaryMode
    case object Hex extends BinaryMode
  }

  final case class Config(
      decimalMode: DecimalMode = DecimalMode.Precise,
      timePrecision: TimePrecisionMode = TimePrecisionMode.Native,
      binaryMode: BinaryMode = BinaryMode.Bytes,
      /** declared fractional-seconds precision recorded in structured
        * temporals; <0 = unknown (field null), matching the reference's
        * omit-when-negative (`time/StructuredTemporal.withPrecision`). */
      temporalPrecision: Int = -1)

  private def precisionCol(cfg: Config): Column =
    if (cfg.temporalPrecision >= 0) lit(cfg.temporalPrecision)
    else lit(null).cast(IntegerType)

  /** `io.debezium.time.StructuredTimestamp` as a Spark struct column:
    * calendar and clock components, sub-second nanos, special-value
    * marker, declared precision.
    */
  def structuredTimestamp(ts: Column, cfg: Config): Column = struct(
    year(ts).as("year"),
    month(ts).cast(ByteType).as("month"),
    dayofmonth(ts).cast(ByteType).as("day"),
    hour(ts).cast(ByteType).as("hour"),
    minute(ts).cast(ByteType).as("minute"),
    second(ts).cast(ByteType).as("second"),
    (pmod(unix_micros(ts), lit(1000000L)) * 1000L).cast(IntegerType).as("nanos"),
    lit(null).cast(StringType).as("special_value"),
    precisionCol(cfg).as("precision"))

  /** `io.debezium.time.StructuredDate`: calendar components only. */
  def structuredDate(d: Column, cfg: Config): Column = struct(
    year(d).as("year"),
    month(d).cast(ByteType).as("month"),
    dayofmonth(d).cast(ByteType).as("day"),
    lit(null).cast(StringType).as("special_value"),
    precisionCol(cfg).as("precision"))

  /** Per-field representation under the config. */
  def convertField(c: Column, dt: DataType, cfg: Config): Column = dt match {
    case _: DecimalType => cfg.decimalMode match {
      case DecimalMode.Precise => c
      case DecimalMode.AsDouble => c.cast(DoubleType)
      case DecimalMode.AsString => c.cast(StringType)
    }
    case TimestampType | TimestampNTZType => cfg.timePrecision match {
      case TimePrecisionMode.Native => c
      case TimePrecisionMode.Adaptive => unix_micros(c.cast(TimestampType))
      case TimePrecisionMode.Connect => unix_millis(c.cast(TimestampType))
      case TimePrecisionMode.Structured => structuredTimestamp(c.cast(TimestampType), cfg)
      case TimePrecisionMode.IsoString =>
        date_format(c.cast(TimestampType), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      case TimePrecisionMode.Nanoseconds =>
        unix_micros(c.cast(TimestampType)) * lit(1000L)
    }
    case DateType => cfg.timePrecision match {
      case TimePrecisionMode.Native => c
      case TimePrecisionMode.Structured => structuredDate(c, cfg)
      case TimePrecisionMode.IsoString => date_format(c, "yyyy-MM-dd")
      // the epoch modes surface DATE as epoch days (ref `data/Date`)
      case _ => datediff(c, lit("1970-01-01")).cast(IntegerType)
    }
    case BinaryType => cfg.binaryMode match {
      case BinaryMode.Bytes => c
      case BinaryMode.Base64 => base64(c)
      case BinaryMode.Hex => hex(c)
    }
    case _ => c
  }

  /** Rebuild one payload struct column under the config; a null struct (a
    * delete's absent after-image) stays null.
    */
  def convertStruct(df: DataFrame, colName: String, cfg: Config): DataFrame =
    df.schema(colName).dataType match {
      case st: StructType =>
        val rebuilt = struct(st.fields.toIndexedSeq.map { f =>
          convertField(col(s"$colName.`${f.name}`"), f.dataType, cfg).as(f.name)
        }: _*)
        df.withColumn(colName, when(col(colName).isNotNull, rebuilt))
      case _ => df
    }

  /** Apply the config to both envelope payload images. */
  def convertEnvelope(feed: DataFrame, cfg: Config): DataFrame =
    convertStruct(convertStruct(feed, "before", cfg), "after", cfg)
}

/** Pluggable per-column value override — the reference's `CustomConverter`
  * SPI (`debezium-api/src/main/java/io/debezium/spi/converter/CustomConverter.java:18-48`):
  * a converter inspects each payload field and may register a replacement
  * representation for it. Spark shape: the "registration" is a
  * `Column => Column` rewrite applied inside the envelope struct rebuild.
  */
trait CustomConverter {
  /** Some(rewrite) to override how `field` of `table` is represented. */
  def converterFor(table: String, field: StructField): Option[Column => Column]
}

/** Resolves the first matching converter per column and rewrites the
  * payload structs (ref `relational/CustomConverterRegistry.java`: one
  * registration per column, first converter wins).
  */
final class CustomConverterRegistry(converters: Seq[CustomConverter]) {

  def convertStruct(df: DataFrame, colName: String, table: String): DataFrame =
    df.schema(colName).dataType match {
      case st: StructType if converters.nonEmpty =>
        val rebuilt = struct(st.fields.toIndexedSeq.map { f =>
          val c = col(s"$colName.`${f.name}`")
          converters.iterator.flatMap(_.converterFor(table, f)).nextOption()
            .map(_(c)).getOrElse(c).as(f.name)
        }: _*)
        df.withColumn(colName, when(col(colName).isNotNull, rebuilt))
      case _ => df
    }

  def convertEnvelope(feed: DataFrame, table: String): DataFrame =
    convertStruct(convertStruct(feed, "before", table), "after", table)
}
