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

  // --- interval.handling.mode (ref `PostgresConnectorConfig.java:988`,
  // also Oracle INTERVAL YEAR/DAY TO SECOND): numeric → the approximate
  // MicroDuration epoch-micros INT64, string → ISO-8601 `PnYnMnDTnHnMnS`.

  /** The reference's month-length approximation
    * (`time/MicroDuration.java:26` `DAYS_PER_MONTH_AVG = 365.25/12`).
    */
  val DaysPerMonthAvg: Double = 365.25 / 12.0

  /** `interval.handling.mode=numeric`: component columns → approximate
    * duration in microseconds, exactly the reference's double-arithmetic
    * fold (`time/MicroDuration.java:77-86`): days = (y*12+m)*avg + d;
    * seconds = ((days*24+h)*60+mi)*60+s; micros = trunc(seconds*1e6)+µs.
    * All components are non-negative in a Postgres interval's normalized
    * form, so the Java `(long)` truncation is a `floor` here (floor is
    * also what DuckDB's `//` replays — NOTES double→int pitfall).
    */
  def intervalMicros(years: Column, months: Column, days: Column,
                     hours: Column, minutes: Column, seconds: Column,
                     micros: Column): Column = {
    val nDays = (years * lit(12) + months).cast(DoubleType) *
      lit(DaysPerMonthAvg) + days
    val nSecs = ((nDays * lit(24) + hours) * lit(60) + minutes) * lit(60) +
      seconds
    floor(nSecs * lit(1e6) + micros.cast(DoubleType)).cast(LongType)
  }

  /** `interval.handling.mode=string`: ISO-8601 interval string, the
    * reference's exact rendering (`time/Interval.java:73-79`): every
    * component printed (zeroes included), fractional seconds only when
    * micros ≠ 0 and with trailing zeroes stripped
    * (`BigDecimal.stripTrailingZeros`).
    */
  def intervalIso(years: Column, months: Column, days: Column,
                  hours: Column, minutes: Column, seconds: Column,
                  micros: Column): Column = {
    val frac = when(micros === 0, seconds.cast(StringType))
      .otherwise(concat(seconds.cast(StringType), lit("."),
        regexp_replace(lpad(micros.cast(StringType), 6, "0"), "0+$", "")))
    concat(lit("P"), years.cast(StringType), lit("Y"),
      months.cast(StringType), lit("M"), days.cast(StringType), lit("DT"),
      hours.cast(StringType), lit("H"), minutes.cast(StringType), lit("M"),
      frac, lit("S"))
  }

  // --- hstore.handling.mode (ref `PostgresConnectorConfig.java:978`,
  // `PostgresValueConverter` convertHstoreToMap/convertHstoreToJsonString):
  // the hstore text literal `"k"=>"v", ...` surfaces as a MAP or as a
  // JSON object string.

  /** `hstore.handling.mode=map`: parse the hstore text into
    * `map<string,string>` (pure column expressions — two regexp
    * extraction passes + `map_from_arrays`). Pair grammar `"k"=>"v"`
    * plus the two cases PG's renderer also emits: an unquoted `NULL`
    * value (preserved as a map null, matching the reference's
    * `convertHstoreToMap`) and backslash escapes (`\"`, `\\`) inside
    * quoted keys/values (unescaped on extraction).
    */
  def hstoreToMap(c: Column): Column = {
    // quoted token: any run of non-quote/non-backslash chars or escapes
    val q = "\"((?:[^\"\\\\]|\\\\.)*)\""
    val pair = s"$q=>($q|NULL)"
    def unescape(s: Column): Column =
      regexp_replace(s, "\\\\(.)", "$1")
    val keys = transform(regexp_extract_all(c, lit(pair), lit(1)),
      k => unescape(k))
    // group 2 is the full value token: `"v"` (quotes kept) or `NULL`
    val vals = transform(regexp_extract_all(c, lit(pair), lit(2)), v =>
      when(v === "NULL", lit(null: String))
        .otherwise(unescape(regexp_replace(v, "^\"|\"$", ""))))
    map_from_arrays(keys, vals)
  }

  /** `hstore.handling.mode=json`: the same pairs as a JSON object string
    * (`{"k":"v",...}`), source pair order preserved like the reference's
    * streaming writer.
    */
  def hstoreToJson(c: Column): Column = to_json(hstoreToMap(c))

  // --- PG MONEY through decimal.handling.mode with the scale pinned to
  // `money.fraction.digits` (ref `PostgresConnectorConfig.java:1151`,
  // `PostgresValueConverter.convertMoney:951`): precise → DECIMAL at the
  // configured scale (RoundingMode.HALF_UP — ties away from zero, which
  // both Spark's decimal re-scale cast and DuckDB's decimal cast apply),
  // double → the plain double, string → the scaled decimal rendered.

  /** `decimal.handling.mode=precise` for a money column: DECIMAL(38,d)
    * with HALF_UP re-scale, d = `money.fraction.digits` (default 2).
    */
  def moneyPrecise(c: Column, fractionDigits: Int = 2): Column =
    c.cast(DecimalType(38, fractionDigits))

  /** `decimal.handling.mode=double` for a money column. */
  def moneyDouble(c: Column): Column = c.cast(DoubleType)

  /** `decimal.handling.mode=string` for a money column: the scaled
    * decimal's plain rendering (`BigDecimal.setScale(d).toString`).
    */
  def moneyString(c: Column, fractionDigits: Int = 2): Column =
    moneyPrecise(c, fractionDigits).cast(StringType)

  // --- bigint.unsigned.handling.mode (ref
  // `BinlogConnectorConfig.java:506`, `MySqlValueConverters`): how a
  // MySQL BIGINT UNSIGNED — held in the engine as its wrapped SIGNED
  // 64-bit image — surfaces in the payload.

  private val TwoPow64 = BigDecimal(2).pow(64)

  /** `long` mode: the wrapped signed INT64 as-is (values ≥ 2⁶³ appear
    * negative — the reference's documented caveat for this mode).
    */
  def unsignedAsLong(wrapped: Column): Column = wrapped.cast(LongType)

  /** `precise` mode: the true unsigned value as DECIMAL(20,0) —
    * `wrapped + 2⁶⁴` when the signed image is negative.
    */
  def unsignedAsPrecise(wrapped: Column): Column = {
    val d = wrapped.cast(DecimalType(20, 0))
    when(wrapped < 0, (d + lit(TwoPow64).cast(DecimalType(21, 0)))
      .cast(DecimalType(20, 0))).otherwise(d)
  }
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
