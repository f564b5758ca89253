package graft.sinks.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.Type.Repetition

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/** Executor-side parquet writer for `InternalRow`s — the DML staging
  * format of the row-level write path ([[SinkRowLevelOperation]]).
  *
  * Spark's own parquet `OutputWriter` is `private[sql]`, so this uses
  * parquet-mr's PUBLIC example API (`Group` + `ExampleParquetWriter`)
  * with a schema converter that emits the standard Spark-readable
  * layout: annotated primitives, 3-level LIST groups, `key_value` MAP
  * groups, FIXED_LEN_BYTE_ARRAY decimals and micros timestamps — so
  * `spark.read.parquet` round-trips the rows bit-exactly. Staged files
  * are ordinary data files on the table's filesystem, written by the
  * task that produced the rows (the Iceberg/Delta write shape: data
  * moves executor→storage; only file names ride the commit message to
  * the driver).
  *
  * Reference analog: the sink's staging of change batches before the
  * transactional flush (`jdbc/JdbcChangeEventSink.java` buffers then
  * flushes); here the staging is a columnar file because the commit is
  * a Spark job over it.
  */
object InternalRowParquet {

  /** Minimal FIXED_LEN_BYTE_ARRAY width for a decimal precision. */
  private[graft] def decimalBytes(precision: Int): Int = {
    var b = 1
    // max unscaled value needs ceil((p*log2(10)+1)/8) bytes, signed
    while (math.pow(10, precision.toDouble) - 1 >
             math.pow(2, 8.0 * b - 1) - 1) b += 1
    b
  }

  /** Spark `DataType` → parquet `Type` with the standard annotations
    * Spark's reader expects. Everything is `optional` — null encodes as
    * an absent value, and the read side re-applies nullability.
    */
  private def parquetType(name: String, dt: DataType): Type = dt match {
    case BooleanType => Types.optional(BOOLEAN).named(name)
    case ByteType =>
      Types.optional(INT32)
        .as(LogicalTypeAnnotation.intType(8, true)).named(name)
    case ShortType =>
      Types.optional(INT32)
        .as(LogicalTypeAnnotation.intType(16, true)).named(name)
    case IntegerType => Types.optional(INT32).named(name)
    case LongType => Types.optional(INT64).named(name)
    case FloatType => Types.optional(FLOAT).named(name)
    case DoubleType => Types.optional(DOUBLE).named(name)
    case StringType =>
      Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named(name)
    case BinaryType => Types.optional(BINARY).named(name)
    case DateType =>
      Types.optional(INT32)
        .as(LogicalTypeAnnotation.dateType()).named(name)
    case TimestampType =>
      Types.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
        .named(name)
    case TimestampNTZType =>
      Types.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
        .named(name)
    case d: DecimalType =>
      Types.optional(FIXED_LEN_BYTE_ARRAY).length(decimalBytes(d.precision))
        .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
        .named(name)
    case st: StructType =>
      st.fields.foldLeft(Types.optionalGroup()) { (g, f) =>
        g.addField(parquetType(f.name, f.dataType))
      }.named(name)
    case ArrayType(et, _) =>
      // standard 3-level LIST: optional group (LIST) {
      //   repeated group list { optional <e> element } }
      Types.optionalGroup().as(LogicalTypeAnnotation.listType())
        .addField(Types.repeatedGroup()
          .addField(parquetType("element", et)).named("list"))
        .named(name)
    case MapType(kt, vt, _) =>
      Types.optionalGroup().as(LogicalTypeAnnotation.mapType())
        .addField(Types.repeatedGroup()
          .addField(parquetType("key", kt))
          .addField(parquetType("value", vt)).named("key_value"))
        .named(name)
    case other =>
      throw new UnsupportedOperationException(
        s"cannot stage column '$name' of type ${other.simpleString} to parquet")
  }

  def messageType(schema: StructType): MessageType = {
    val m = Types.buildMessage()
    schema.fields.foreach(f => m.addField(parquetType(f.name, f.dataType)))
    m.named("spark_schema")
  }

  /** Two's-complement unscaled bytes, sign-extended to `width`. */
  private[graft] def decimalBinary(d: Decimal, width: Int): Binary = {
    val raw = d.toJavaBigDecimal.unscaledValue.toByteArray
    if (raw.length == width) Binary.fromConstantByteArray(raw)
    else if (raw.length > width)
      throw new ArithmeticException(
        s"decimal $d overflows $width staged bytes")
    else {
      val out = new Array[Byte](width)
      val pad: Byte = if (raw(0) < 0) -1 else 0
      java.util.Arrays.fill(out, 0, width - raw.length, pad)
      System.arraycopy(raw, 0, out, width - raw.length, raw.length)
      Binary.fromConstantByteArray(out)
    }
  }

  /** Write one value (known non-null) of `dt` into `g` under `name`.
    * The getter indirection (`SpecializedGetters`-style) is inlined per
    * container kind via the (get, ordinal) closure arguments.
    */
  private def addValue(g: Group, name: String, dt: DataType,
                       read: (DataType) => Any): Unit = dt match {
    case BooleanType => g.add(name, read(dt).asInstanceOf[Boolean])
    case ByteType => g.add(name, read(dt).asInstanceOf[Byte].toInt)
    case ShortType => g.add(name, read(dt).asInstanceOf[Short].toInt)
    case IntegerType | DateType => g.add(name, read(dt).asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      g.add(name, read(dt).asInstanceOf[Long])
    case FloatType => g.add(name, read(dt).asInstanceOf[Float])
    case DoubleType => g.add(name, read(dt).asInstanceOf[Double])
    case StringType =>
      g.add(name, Binary.fromConstantByteArray(
        read(dt).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .getBytes))
    case BinaryType =>
      g.add(name, Binary.fromConstantByteArray(
        read(dt).asInstanceOf[Array[Byte]]))
    case d: DecimalType =>
      g.add(name, decimalBinary(read(dt).asInstanceOf[Decimal],
        decimalBytes(d.precision)))
    case st: StructType =>
      val child = g.addGroup(name)
      writeStruct(child, read(dt).asInstanceOf[InternalRow], st)
    case ArrayType(et, _) =>
      val arr = read(dt).asInstanceOf[ArrayData]
      val wrap = g.addGroup(name)
      var i = 0
      while (i < arr.numElements()) {
        val slot = wrap.addGroup("list")
        if (!arr.isNullAt(i)) {
          val j = i
          addValue(slot, "element", et, t => arr.get(j, t))
        }
        i += 1
      }
    case MapType(kt, vt, _) =>
      val m = read(dt).asInstanceOf[MapData]
      val keys = m.keyArray(); val vals = m.valueArray()
      val wrap = g.addGroup(name)
      var i = 0
      while (i < m.numElements()) {
        val slot = wrap.addGroup("key_value")
        val j = i
        addValue(slot, "key", kt, t => keys.get(j, t))
        if (!vals.isNullAt(i)) addValue(slot, "value", vt, t => vals.get(j, t))
        i += 1
      }
    case other =>
      throw new UnsupportedOperationException(
        s"cannot stage value of type ${other.simpleString}")
  }

  private def writeStruct(g: Group, row: InternalRow, st: StructType): Unit = {
    var i = 0
    while (i < st.fields.length) {
      if (!row.isNullAt(i)) {
        val f = st.fields(i)
        val j = i
        addValue(g, f.name, f.dataType, t => row.get(j, t))
      }
      i += 1
    }
  }

  def toGroup(row: InternalRow, schema: StructType,
              mt: MessageType): Group = {
    val g = new SimpleGroup(mt)
    writeStruct(g, row, schema)
    g
  }

  /** Open a parquet writer at `path` (any Hadoop filesystem). */
  def open(path: String, schema: StructType,
           confProps: Map[String, String]): GroupFileWriter = {
    val conf = new Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val mt = messageType(schema)
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new HPath(path), conf))
      .withType(mt)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.CREATE)
      .build()
    new GroupFileWriter(w, schema, mt, path, confProps)
  }

  /** Hadoop conf entries worth shipping to executors (skip the bulky
    * defaults — only explicitly-set properties matter for FS access).
    */
  def shippableConf(conf: Configuration): Map[String, String] =
    conf.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, _) =>
        k.startsWith("fs.") || k.startsWith("hadoop.security") ||
        k.startsWith("dfs.") || k.startsWith("io.compression")
      }
      .toMap
}

/** One staged data file being written by one task. */
final class GroupFileWriter(w: ParquetWriter[Group], schema: StructType,
                            mt: MessageType, val path: String,
                            confProps: Map[String, String]) {
  private var n = 0L
  def write(row: InternalRow): Unit = {
    w.write(InternalRowParquet.toGroup(row, schema, mt))
    n += 1
  }
  def rows: Long = n
  def close(): Unit = w.close()
  /** Close and remove the file (task abort). */
  def abort(): Unit = {
    try w.close() catch { case _: Throwable => () }
    val conf = new Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val p = new HPath(path)
    try { p.getFileSystem(conf).delete(p, false); () }
    catch { case _: Throwable => () }
  }
}
