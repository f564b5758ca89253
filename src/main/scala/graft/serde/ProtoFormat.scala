package graft.serde

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Protobuf change-event serialization format (SURVEY §2.8 embedded-
  * engine formats; reference `debezium-api/src/main/java/io/debezium/
  * engine/format/Protobuf.java` — the engine hands consumers
  * protobuf-encoded payloads via the Connect protobuf converter). The
  * message schema is positional: Spark field i → protobuf field i+1,
  * scalar wire mappings long/int→varint (zigzag-free, values are
  * non-negative positions/keys; negatives still round-trip via 64-bit
  * two's-complement varints, the proto3 int64 rule), double→fixed64,
  * string/binary→length-delimited, boolean→varint. proto3 presence:
  * null fields are simply absent and decode back to null.
  *
  * Encoding rides the in-repo [[Protobuf]] wire codec — the same bytes
  * `protoc`-generated code would emit for this schema.
  */
object ProtoFormat {

  def encode(row: Row, schema: StructType): Array[Byte] = {
    val w = new Protobuf.Writer
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val no = i + 1
        f.dataType match {
          case LongType => w.varint(no, row.getLong(i))
          case IntegerType => w.varint(no, row.getInt(i).toLong)
          case BooleanType => w.varint(no, if (row.getBoolean(i)) 1L else 0L)
          case DoubleType => w.fixed64(no,
            java.lang.Double.doubleToLongBits(row.getDouble(i)))
          case StringType => w.string(no, row.getString(i))
          case BinaryType => w.bytes(no, row.getAs[Array[Byte]](i))
          case other => throw new IllegalArgumentException(
            s"unsupported protobuf field type $other for ${f.name}")
        }
      }
    }
    w.result()
  }

  def decode(bytes: Array[Byte], schema: StructType): Seq[Any] = {
    val msg = Protobuf.decode(bytes)
    schema.fields.zipWithIndex.map { case (f, i) =>
      val no = i + 1
      f.dataType match {
        case LongType => msg.varint(no)
          .map(v => v: java.lang.Long).orNull
        case IntegerType => msg.varint(no)
          .map(v => v.toInt: java.lang.Integer).orNull
        case BooleanType => msg.varint(no)
          .map(v => (v != 0L): java.lang.Boolean).orNull
        case DoubleType => msg.fields.collectFirst {
          case (`no`, Protobuf.Fixed64(v)) =>
            java.lang.Double.longBitsToDouble(v): java.lang.Double
        }.orNull
        case StringType => msg.string(no).orNull
        case BinaryType => msg.firstBytes(no).orNull
        case other => throw new IllegalArgumentException(
          s"unsupported protobuf field type $other for ${f.name}")
      }
    }.toSeq
  }
}
