package graft.serde

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro change-event serialization format (SURVEY §2.8 embedded-engine
  * formats; reference `debezium-api/src/main/java/io/debezium/engine/
  * format/Avro.java` — the embedded engine hands records to consumers
  * as Avro binary via the Connect Avro converter). The Avro runtime
  * (`org.apache.avro`, on Spark's classpath) does the real encoding:
  * a Spark row schema maps to an Avro record schema (nullable fields
  * as `[null, T]` unions, the Avro convention), rows encode through
  * `GenericDatumWriter`/binary encoder and decode back through
  * `GenericDatumReader`.
  *
  * Scale shape: schema built once per PARTITION, rows streamed through
  * one reused encoder — the sink-side converter loop shape.
  */
object AvroFormat {

  /** Avro record schema for a flat Spark schema. */
  def avroSchema(schema: StructType, name: String = "ChangeValue"): Schema = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported Avro field type $other for ${f.name}")
      }
      fields =
        if (f.nullable)
          fields.name(f.name)
            .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
            .withDefault(null)
        else fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  /** Serialize one row (Avro binary, no framing — the converter's
    * payload bytes).
    */
  def encode(row: Row, schema: StructType, avro: Schema): Array[Byte] = {
    val rec = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case StringType => row.getString(i)
          case BinaryType => java.nio.ByteBuffer.wrap(
            row.getAs[Array[Byte]](i))
          case _ => row.get(i).asInstanceOf[AnyRef]
        }
      rec.put(f.name, v)
    }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](avro).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode the binary payload back to field values (in schema order). */
  def decode(bytes: Array[Byte], schema: StructType, avro: Schema): Seq[Any] = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = new GenericDatumReader[GenericRecord](avro).read(null, dec)
    schema.fields.map { f =>
      rec.get(f.name) match {
        case null => null
        case u: org.apache.avro.util.Utf8 => u.toString
        case bb: java.nio.ByteBuffer =>
          val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
        case v => v
      }
    }.toSeq
  }

  /** The canonical JSON form of the schema (what a schema registry would
    * store).
    */
  def schemaJson(schema: StructType): String = avroSchema(schema).toString
}
