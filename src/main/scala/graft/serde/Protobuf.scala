package graft.serde

import scala.collection.mutable.ArrayBuffer

/** Minimal protobuf wire-format codec (the published encoding:
  * varint-keyed fields, wire types 0 = varint, 1 = fixed64,
  * 2 = length-delimited, 5 = fixed32) — just enough to read and write
  * ONNX model files, whose schema (onnx.proto) is public. No
  * reflection, no schema compiler: callers address fields by number.
  */
object Protobuf {

  sealed trait Value
  final case class VarInt(v: Long) extends Value
  final case class Fixed64(v: Long) extends Value
  final case class Bytes(v: Array[Byte]) extends Value
  final case class Fixed32(v: Int) extends Value

  /** Decoded message: field number → values in encounter order. */
  final case class Msg(fields: Seq[(Int, Value)]) {
    def all(no: Int): Seq[Value] = fields.collect { case (`no`, v) => v }
    def bytes(no: Int): Seq[Array[Byte]] = all(no).collect { case Bytes(b) => b }
    def firstBytes(no: Int): Option[Array[Byte]] =
      fields.collectFirst { case (`no`, Bytes(b)) => b }
    def string(no: Int): Option[String] =
      firstBytes(no).map(new String(_, "UTF-8"))
    def strings(no: Int): Seq[String] = bytes(no).map(new String(_, "UTF-8"))
    def varint(no: Int): Option[Long] =
      fields.collectFirst { case (`no`, VarInt(v)) => v }
    def varints(no: Int): Seq[Long] = all(no).collect { case VarInt(v) => v }
    def msg(no: Int): Option[Msg] = firstBytes(no).map(decode)
    def msgs(no: Int): Seq[Msg] = bytes(no).map(decode)
  }

  def decode(data: Array[Byte]): Msg = {
    val out = Seq.newBuilder[(Int, Value)]
    var pos = 0
    def readVarint(): Long = {
      var v = 0L; var shift = 0; var cont = true
      while (cont) {
        val b = data(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7; cont = (b & 0x80) != 0
      }
      v
    }
    while (pos < data.length) {
      val key = readVarint()
      val fieldNo = (key >>> 3).toInt
      (key & 7L).toInt match {
        case 0 => out += fieldNo -> VarInt(readVarint())
        case 1 =>
          var v = 0L
          (0 until 8).foreach(i => { v |= (data(pos + i) & 0xffL) << (8 * i) })
          pos += 8
          out += fieldNo -> Fixed64(v)
        case 2 =>
          val len = readVarint().toInt
          out += fieldNo -> Bytes(
            java.util.Arrays.copyOfRange(data, pos, pos + len))
          pos += len
        case 5 =>
          var v = 0
          (0 until 4).foreach(i => { v |= (data(pos + i) & 0xff) << (8 * i) })
          pos += 4
          out += fieldNo -> Fixed32(v)
        case wt => throw new IllegalStateException(
          s"unsupported wire type $wt for field $fieldNo")
      }
    }
    Msg(out.result())
  }

  /** Writer: append fields in order, nest via `msgField`. */
  final class Writer {
    private val buf = new ArrayBuffer[Byte]()
    private def varintRaw(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { buf += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      buf += v.toByte
    }
    def varint(no: Int, v: Long): this.type = {
      varintRaw((no.toLong << 3) | 0L); varintRaw(v); this
    }
    def fixed64(no: Int, v: Long): this.type = {
      varintRaw((no.toLong << 3) | 1L)
      (0 until 8).foreach(i => buf += ((v >>> (8 * i)) & 0xff).toByte)
      this
    }
    def fixed32(no: Int, v: Int): this.type = {
      varintRaw((no.toLong << 3) | 5L)
      (0 until 4).foreach(i => buf += ((v >>> (8 * i)) & 0xff).toByte)
      this
    }
    def bytes(no: Int, b: Array[Byte]): this.type = {
      varintRaw((no.toLong << 3) | 2L); varintRaw(b.length.toLong)
      buf ++= b; this
    }
    def string(no: Int, s: String): this.type = bytes(no, s.getBytes("UTF-8"))
    def msgField(no: Int, m: Writer => Unit): this.type = {
      val w = new Writer; m(w); bytes(no, w.result())
    }
    def result(): Array[Byte] = buf.toArray
  }
}
