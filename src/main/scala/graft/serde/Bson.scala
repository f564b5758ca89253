package graft.serde

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal BSON codec for the MongoDB wire protocol (S12 live client).
  *
  * Implements the subset of the published BSON spec (bsonspec.org §
  * "Specification", element types 0x01 double, 0x02 string, 0x03
  * document, 0x04 array, 0x08 boolean, 0x0A null, 0x10 int32, 0x12
  * int64) that MongoDB commands and change-stream event documents
  * need. Field order is preserved — BSON documents are ordered, and
  * the change-stream decoder's JSON output must render fields in
  * cursor order.
  *
  * The JSON bridge ([[parseJson]]/[[renderJson]]) is the loopback
  * seam between the recorded JSONL fixtures and the wire: fixture
  * lines parse into BSON for the fixture server to serve, and the
  * live client renders fetched documents back to JSON for
  * `MongoChangeStream.decode`. The bridge round-trips the fixture
  * corpus byte-identically (integral numbers stay int64, decimals
  * become doubles rendered via `Double.toString`), which a spec pins.
  */
object Bson {

  sealed trait BVal
  final case class BDoc(fields: Seq[(String, BVal)]) extends BVal {
    def get(name: String): Option[BVal] =
      fields.collectFirst { case (`name`, v) => v }
  }
  final case class BArr(items: Seq[BVal]) extends BVal
  final case class BStr(value: String) extends BVal
  final case class BInt32(value: Int) extends BVal
  final case class BInt64(value: Long) extends BVal
  final case class BDouble(value: Double) extends BVal
  final case class BBool(value: Boolean) extends BVal
  case object BNull extends BVal

  object BDoc {
    def apply(fields: (String, BVal)*)(implicit d: DummyImplicit): BDoc =
      BDoc(fields.toSeq)
  }

  // ------------------------------------------------------------ encode

  private def writeCString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0)
  }

  private def writeInt32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writeInt64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeElement(out: java.io.ByteArrayOutputStream,
                           name: String, v: BVal): Unit = v match {
    case BDouble(d) =>
      out.write(0x01); writeCString(out, name)
      writeInt64(out, java.lang.Double.doubleToLongBits(d))
    case BStr(s) =>
      out.write(0x02); writeCString(out, name)
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      writeInt32(out, bytes.length + 1); out.write(bytes); out.write(0)
    case d: BDoc =>
      out.write(0x03); writeCString(out, name); out.write(encode(d))
    case BArr(items) =>
      out.write(0x04); writeCString(out, name)
      out.write(encode(BDoc(items.zipWithIndex.map {
        case (item, i) => i.toString -> item
      })))
    case BBool(b) =>
      out.write(0x08); writeCString(out, name); out.write(if (b) 1 else 0)
    case BNull =>
      out.write(0x0A); writeCString(out, name)
    case BInt32(i) =>
      out.write(0x10); writeCString(out, name); writeInt32(out, i)
    case BInt64(l) =>
      out.write(0x12); writeCString(out, name); writeInt64(out, l)
  }

  /** Serialize a document: int32 total length + elements + 0x00. */
  def encode(doc: BDoc): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    doc.fields.foreach { case (name, v) => writeElement(body, name, v) }
    val out = new java.io.ByteArrayOutputStream()
    writeInt32(out, body.size() + 5)
    body.writeTo(out)
    out.write(0)
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Decode the document starting at `offset`; returns (doc, bytesRead). */
  def decode(bytes: Array[Byte], offset: Int = 0): (BDoc, Int) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(offset)
    val total = bb.getInt()
    val end = offset + total
    val fields = Seq.newBuilder[(String, BVal)]
    def cstring(): String = {
      val start = bb.position()
      while (bytes(bb.position()) != 0) bb.position(bb.position() + 1)
      val s = new String(bytes, start, bb.position() - start,
        StandardCharsets.UTF_8)
      bb.position(bb.position() + 1)
      s
    }
    var tpe = bb.get()
    while (tpe != 0) {
      val name = cstring()
      val v: BVal = tpe match {
        case 0x01 => BDouble(java.lang.Double.longBitsToDouble(bb.getLong()))
        case 0x02 =>
          val len = bb.getInt()
          val s = new String(bytes, bb.position(), len - 1,
            StandardCharsets.UTF_8)
          bb.position(bb.position() + len)
          BStr(s)
        case 0x03 =>
          val (doc, n) = decode(bytes, bb.position())
          bb.position(bb.position() + n)
          doc
        case 0x04 =>
          val (doc, n) = decode(bytes, bb.position())
          bb.position(bb.position() + n)
          BArr(doc.fields.map(_._2))
        case 0x08 => BBool(bb.get() != 0)
        case 0x0A => BNull
        case 0x10 => BInt32(bb.getInt())
        case 0x12 => BInt64(bb.getLong())
        case other =>
          throw new IllegalArgumentException(
            f"unsupported BSON element type 0x$other%02x at field '$name'")
      }
      fields += name -> v
      tpe = bb.get()
    }
    require(bb.position() == end,
      s"BSON document length mismatch: read ${bb.position() - offset}, " +
        s"declared $total")
    (BDoc(fields.result()), total)
  }

  // -------------------------------------------------------- JSON bridge

  /** Parse one JSON text into the BSON tree, preserving field order.
    * Integral numbers (no '.', 'e', 'E') become int64; anything with a
    * fraction or exponent becomes double — so rendering reverses the
    * parse exactly for the fixture corpus.
    */
  def parseJson(text: String): BVal = {
    val p = new JsonCursor(text)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}: '${text.drop(p.pos).take(20)}'")
    v
  }

  private final class JsonCursor(text: String) {
    var pos = 0
    def eof: Boolean = pos >= text.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(text.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && text.charAt(pos) == c,
        s"expected '$c' at $pos in: ${text.take(pos + 10)}")
      pos += 1
    }
    def parseValue(): BVal = {
      skipWs()
      text.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => BStr(parseString())
        case 't' => expectWord("true"); BBool(true)
        case 'f' => expectWord("false"); BBool(false)
        case 'n' => expectWord("null"); BNull
        case _ => parseNumber()
      }
    }
    private def expectWord(w: String): Unit = {
      require(text.startsWith(w, pos), s"bad literal at $pos")
      pos += w.length
    }
    private def parseObject(): BDoc = {
      expect('{'); skipWs()
      val fields = Seq.newBuilder[(String, BVal)]
      if (text.charAt(pos) == '}') { pos += 1; return BDoc(fields.result()) }
      var more = true
      while (more) {
        skipWs()
        val name = parseString()
        skipWs(); expect(':')
        fields += name -> parseValue()
        skipWs()
        if (text.charAt(pos) == ',') pos += 1 else more = false
      }
      expect('}')
      BDoc(fields.result())
    }
    private def parseArray(): BArr = {
      expect('['); skipWs()
      val items = Seq.newBuilder[BVal]
      if (text.charAt(pos) == ']') { pos += 1; return BArr(items.result()) }
      var more = true
      while (more) {
        items += parseValue()
        skipWs()
        if (text.charAt(pos) == ',') pos += 1 else more = false
      }
      expect(']')
      BArr(items.result())
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (text.charAt(pos) != '"') {
        val c = text.charAt(pos)
        if (c == '\\') {
          pos += 1
          text.charAt(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(text.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other =>
              throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def parseNumber(): BVal = {
      val start = pos
      if (text.charAt(pos) == '-') pos += 1
      while (!eof && (text.charAt(pos).isDigit || "+-.eE".contains(text.charAt(pos))))
        pos += 1
      val lexeme = text.substring(start, pos)
      if (lexeme.exists(c => c == '.' || c == 'e' || c == 'E'))
        BDouble(lexeme.toDouble)
      else BInt64(lexeme.toLong)
    }
  }

  /** Render a BSON tree as compact JSON. Int64/int32 render as plain
    * integers, doubles via `Double.toString` — the inverse of
    * [[parseJson]]'s number typing, so parse-then-render is identity
    * on the fixture corpus (spec-pinned).
    */
  def renderJson(v: BVal): String = v match {
    case BDoc(fields) =>
      fields.map { case (k, fv) =>
        s""""${escapeJson(k)}":${renderJson(fv)}"""
      }.mkString("{", ",", "}")
    case BArr(items) => items.map(renderJson).mkString("[", ",", "]")
    case BStr(s) => s""""${escapeJson(s)}""""
    case BInt32(i) => i.toString
    case BInt64(l) => l.toString
    case BDouble(d) =>
      if (d.isNaN || d.isInfinite)
        throw new IllegalArgumentException(s"non-finite double in JSON: $d")
      else d.toString
    case BBool(b) => b.toString
    case BNull => "null"
  }

  private def escapeJson(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < 0x20 => sb ++= f"\\u$c%04x"
      case c => sb += c
    }
    sb.toString
  }
}
