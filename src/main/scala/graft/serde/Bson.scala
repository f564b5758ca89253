package graft.serde

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** BSON codec for the MongoDB wire protocol (S12 live client + sink).
  *
  * Implements the element types a real `mongod`'s change stream and
  * command replies actually carry (bsonspec.org § "Specification"):
  * 0x01 double, 0x02 string, 0x03 document, 0x04 array, 0x05 binary
  * (with subtype), 0x07 ObjectId, 0x08 boolean, 0x09 UTC datetime,
  * 0x0A null, 0x0B regex, 0x10 int32, 0x11 timestamp, 0x12 int64,
  * 0x13 decimal128 (IEEE 754-2008 BID encoding, finite canonical
  * values). Field order is preserved — BSON documents are ordered, and
  * the change-stream decoder's JSON output must render fields in
  * cursor order. Type dispatch mirrors the reference's
  * `debezium-connector-mongodb/.../transforms/MongoDataConverter.java`
  * (its BsonType switch) re-expressed over this engine's JSON-string
  * column idiom.
  *
  * The JSON bridge ([[parseJson]]/[[renderJson]]) is the loopback
  * seam between the recorded JSONL fixtures and the wire: fixture
  * lines parse into BSON for the fixture server to serve, and the
  * live client renders fetched documents back to JSON for
  * `MongoChangeStream.decode`. The bridge round-trips the fixture
  * corpus byte-identically (integral numbers stay int64, decimals
  * become doubles rendered via `Double.toString`), which a spec pins.
  * The non-JSON-native types travel as CANONICAL EXTENDED JSON
  * wrappers (the published MongoDB Extended JSON v2 spec):
  * `{"$oid":…}`, `{"$date":{"$numberLong":…}}`, `{"$binary":
  * {"base64":…,"subType":…}}`, `{"$timestamp":{"t":…,"i":…}}`,
  * `{"$numberDecimal":…}`, `{"$regularExpression":{"pattern":…,
  * "options":…}}` — [[parseJson]] recognizes the wrappers (plus the
  * relaxed `{"$date":<ms>}` and `{"$numberLong":"…"}` scalar forms)
  * and [[renderJson]] emits the canonical form, so
  * parse-render round-trips every wrapper and the Spark-side decode
  * (`get_json_object`/`from_json`) sees stable shapes.
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
  /** 0x07 — 24 lowercase hex chars (12 bytes on the wire). */
  final case class BObjectId(hex: String) extends BVal {
    require(hex.length == 24 && hex.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"ObjectId must be 24 lowercase hex chars, got '$hex'")
  }
  /** 0x09 — UTC datetime, signed int64 milliseconds since epoch. */
  final case class BDateTime(epochMs: Long) extends BVal
  /** 0x05 — binary with subtype (0x00 generic, 0x04 UUID, …). Equality
    * is by content (case-class equals on Array is identity).
    */
  final case class BBinary(subtype: Int, bytes: Array[Byte]) extends BVal {
    override def equals(o: Any): Boolean = o match {
      case b: BBinary => subtype == b.subtype &&
        java.util.Arrays.equals(bytes, b.bytes)
      case _ => false
    }
    override def hashCode(): Int =
      31 * subtype + java.util.Arrays.hashCode(bytes)
  }
  /** 0x11 — internal BSON timestamp: uint32 seconds + uint32 increment
    * (the change-stream clusterTime's own type).
    */
  final case class BTimestamp(t: Long, i: Long) extends BVal {
    require(t >= 0 && t <= 0xFFFFFFFFL && i >= 0 && i <= 0xFFFFFFFFL,
      s"BSON timestamp fields are uint32: t=$t i=$i")
  }
  /** 0x13 — decimal128, finite canonical values (≤34-digit coefficient,
    * exponent in [-6176, 6111]); NaN/Inf are rejected at construction.
    */
  final case class BDecimal128(value: java.math.BigDecimal) extends BVal
  /** 0x0B — regular expression (pattern + option flags, both cstrings). */
  final case class BRegex(pattern: String, options: String) extends BVal

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
    case BBinary(subtype, bytes) =>
      out.write(0x05); writeCString(out, name)
      writeInt32(out, bytes.length); out.write(subtype & 0xff)
      out.write(bytes)
    case BObjectId(hex) =>
      out.write(0x07); writeCString(out, name)
      var i = 0
      while (i < 24) {
        out.write(Integer.parseInt(hex.substring(i, i + 2), 16)); i += 2
      }
    case BDateTime(ms) =>
      out.write(0x09); writeCString(out, name); writeInt64(out, ms)
    case BRegex(pattern, options) =>
      out.write(0x0B); writeCString(out, name)
      writeCString(out, pattern); writeCString(out, options)
    case BTimestamp(t, i) =>
      out.write(0x11); writeCString(out, name)
      writeInt64(out, (t << 32) | (i & 0xFFFFFFFFL))
    case BDecimal128(v) =>
      out.write(0x13); writeCString(out, name)
      val (high, low) = Decimal128.encode(v)
      writeInt64(out, low); writeInt64(out, high)
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
        case 0x05 =>
          val len = bb.getInt()
          val subtype = bb.get() & 0xff
          val payload = new Array[Byte](len)
          bb.get(payload)
          BBinary(subtype, payload)
        case 0x07 =>
          val oid = new Array[Byte](12)
          bb.get(oid)
          BObjectId(oid.map(b => f"${b & 0xff}%02x").mkString)
        case 0x08 => BBool(bb.get() != 0)
        case 0x09 => BDateTime(bb.getLong())
        case 0x0A => BNull
        case 0x0B => BRegex(cstring(), cstring())
        case 0x10 => BInt32(bb.getInt())
        case 0x11 =>
          val raw = bb.getLong()
          BTimestamp(raw >>> 32, raw & 0xFFFFFFFFL)
        case 0x12 => BInt64(bb.getLong())
        case 0x13 =>
          val low = bb.getLong(); val high = bb.getLong()
          BDecimal128(Decimal128.decode(high, low))
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
        case '{' => fromExtended(parseObject())
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

  /** A single-field `$`-wrapper object is an Extended JSON value — the
    * typed BVal it denotes. Anything else (including `$`-prefixed
    * OPERATOR documents like `{"$match": …}`, which have non-wrapper
    * shapes or extra fields) stays a plain document. Wire decode
    * ([[decode]]) never interprets wrappers — only the JSON bridge does.
    */
  private def fromExtended(doc: BDoc): BVal = doc.fields match {
    case Seq(("$oid", BStr(h))) if h.length == 24 &&
        h.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')) =>
      BObjectId(h)
    case Seq(("$date", BDoc(Seq(("$numberLong", BStr(ms)))))) =>
      BDateTime(ms.toLong)
    case Seq(("$date", BInt64(ms))) => BDateTime(ms) // relaxed legacy form
    case Seq(("$date", BInt32(ms))) => BDateTime(ms.toLong)
    case Seq(("$timestamp", d: BDoc)) if d.fields.length == 2 =>
      (d.get("t"), d.get("i")) match {
        case (Some(BInt64(t)), Some(BInt64(i))) => BTimestamp(t, i)
        case (Some(BInt32(t)), Some(BInt32(i))) =>
          BTimestamp(t.toLong, i.toLong)
        case _ => doc
      }
    case Seq(("$binary", d: BDoc)) if d.fields.length == 2 =>
      (d.get("base64"), d.get("subType")) match {
        case (Some(BStr(b64)), Some(BStr(st))) =>
          BBinary(Integer.parseInt(st, 16),
            java.util.Base64.getDecoder.decode(b64))
        case _ => doc
      }
    case Seq(("$numberDecimal", BStr(s))) =>
      BDecimal128(new java.math.BigDecimal(s))
    case Seq(("$regularExpression", d: BDoc)) if d.fields.length == 2 =>
      (d.get("pattern"), d.get("options")) match {
        case (Some(BStr(p)), Some(BStr(o))) => BRegex(p, o)
        case _ => doc
      }
    // canonical scalar wrappers (the reference's ExtendedJson render of
    // plain numbers) — relaxed on re-render, documented asymmetry
    case Seq(("$numberLong", BStr(s)))   => BInt64(s.toLong)
    case Seq(("$numberInt", BStr(s)))    => BInt32(s.toInt)
    case Seq(("$numberDouble", BStr(s))) => BDouble(s.toDouble)
    case _ => doc
  }

  /** Render a BSON tree as compact JSON. Int64/int32 render as plain
    * integers, doubles via `Double.toString` — the inverse of
    * [[parseJson]]'s number typing, so parse-then-render is identity
    * on the fixture corpus (spec-pinned). The non-JSON-native types
    * render as canonical Extended JSON wrappers (inverse of
    * [[fromExtended]]).
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
    case BObjectId(hex) => s"""{"$$oid":"$hex"}"""
    case BDateTime(ms) => s"""{"$$date":{"$$numberLong":"$ms"}}"""
    case BBinary(subtype, bytes) =>
      s"""{"$$binary":{"base64":"${
        java.util.Base64.getEncoder.encodeToString(bytes)
      }","subType":"${f"$subtype%02x"}"}}"""
    case BTimestamp(t, i) => s"""{"$$timestamp":{"t":$t,"i":$i}}"""
    case BDecimal128(v) => s"""{"$$numberDecimal":"${v.toString}"}"""
    case BRegex(pattern, options) =>
      s"""{"$$regularExpression":{"pattern":"${escapeJson(pattern)}",""" +
        s""""options":"${escapeJson(options)}"}}"""
  }

  /** IEEE 754-2008 decimal128, BID (binary integer decimal) encoding —
    * the layout MongoDB uses on the wire (the published decimal128
    * spec in the MongoDB specifications repo). Finite canonical values
    * only: sign bit 127, 14-bit biased exponent at bits 126-113 (bias
    * 6176), 113-bit coefficient at bits 112-0 (≤ 34 decimal digits, so
    * the `11` combination-extension form is never produced; on decode
    * that form — and NaN/Inf — is rejected rather than mis-read).
    */
  private[graft] object Decimal128 {
    private val Bias = 6176
    private val MaxCoefficient = java.math.BigInteger.TEN.pow(34)

    /** (high64, low64) of the BID encoding. */
    def encode(v: java.math.BigDecimal): (Long, Long) = {
      var coeff = v.unscaledValue()
      val neg = coeff.signum() < 0
      if (neg) coeff = coeff.negate()
      val exp = -v.scale()
      require(coeff.compareTo(MaxCoefficient) < 0,
        s"decimal128 coefficient exceeds 34 digits: $v")
      require(exp >= -Bias && exp <= 6111,
        s"decimal128 exponent out of range [-6176, 6111]: $v")
      val low = coeff.longValue() // low 64 bits
      val coeffHigh = coeff.shiftRight(64).longValue() // ≤ 49 bits
      var high = coeffHigh | ((exp + Bias).toLong << 49)
      if (neg) high |= 0x8000000000000000L
      (high, low)
    }

    def decode(high: Long, low: Long): java.math.BigDecimal = {
      // combination MSBs `11` = special (NaN/Inf) or the large-coefficient
      // extension, which canonical values never use (MongoDB reads the
      // extension form as zero; a codec for fixtures fails loudly instead)
      require(((high >>> 61) & 3L) != 3L,
        "non-finite or non-canonical decimal128 (NaN/Inf/extension form)")
      val exp = ((high >>> 49) & 0x3FFF).toInt - Bias
      val coeffHigh = high & 0x0001FFFFFFFFFFFFL
      val coeff = java.math.BigInteger.valueOf(coeffHigh).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(low)))
      val signed = if ((high & 0x8000000000000000L) != 0) coeff.negate() else coeff
      new java.math.BigDecimal(signed, -exp)
    }
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
