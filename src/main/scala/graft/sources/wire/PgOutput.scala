package graft.sources.wire

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Binary decoder for the PostgreSQL `pgoutput` logical-replication
  * protocol — the byte-level message grammar of `CREATE SUBSCRIPTION`'s
  * default plugin, as published in the PostgreSQL docs
  * ("Logical Streaming Replication Protocol", protocol §55.5) and parsed
  * by the reference connector (reference
  * `debezium-connector-postgres/src/main/java/io/debezium/connector/postgresql/connection/pgoutput/PgOutputMessageDecoder.java:1-828`).
  *
  * This is the step from "transport contract" to "connector": the DSv2
  * change-log source can tail segments of RECORDED pgoutput frames and
  * turn them into envelope rows with no JDBC connection — zero egress,
  * fixture-driven. All integers are network byte order; strings are
  * NUL-terminated; tuple column values are 'n' (null), 'u' (unchanged
  * TOAST), 't' (text format: int32 length + bytes) or 'b' (binary).
  *
  * Message layout (first byte = discriminator):
  *   - 'B' Begin:    finalLsn(8) commitTs(8, µs since 2000-01-01) xid(4)
  *   - 'C' Commit:   flags(1) commitLsn(8) endLsn(8) commitTs(8)
  *   - 'O' Origin:   originLsn(8) name(cstr)
  *   - 'R' Relation: relId(4) namespace(cstr) name(cstr) replIdent(1)
  *                   nCols(2) [flags(1) name(cstr) typeOid(4) typeMod(4)]*
  *   - 'Y' Type:     typeOid(4) namespace(cstr) name(cstr)
  *   - 'I' Insert:   relId(4) 'N' tuple
  *   - 'U' Update:   relId(4) [('K'|'O') tuple] 'N' tuple
  *   - 'D' Delete:   relId(4) ('K'|'O') tuple
  *   - 'T' Truncate: nRel(4) flags(1) relId(4)*
  *   - 'M' Message:  flags(1) lsn(8) prefix(cstr) len(4) content
  *   - tuple:        nCols(2) then per-column tag + value as above
  */
object PgOutput {

  sealed trait Value
  case object VNull extends Value
  case object VUnchangedToast extends Value
  final case class VText(s: String) extends Value
  final case class VBinary(bytes: Array[Byte]) extends Value

  final case class Column(flags: Int, name: String, typeOid: Int, typeMod: Int) {
    def isKey: Boolean = (flags & 1) != 0
  }

  sealed trait Message
  final case class Begin(finalLsn: Long, commitTsMicros: Long, xid: Long) extends Message
  final case class Commit(flags: Int, commitLsn: Long, endLsn: Long,
                          commitTsMicros: Long) extends Message
  final case class Origin(originLsn: Long, name: String) extends Message
  final case class Relation(relId: Int, namespace: String, name: String,
                            replicaIdentity: Char, columns: Seq[Column]) extends Message
  final case class TypeMsg(typeOid: Int, namespace: String, name: String) extends Message
  final case class Insert(relId: Int, newTuple: Seq[Value]) extends Message
  final case class Update(relId: Int, oldTag: Option[Char],
                          oldTuple: Option[Seq[Value]], newTuple: Seq[Value]) extends Message
  final case class Delete(relId: Int, oldTag: Char, oldTuple: Seq[Value]) extends Message
  final case class Truncate(flags: Int, relIds: Seq[Int]) extends Message
  final case class LogicalMessage(flags: Int, lsn: Long, prefix: String,
                                  content: Array[Byte]) extends Message

  // Protocol v2 (PostgreSQL 14+) streamed in-progress transactions: large
  // txs stream BEFORE commit as S..E chunks, interleaved across xids;
  // every in-stream data message carries its xid after the tag. 'c'
  // (StreamCommit) releases a streamed tx, 'A' (StreamAbort) discards it
  // — the exact shape TxReassembly's buffered release consumes.
  final case class StreamStart(xid: Long, firstSegment: Boolean) extends Message
  case object StreamStop extends Message
  final case class StreamCommit(xid: Long, flags: Int, commitLsn: Long,
                                endLsn: Long, commitTsMicros: Long) extends Message
  final case class StreamAbort(xid: Long, subXid: Long) extends Message
  /** An in-stream data message with the xid it belongs to. */
  final case class Streamed(xid: Long, inner: Message) extends Message

  /** Debezium surfaces unchanged-TOAST columns as a sentinel value the
    * downstream must re-select (ref `UnchangedToastedReplicationMessageColumn`).
    */
  val UnchangedToastSentinel = "__graft_unchanged_toast__"

  // ---------------------------------------------------------------- decode

  private def cstr(b: ByteBuffer): String = {
    // collect raw bytes to the NUL, then decode as UTF-8 — per-byte
    // toChar garbles any multi-byte identifier (e.g. a table named café)
    val bytes = new java.io.ByteArrayOutputStream()
    var c = b.get()
    while (c != 0) { bytes.write(c.toInt); c = b.get() }
    new String(bytes.toByteArray, StandardCharsets.UTF_8)
  }

  private def tuple(b: ByteBuffer): Seq[Value] = {
    val n = b.getShort().toInt
    (0 until n).map { _ =>
      b.get().toChar match {
        case 'n' => VNull
        case 'u' => VUnchangedToast
        case 't' =>
          val len = b.getInt()
          val bytes = new Array[Byte](len)
          b.get(bytes)
          VText(new String(bytes, StandardCharsets.UTF_8))
        case 'b' =>
          val len = b.getInt()
          val bytes = new Array[Byte](len)
          b.get(bytes)
          VBinary(bytes)
        case other =>
          throw new IllegalArgumentException(s"bad tuple column tag '$other'")
      }
    }
  }

  private def uint32(b: ByteBuffer): Long = b.getInt().toLong & 0xffffffffL

  /** Decode one pgoutput message (the payload of an XLogData frame).
    * `inStream` = the segment cursor is between StreamStart and
    * StreamStop, where protocol v2 prefixes every data message with its
    * xid (streamed txs interleave, so each chunk must self-identify).
    */
  def decode(payload: Array[Byte], inStream: Boolean = false): Message = {
    val b = ByteBuffer.wrap(payload) // network order = ByteBuffer default
    val tag = b.get().toChar
    tag match {
      case 'S' => return StreamStart(uint32(b), b.get() == 1)
      case 'E' => return StreamStop
      case 'c' => return StreamCommit(uint32(b), b.get().toInt, b.getLong(),
        b.getLong(), b.getLong())
      case 'A' => return StreamAbort(uint32(b), uint32(b))
      case _ => ()
    }
    if (inStream) {
      val xid = uint32(b)
      return Streamed(xid, decodeBody(tag, b))
    }
    decodeBody(tag, b)
  }

  private def decodeBody(tag: Char, b: ByteBuffer): Message = {
    tag match {
      case 'B' => Begin(b.getLong(), b.getLong(), b.getInt().toLong & 0xffffffffL)
      case 'C' => Commit(b.get().toInt, b.getLong(), b.getLong(), b.getLong())
      case 'O' => Origin(b.getLong(), cstr(b))
      case 'R' =>
        val relId = b.getInt()
        val ns = cstr(b); val name = cstr(b)
        val ident = b.get().toChar
        val nCols = b.getShort().toInt
        val cols = (0 until nCols).map { _ =>
          Column(b.get().toInt, cstr(b), b.getInt(), b.getInt())
        }
        Relation(relId, ns, name, ident, cols)
      case 'Y' => TypeMsg(b.getInt(), cstr(b), cstr(b))
      case 'I' =>
        val relId = b.getInt()
        val tag = b.get().toChar
        require(tag == 'N', s"insert tuple tag '$tag' != 'N'")
        Insert(relId, tuple(b))
      case 'U' =>
        val relId = b.getInt()
        b.get().toChar match {
          case t @ ('K' | 'O') =>
            val old = tuple(b)
            val n = b.get().toChar
            require(n == 'N', s"update new-tuple tag '$n' != 'N'")
            Update(relId, Some(t), Some(old), tuple(b))
          case 'N' => Update(relId, None, None, tuple(b))
          case other =>
            throw new IllegalArgumentException(s"bad update tag '$other'")
        }
      case 'D' =>
        val relId = b.getInt()
        val t = b.get().toChar
        require(t == 'K' || t == 'O', s"bad delete tag '$t'")
        Delete(relId, t, tuple(b))
      case 'T' =>
        val n = b.getInt()
        val flags = b.get().toInt
        Truncate(flags, (0 until n).map(_ => b.getInt()))
      case 'M' =>
        val flags = b.get().toInt
        val lsn = b.getLong()
        val prefix = cstr(b)
        val len = b.getInt()
        val content = new Array[Byte](len)
        b.get(content)
        LogicalMessage(flags, lsn, prefix, content)
      case other =>
        throw new IllegalArgumentException(s"unknown pgoutput message '$other'")
    }
  }

  // ---------------------------------------------------------------- encode
  // Byte-exact inverse, used to author recorded fixtures and to round-trip
  // the decoder in specs. NOT part of a server: test/fixture surface only.

  private def out(size: Int = 64) = ByteBuffer.allocate(size)
  private def bytesOf(bb: ByteBuffer): Array[Byte] = {
    val a = new Array[Byte](bb.position()); bb.flip(); bb.get(a); a
  }
  /** UTF-8 byte length (buffers must be sized in bytes, not chars). */
  private def utf8Len(s: String): Int =
    s.getBytes(StandardCharsets.UTF_8).length
  /** Wire size of a tuple: count word + per-column tag (+ length word
    * and body for text/binary values).
    */
  private def tupleLen(vs: Seq[Value]): Int =
    2 + vs.map {
      case VNull | VUnchangedToast => 1
      case VText(s) => 5 + utf8Len(s)
      case VBinary(b) => 5 + b.length
    }.sum
  private def putCstr(bb: ByteBuffer, s: String): Unit = {
    bb.put(s.getBytes(StandardCharsets.UTF_8)); bb.put(0.toByte)
  }
  private def putTuple(bb: ByteBuffer, vs: Seq[Value]): Unit = {
    bb.putShort(vs.size.toShort)
    vs.foreach {
      case VNull => bb.put('n'.toByte)
      case VUnchangedToast => bb.put('u'.toByte)
      case VText(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        bb.put('t'.toByte); bb.putInt(b.length); bb.put(b)
      case VBinary(b) =>
        bb.put('b'.toByte); bb.putInt(b.length); bb.put(b)
    }
  }

  def encode(m: Message): Array[Byte] = m match {
    case Begin(lsn, ts, xid) =>
      val b = out(); b.put('B'.toByte); b.putLong(lsn); b.putLong(ts)
      b.putInt(xid.toInt); bytesOf(b)
    case Commit(flags, clsn, elsn, ts) =>
      val b = out(); b.put('C'.toByte); b.put(flags.toByte); b.putLong(clsn)
      b.putLong(elsn); b.putLong(ts); bytesOf(b)
    case Origin(lsn, name) =>
      val b = out(utf8Len(name) + 16); b.put('O'.toByte); b.putLong(lsn)
      putCstr(b, name); bytesOf(b)
    case Relation(relId, ns, name, ident, cols) =>
      val b = out(16 + utf8Len(ns) + utf8Len(name) +
        cols.map(c => 12 + utf8Len(c.name)).sum)
      b.put('R'.toByte); b.putInt(relId)
      putCstr(b, ns); putCstr(b, name); b.put(ident.toByte)
      b.putShort(cols.size.toShort)
      cols.foreach { c =>
        b.put(c.flags.toByte); putCstr(b, c.name)
        b.putInt(c.typeOid); b.putInt(c.typeMod)
      }
      bytesOf(b)
    case TypeMsg(oid, ns, name) =>
      val b = out(utf8Len(ns) + utf8Len(name) + 16); b.put('Y'.toByte)
      b.putInt(oid); putCstr(b, ns); putCstr(b, name); bytesOf(b)
    case Insert(relId, nt) =>
      val b = out(8 + tupleLen(nt)); b.put('I'.toByte); b.putInt(relId)
      b.put('N'.toByte); putTuple(b, nt); bytesOf(b)
    case Update(relId, oldTag, oldTuple, nt) =>
      val b = out(8 + oldTuple.map(tupleLen).getOrElse(0) + 2 + tupleLen(nt))
      b.put('U'.toByte); b.putInt(relId)
      (oldTag, oldTuple) match {
        case (Some(t), Some(ot)) => b.put(t.toByte); putTuple(b, ot)
        case _ => ()
      }
      b.put('N'.toByte); putTuple(b, nt); bytesOf(b)
    case Delete(relId, tag, ot) =>
      val b = out(8 + tupleLen(ot)); b.put('D'.toByte); b.putInt(relId)
      b.put(tag.toByte); putTuple(b, ot); bytesOf(b)
    case Truncate(flags, relIds) =>
      val b = out(16 + 4 * relIds.size); b.put('T'.toByte)
      b.putInt(relIds.size); b.put(flags.toByte)
      relIds.foreach(b.putInt); bytesOf(b)
    case LogicalMessage(flags, lsn, prefix, content) =>
      val b = out(utf8Len(prefix) + content.length + 32); b.put('M'.toByte)
      b.put(flags.toByte); b.putLong(lsn); putCstr(b, prefix)
      b.putInt(content.length); b.put(content); bytesOf(b)
    case StreamStart(xid, first) =>
      val b = out(); b.put('S'.toByte); b.putInt(xid.toInt)
      b.put(if (first) 1.toByte else 0.toByte); bytesOf(b)
    case StreamStop =>
      Array('E'.toByte)
    case StreamCommit(xid, flags, clsn, elsn, ts) =>
      val b = out(); b.put('c'.toByte); b.putInt(xid.toInt)
      b.put(flags.toByte); b.putLong(clsn); b.putLong(elsn); b.putLong(ts)
      bytesOf(b)
    case StreamAbort(xid, subXid) =>
      val b = out(); b.put('A'.toByte); b.putInt(xid.toInt)
      b.putInt(subXid.toInt); bytesOf(b)
    case Streamed(xid, inner) =>
      // v2 in-stream framing: tag, xid, then the regular message body
      val e = encode(inner)
      val b = out(e.length + 8)
      b.put(e(0)); b.putInt(xid.toInt); b.put(e, 1, e.length - 1)
      bytesOf(b)
  }

  // ------------------------------------------------------------- segments
  // Recorded-frame container: what a replication client would persist from
  // the stream of XLogData envelopes. `MAGIC`, then per frame:
  //   walStart(8) payloadLen(4) payload — walStart is the frame's WAL
  // position (the XLogData `dataStart`), which becomes envelope `pos`.

  val Magic: Array[Byte] = "PGOSEG01".getBytes(StandardCharsets.US_ASCII)

  def writeSegment(frames: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(Magic)
    frames.foreach { case (wal, payload) =>
      val h = ByteBuffer.allocate(12).putLong(wal).putInt(payload.length)
      o.write(h.array()); o.write(payload)
    }
    o.toByteArray
  }

  /** Raw container split: (wal, payload) frames without decoding — the
    * replication client/server round-trip reframes these over the
    * socket and the result must reassemble byte-identically.
    */
  def readSegmentFrames(bytes: Array[Byte]): Iterator[(Long, Array[Byte])] = {
    val b = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](Magic.length)
    b.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      "not a pgoutput segment (bad magic)")
    new Iterator[(Long, Array[Byte])] {
      def hasNext: Boolean = b.remaining() >= 12
      def next(): (Long, Array[Byte]) = {
        val wal = b.getLong(); val len = b.getInt()
        val payload = new Array[Byte](len)
        b.get(payload)
        (wal, payload)
      }
    }
  }

  def readSegment(bytes: Array[Byte]): Iterator[(Long, Message)] = {
    val b = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](Magic.length)
    b.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      "not a pgoutput segment (bad magic)")
    new Iterator[(Long, Message)] {
      private var inStream = false
      def hasNext: Boolean = b.remaining() >= 12
      def next(): (Long, Message) = {
        val wal = b.getLong(); val len = b.getInt()
        val payload = new Array[Byte](len)
        b.get(payload)
        val m = decode(payload, inStream)
        m match {
          case _: StreamStart => inStream = true
          case StreamStop => inStream = false
          case _ => ()
        }
        (wal, m)
      }
    }
  }

  // ------------------------------------------------- wire-row projection

  /** JSON text for one column value, typed by the relation's type OID
    * (text-format tuple values carry PostgreSQL's canonical text
    * representation; numeric/bool OIDs embed unquoted).
    */
  // array type OID → element OID (the common relational element types)
  private val ArrayElemOid = Map(
    1000 -> 16, 1005 -> 21, 1007 -> 23, 1016 -> 20, 1021 -> 700,
    1022 -> 701, 1009 -> 25, 1231 -> 1700)

  private def jsonValue(v: Value, typeOid: Int): String = v match {
    case VNull => "null"
    case VUnchangedToast => "\"" + UnchangedToastSentinel + "\""
    case VBinary(b) => binaryJson(b, typeOid)
    case VText(s) => typeOid match {
      case 16 => if (s == "t") "true" else "false"
      case 20 | 21 | 23 | 26 => s
      case 700 | 701 | 1700 => numericJson(s)
      case 17 if s.startsWith("\\x") => // bytea hex text rep → base64
        "\"" + java.util.Base64.getEncoder.encodeToString(
          s.drop(2).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray) + "\""
      case oid if ArrayElemOid.contains(oid) =>
        arrayJson(s, ArrayElemOid(oid))
      case _ => jsonString(s)
    }
  }

  /** PostgreSQL array text form → JSON array: `{1,2,3}` /
    * `{a,"q\"x",NULL}` — elements split on top-level commas, double
    * quotes unwrap with `\"`/`\\` escapes, bare NULL is SQL null, nested
    * `{…}` recurse (multi-dimensional arrays).
    */
  private def arrayJson(s: String, elemOid: Int): String = {
    require(s.startsWith("{") && s.endsWith("}"), s"bad array text: $s")
    val body = s.substring(1, s.length - 1)
    if (body.isEmpty) return "[]"
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0; var inQ = false; var esc = false
    body.foreach { c =>
      if (esc) { cur += c; esc = false }
      else c match {
        case '\\' if inQ => cur += c; esc = true
        case '"' => cur += c; inQ = !inQ
        case '{' if !inQ => depth += 1; cur += c
        case '}' if !inQ => depth -= 1; cur += c
        case ',' if !inQ && depth == 0 => parts += cur.result(); cur.clear()
        case _ => cur += c
      }
    }
    parts += cur.result()
    parts.map { raw =>
      if (raw.startsWith("{")) arrayJson(raw, elemOid)
      else if (raw == "NULL") "null"
      else if (raw.startsWith("\"")) {
        val unq = raw.substring(1, raw.length - 1)
          .replace("\\\"", "\"").replace("\\\\", "\\")
        jsonValue(VText(unq), elemOid)
      } else jsonValue(VText(raw), elemOid)
    }.mkString("[", ",", "]")
  }

  // ------------------------------------------- binary-format columns
  // PG 14+ subscriptions can request `binary = true`; tuple columns then
  // arrive as the type's `send()` wire bytes (tag 'b') instead of text.
  // All scalars are network byte order.

  /** PG epochs: `date` is days and `timestamp[tz]` micros since
    * 2000-01-01 (not the Unix epoch).
    */
  private val PgEpochDate = java.time.LocalDate.of(2000, 1, 1)
  private val PgEpochMicros =
    java.time.LocalDateTime.of(2000, 1, 1, 0, 0)
  // immutable + thread-safe; per-cell ofPattern would re-parse the
  // pattern on the decode hot path
  private val PgTimestampFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** `numeric` wire format → decimal text: u16 ndigits, i16 weight (in
    * base-10000 groups), u16 sign (0x4000 = negative, 0xC000 = NaN),
    * u16 dscale, then ndigits base-10000 groups, most significant first.
    */
  def numericBinaryToString(bytes: Array[Byte]): String = {
    val b = ByteBuffer.wrap(bytes)
    val nd = b.getShort().toInt & 0xffff
    val weight = b.getShort().toInt
    val sign = b.getShort().toInt & 0xffff
    val dscale = b.getShort().toInt & 0xffff
    val digits = Array.fill(nd)(b.getShort().toInt & 0xffff)
    if (sign == 0xC000) return "NaN"
    val sb = new StringBuilder
    if (sign == 0x4000) sb += '-'
    if (weight < 0) sb += '0'
    else (0 to weight).foreach { i =>
      val d = if (i < nd) digits(i) else 0
      if (i == 0) sb.append(d.toString) else sb.append(f"$d%04d")
    }
    if (dscale > 0) {
      sb += '.'
      val frac = new StringBuilder
      var i = weight + 1
      while (frac.length < dscale) {
        frac.append(f"${if (i >= 0 && i < nd) digits(i) else 0}%04d")
        i += 1
      }
      sb.append(frac.substring(0, dscale))
    }
    sb.result()
  }

  /** Decimal text → `numeric` wire bytes (fixture builder, the inverse
    * of [[numericBinaryToString]]).
    */
  def numericStringToBinary(s: String): Array[Byte] = {
    val neg = s.startsWith("-")
    val t = if (neg) s.substring(1) else s
    val dot = t.indexOf('.')
    val intPart = if (dot < 0) t else t.substring(0, dot)
    val fracPart = if (dot < 0) "" else t.substring(dot + 1)
    val dscale = fracPart.length
    // group into base-10000 digits aligned on the decimal point
    val intPad = intPart.reverse.padTo(((intPart.length + 3) / 4) * 4, '0')
      .reverse.grouped(4).map(_.toInt).toVector
    val fracPad = fracPart.padTo(((fracPart.length + 3) / 4) * 4, '0')
      .grouped(4).map(_.toInt).toVector
    var digits = intPad ++ fracPad
    var weight = intPad.length - 1
    while (digits.headOption.contains(0) && digits.length > 1) {
      digits = digits.tail; weight -= 1
    }
    while (digits.lastOption.contains(0) && digits.length > 1) {
      digits = digits.dropRight(1)
    }
    if (digits == Vector(0)) { digits = Vector.empty; weight = 0 }
    val b = ByteBuffer.allocate(8 + digits.length * 2)
    b.putShort(digits.length.toShort); b.putShort(weight.toShort)
    b.putShort((if (neg) 0x4000 else 0).toShort); b.putShort(dscale.toShort)
    digits.foreach(d => b.putShort(d.toShort))
    b.array()
  }

  /** One binary-format column value → JSON literal, per the column's
    * type OID from the Relation message; unknown OIDs stay base64 (the
    * previous behavior, and the right fallback for custom types).
    */
  private def binaryJson(bytes: Array[Byte], typeOid: Int): String = {
    val b = ByteBuffer.wrap(bytes)
    typeOid match {
      case 16 => if (bytes(0) == 1) "true" else "false"
      case 21 => b.getShort().toString
      case 23 => b.getInt().toString
      case 20 => b.getLong().toString
      case 26 => uint32(b).toString
      case 700 => numericJson(pgFloatText(
        java.lang.Float.intBitsToFloat(b.getInt()).toDouble, 6,
        float4 = true))
      case 701 => numericJson(pgFloatText(
        java.lang.Double.longBitsToDouble(b.getLong()), 15,
        float4 = false))
      case 1700 => numericJson(numericBinaryToString(bytes))
      case 25 | 1043 | 18 | 19 =>
        jsonString(new String(bytes, StandardCharsets.UTF_8))
      case 1082 =>
        jsonString(PgEpochDate.plusDays(b.getInt().toLong).toString)
      case 1114 | 1184 =>
        val micros = b.getLong()
        val dt = PgEpochMicros.plus(micros, java.time.temporal.ChronoUnit.MICROS)
        jsonString(dt.format(PgTimestampFmt))
      case 2950 =>
        jsonString(new java.util.UUID(b.getLong(), b.getLong()).toString)
      case _ =>
        "\"" + java.util.Base64.getEncoder.encodeToString(bytes) + "\""
    }
  }

  private def jsonString(s: String): String = JsonText.jsonString(s)

  /** Float/numeric text → JSON literal: finite values pass through
    * bare; PostgreSQL's legal non-finite spellings (NaN, [-]Infinity)
    * must be quoted — bare they are not JSON.
    */
  private def numericJson(s: String): String = s match {
    case "NaN" | "Infinity" | "-Infinity" => jsonString(s)
    case _ => s
  }

  /** Render a float in PostgreSQL's text form (PG ≥ 12 shortest-
    * round-trip Ryu output, `float8out`/`float4out`): the FEWEST
    * significant digits that parse back to the exact value (correctly
    * rounded — Java 17's `toString` is unique but not always minimal,
    * JDK-4511638), plain decimal while the leading digit's decimal
    * exponent is in [-4, maxPlainExp) — 15 for float8, 6 for float4 —
    * else `d.ddde±XX` with a two-digit-minimum signed exponent. Without
    * this, binary-mode and text-mode decodes of the same column can
    * spell the same number differently.
    */
  private[graft] def pgFloatText(value: Double, maxPlainExp: Int,
                                 float4: Boolean): String = {
    if (value.isNaN) return "NaN"
    if (value.isInfinite) return if (value > 0) "Infinity" else "-Infinity"
    if (value == 0.0)
      return if (java.lang.Double.doubleToRawLongBits(value) != 0L) "-0"
      else "0"
    val neg = value < 0
    val abs = math.abs(value)
    // shortest digits: round the exact binary value to n significant
    // digits (half-even = nearest) for growing n until it round-trips
    val exact = new java.math.BigDecimal(abs)
    var nd = 1
    var r = exact.round(new java.math.MathContext(nd,
      java.math.RoundingMode.HALF_EVEN))
    while ((if (float4) r.floatValue() != abs.toFloat
            else r.doubleValue() != abs) && nd < 17) {
      nd += 1
      r = exact.round(new java.math.MathContext(nd,
        java.math.RoundingMode.HALF_EVEN))
    }
    val stripped = r.stripTrailingZeros
    val sig = stripped.unscaledValue.toString
    // decimal exponent of the leading significant digit
    val exp = sig.length - 1 - stripped.scale
    val sb = new StringBuilder(if (neg) "-" else "")
    if (exp >= -4 && exp < maxPlainExp) {
      if (exp >= 0) {
        val intLen = exp + 1
        if (sig.length <= intLen) {
          sb ++= sig
          (sig.length until intLen).foreach(_ => sb += '0')
        } else {
          sb ++= sig.substring(0, intLen) += '.' ++= sig.substring(intLen)
        }
      } else {
        sb ++= "0."
        (0 until (-exp - 1)).foreach(_ => sb += '0')
        sb ++= sig
      }
    } else {
      sb ++= sig.substring(0, 1)
      if (sig.length > 1) { sb += '.' ++= sig.substring(1) }
      sb += 'e' += (if (exp < 0) '-' else '+')
      val ae = math.abs(exp)
      if (ae < 10) sb += '0'
      sb ++= ae.toString
    }
    sb.toString
  }

  private def jsonObject(cols: Seq[Column], vs: Seq[Value]): String =
    cols.zip(vs).map { case (c, v) =>
      s"${jsonString(c.name)}:${jsonValue(v, c.typeOid)}"
    }.mkString("{", ",", "}")

  /** Envelope wire row: (table, op, pos, key_json, payload_json) — the
    * ChangeLogSource record schema, so a decoded segment drops straight
    * into the DSv2 pipeline.
    */
  final case class WireRow(table: String, op: String, pos: Long,
                           keyJson: String, payloadJson: String)

  private def dataRows(msg: Message, wal: Long,
                       relations: scala.collection.mutable.Map[Int, Relation]): Seq[WireRow] = {
    def rel(id: Int): Relation = relations.getOrElse(id,
      throw new IllegalStateException(
        s"data message for unknown relation $id (segment not self-contained)"))
    def keyOf(r: Relation, vs: Seq[Value]): String = {
      val kc = r.columns.zip(vs).filter(_._1.isKey)
      jsonObject(kc.map(_._1), kc.map(_._2))
    }
    msg match {
      case Insert(id, nt) =>
        val r = rel(id)
        Seq(WireRow(s"${r.namespace}.${r.name}", "c", wal,
          keyOf(r, nt), jsonObject(r.columns, nt)))
      case Update(id, _, _, nt) =>
        val r = rel(id)
        Seq(WireRow(s"${r.namespace}.${r.name}", "u", wal,
          keyOf(r, nt), jsonObject(r.columns, nt)))
      case Delete(id, _, ot) =>
        val r = rel(id)
        Seq(WireRow(s"${r.namespace}.${r.name}", "d", wal,
          keyOf(r, ot), "null"))
      case Truncate(flags, relIds) =>
        // option bits: 1 = CASCADE, 2 = RESTART IDENTITY
        val opts = s"""{"cascade":${(flags & 1) != 0},""" +
          s""""restart_identity":${(flags & 2) != 0}}"""
        relIds.map { id =>
          val r = rel(id)
          WireRow(s"${r.namespace}.${r.name}", "t", wal, "null", opts)
        }
      case LogicalMessage(_, _, prefix, content) =>
        Seq(WireRow("", "m", wal, "null",
          s"""{"prefix":${jsonString(prefix)},"content":${
            jsonString(new String(content, StandardCharsets.UTF_8))}}"""))
      case _ => Nil
    }
  }

  /** Project a recorded segment to wire rows. Relation messages must
    * precede the data messages that reference them (pgoutput guarantees
    * this per connection; recorded segments are self-contained so each
    * Spark partition reader is independent — the distributed analog).
    * Begin/Commit/Origin/Type and stream-control frames carry no row;
    * key columns are the relation's flagged identity columns (REPLICA
    * IDENTITY). Streamed data messages contribute rows like plain ones
    * (tx attribution lives in `segmentTxEvents`).
    */
  def segmentRows(bytes: Array[Byte]): Iterator[WireRow] = {
    val relations = scala.collection.mutable.Map[Int, Relation]()
    readSegment(bytes).flatMap {
      case (_, r: Relation) => relations(r.relId) = r; Nil
      case (_, Streamed(_, r: Relation)) => relations(r.relId) = r; Nil
      case (wal, Streamed(_, inner)) => dataRows(inner, wal, relations)
      case (wal, msg) => dataRows(msg, wal, relations)
    }
  }

  /** Transaction-attributed projection: every data row is tagged with
    * the xid it belongs to — plain messages with the enclosing
    * Begin..Commit xid, streamed (v2) messages with their own embedded
    * xid — and commit boundaries surface as `op = "m"` marker rows at
    * the commit LSN (StreamCommit for streamed txs, Commit for plain
    * ones). A StreamAbort emits NOTHING: its buffered events simply
    * never see a marker, which is exactly the contract
    * `TxReassembly.reassemble` consumes (release on marker, abandoned
    * otherwise).
    */
  def segmentTxEvents(bytes: Array[Byte]): Iterator[(String, WireRow)] = {
    val relations = scala.collection.mutable.Map[Int, Relation]()
    var currentXid = -1L
    readSegment(bytes).flatMap {
      case (_, r: Relation) => relations(r.relId) = r; Nil
      case (_, Streamed(_, r: Relation)) => relations(r.relId) = r; Nil
      case (_, Begin(_, _, xid)) => currentXid = xid; Nil
      case (_, Commit(_, commitLsn, _, _)) =>
        Seq((s"tx$currentXid", WireRow("", "m", commitLsn, "null", "null")))
      case (_, StreamCommit(xid, _, commitLsn, _, _)) =>
        Seq((s"tx$xid", WireRow("", "m", commitLsn, "null", "null")))
      case (_, _: StreamAbort) => Nil
      case (wal, Streamed(xid, inner)) =>
        dataRows(inner, wal, relations).map((s"tx$xid", _))
      case (wal, msg) =>
        dataRows(msg, wal, relations).map((s"tx$currentXid", _))
    }
  }
}
