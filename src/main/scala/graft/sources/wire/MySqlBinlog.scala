package graft.sources.wire

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Binary decoder for MySQL binlog row events — the TABLE_MAP +
  * WRITE/UPDATE/DELETE_ROWS(v2) byte layouts published in the MySQL
  * internals manual ("Binary Log — Row Based Replication events") and
  * parsed by the reference connector's shaded binlog client (reference
  * `debezium-connector-binlog/.../event/RowDeserializers.java:1-698`,
  * `TableMapEventDataDeserializer`).
  *
  * Everything here is little-endian except where noted. A "segment" is a
  * binlog FILE: the 4-byte magic `0xfe 'b' 'i' 'n'` followed by events
  * back-to-back. Events are framed by the 19-byte v4 header:
  *   timestamp(4) type(1) serverId(4) eventSize(4) nextPos(4) flags(2)
  * `binlog_checksum` is handled per WL#2540: a FORMAT_DESCRIPTION event
  * declaring CRC32 switches the stream to checksummed framing — every
  * later event ends in a 4-byte CRC32 over its header+body, which the
  * decoder VERIFIES and strips before the body parse (a stream with no
  * FDE, or an FDE declaring NONE, consumes to the eventSize boundary).
  *
  * Event bodies handled:
  *   - TABLE_MAP (19):     tableId(6) flags(2) schemaLen(1) schema NUL
  *                         tableLen(1) table NUL colCount(lenenc)
  *                         colTypes(n) metaLen(lenenc) meta nullable((n+7)/8)
  *   - WRITE_ROWS_v2 (30), UPDATE_ROWS_v2 (31), DELETE_ROWS_v2 (32):
  *                         tableId(6) flags(2) extraLen(2, self-inclusive)
  *                         extra colCount(lenenc) present((n+7)/8)
  *                         [presentAfter((n+7)/8) for UPDATE]
  *                         rows*: nullBitmap((present+7)/8) + values
  *                         (UPDATE rows carry before- then after-image)
  *   - XID (16):           xid(8) — transaction commit marker
  *   - QUERY (2):          thread(4) exec(4) schemaLen(1) err(2)
  *                         statusLen(2) status schema NUL sql — DDL +
  *                         BEGIN carrier (drives schema evolution)
  *   - FORMAT_DESCRIPTION (15), ROTATE (4): skipped
  *
  * Column types (the common relational subset): LONG(3) = int32,
  * LONGLONG(8) = int64, VARCHAR(15) with 2-byte max-length metadata and a
  * 1- or 2-byte length prefix depending on that metadata.
  */
object MySqlBinlog {

  val Magic: Array[Byte] = Array(0xfe.toByte, 'b'.toByte, 'i'.toByte, 'n'.toByte)

  // event type codes
  val QUERY = 2; val ROTATE = 4; val XID = 16; val FORMAT_DESCRIPTION = 15
  val TABLE_MAP = 19
  val WRITE_ROWS_V2 = 30; val UPDATE_ROWS_V2 = 31; val DELETE_ROWS_V2 = 32
  // MariaDB-specific events (reference debezium-connector-mariadb;
  // MariaDB replication protocol docs): SQL annotation before row
  // events, per-transaction GTID, and the GTID_LIST state at rotate
  val MARIADB_ANNOTATE_ROWS = 160
  val MARIADB_GTID = 162
  val MARIADB_GTID_LIST = 163
  /** MariaDB GTID flags2: standalone event group (no terminating COMMIT). */
  val FL_STANDALONE = 1
  // MySQL-flavor GTID events (reference debezium-connector-mysql; MySQL
  // binlog event spec): GTID_LOG_EVENT opens each transaction with its
  // sid:gno, PREVIOUS_GTIDS_LOG_EVENT records the executed set at the
  // binlog head (the MySQL analog of MariaDB's GTID_LIST)
  val GTID_LOG = 33
  val ANONYMOUS_GTID_LOG = 34
  val PREVIOUS_GTIDS_LOG = 35
  /** MySQL's statement-text event (`binlog_rows_query_log_events=ON`,
    * surfaced by the reference's `include.query` — ref
    * `BinlogConnectorConfig.INCLUDE_SQL_QUERY`:466); the MySQL analog of
    * MariaDB's ANNOTATE_ROWS.
    */
  val ROWS_QUERY = 29
  /** MySQL 8.0.20 compressed transactions
    * (`binlog_transaction_compression=ON` — the whole transaction's
    * event stream zstd-compressed inside ONE event; ref
    * `BinlogStreamingChangeEventSource.handleTransactionPayload`:500,
    * `event/TransactionPayloadDeserializer.java`).
    */
  val TRANSACTION_PAYLOAD = 40
  /** TRANSACTION_PAYLOAD compression type codes (MySQL
    * libbinlogevents/include/compression/base.h).
    */
  val CompressZstd = 0
  val CompressNone = 255
  val PARTIAL_UPDATE_ROWS = 39 // mysql-8.0 binlog_row_value_options=PARTIAL_JSON

  // column type codes (MYSQL_TYPE_*)
  val TYPE_TINY = 1; val TYPE_SHORT = 2; val TYPE_LONG = 3
  val TYPE_FLOAT = 4; val TYPE_DOUBLE = 5; val TYPE_LONGLONG = 8
  val TYPE_INT24 = 9; val TYPE_DATE = 10; val TYPE_YEAR = 13
  val TYPE_VARCHAR = 15; val TYPE_BIT = 16; val TYPE_TIMESTAMP2 = 17
  val TYPE_DATETIME2 = 18; val TYPE_TIME2 = 19
  val TYPE_ENUM = 247; val TYPE_SET = 248; val TYPE_STRING = 254
  val TYPE_NEWDECIMAL = 246; val TYPE_JSON = 245; val TYPE_BLOB = 252
  val TYPE_GEOMETRY = 255

  /** TABLE_MAP optional-metadata field types (WL#4618,
    * libbinlogevents `Table_map_event::Optional_metadata_field_type`).
    * Only the fields the reference consumes are materialized
    * (signedness, column names, simple primary key); the rest are
    * length-skipped.
    */
  val META_SIGNEDNESS = 1
  val META_COLUMN_NAME = 4
  val META_SET_STR_VALUE = 5
  val META_ENUM_STR_VALUE = 6
  val META_SIMPLE_PRIMARY_KEY = 8

  /** Signedness bits cover NUMERIC columns only, in column order
    * (libbinlogevents `is_numeric_type`: TINY/SHORT/INT24/LONG/
    * LONGLONG/FLOAT/DOUBLE/NEWDECIMAL — YEAR is excluded).
    */
  def isNumericType(t: Int): Boolean = t match {
    case TYPE_TINY | TYPE_SHORT | TYPE_INT24 | TYPE_LONG | TYPE_LONGLONG |
         TYPE_FLOAT | TYPE_DOUBLE | TYPE_NEWDECIMAL => true
    case _ => false
  }

  /** `binlog_checksum` algorithm codes (WL#2540): every event after a
    * FORMAT_DESCRIPTION that declares CRC32 carries a trailing 4-byte
    * CRC32 (ISO-3309, java.util.zip) over the event's header+body.
    */
  val ChecksumNone = 0
  val ChecksumCrc32 = 1

  /** A decoded DATE/DATETIME2 value, kept symbolic (no timezone walk). */
  final case class Dt(year: Int, month: Int, day: Int,
                      hour: Int = -1, minute: Int = 0, second: Int = 0,
                      micros: Int = 0, fsp: Int = 0) {
    override def toString: String =
      if (hour < 0) f"$year%04d-$month%02d-$day%02d"
      else {
        val base = f"$year%04d-$month%02d-$day%02d $hour%02d:$minute%02d:$second%02d"
        if (fsp <= 0) base
        else base + "." + f"$micros%06d".take(fsp)
      }
  }

  /** Decoded NEWDECIMAL, exact digits (no float detour). */
  final case class Dec(text: String)

  /** Decoded TIME2 — MySQL TIME spans ±838:59:59, so it is a signed
    * duration, not a time-of-day. Rendered in MySQL's text form.
    */
  final case class Tm(neg: Boolean, hour: Int, minute: Int, second: Int,
                      micros: Int = 0, fsp: Int = 0) {
    override def toString: String = {
      val base = f"${if (neg) "-" else ""}%s$hour%02d:$minute%02d:$second%02d"
      if (fsp <= 0) base else base + "." + f"$micros%06d".take(fsp)
    }
  }

  /** Decoded ENUM ordinal (1-based; 0 is MySQL's invalid-value empty
    * member) / SET member bitmask, resolved to their string values in
    * `rowImage` when the TABLE_MAP carries WL#4618
    * ENUM_STR_VALUE/SET_STR_VALUE metadata (like the reference's
    * `EnumValueConverter`); without metadata the raw ordinal/mask
    * surfaces.
    */
  final case class EnumV(ordinal: Int)
  final case class SetV(mask: Long)

  /** GEOMETRY column value: MySQL stores a 4-byte LE SRID followed by
    * standard WKB (the reference converts exactly this layout into its
    * `{wkb, srid}` geometry struct — `spatial/MySqlGeometry`).
    */
  final case class Geom(srid: Int, wkb: Array[Byte])

  /** TABLE_MAP state. `names`/`unsigned`/`primaryKey` carry MySQL 8.0's
    * OPTIONAL metadata (WL#4618, `binlog_row_metadata=FULL` — ref the
    * connector's `TableMapEventMetadata`): empty means the server logged
    * MINIMAL metadata and the caller must supply names/keys externally
    * (the reference then resolves them from its schema history).
    * `unsigned` is per-COLUMN (already expanded from the wire's
    * numeric-columns-only bitmap).
    */
  final case class TableMap(tableId: Long, schema: String, table: String,
                            colTypes: Seq[Int], colMeta: Seq[Int],
                            names: Seq[String] = Nil,
                            unsigned: Seq[Boolean] = Nil,
                            primaryKey: Seq[Int] = Nil,
                            enumValues: Map[Int, Seq[String]] = Map.empty,
                            setValues: Map[Int, Seq[String]] = Map.empty) {
    def isUnsigned(i: Int): Boolean = unsigned.nonEmpty && unsigned(i)
  }

  /** TYPE_STRING's TABLE_MAP metadata packs the REAL type (CHAR=STRING,
    * ENUM, SET) and the max byte length into its 2 bytes; lengths > 255
    * steal two bits from the type byte (the upper-nibble trick in
    * `log_event.cc` / the connector's `deserializeString`). Returns
    * (realType, length).
    */
  def stringRealType(meta: Int): (Int, Int) =
    if (meta < 256) (TYPE_STRING, meta)
    else {
      val m0 = meta >> 8; val m1 = meta & 0xff
      if ((m0 & 0x30) != 0x30) (m0 | 0x30, m1 | (((m0 & 0x30) ^ 0x30) << 4))
      else (m0, m1)
    }

  final case class Row(cells: Seq[Option[Any]])

  sealed trait Event { def nextPos: Long }
  final case class TableMapEvent(nextPos: Long, map: TableMap) extends Event
  final case class RowsEvent(nextPos: Long, kind: Int, tableId: Long,
                             rows: Seq[Row], afterRows: Seq[Row]) extends Event
  final case class XidEvent(nextPos: Long, xid: Long) extends Event
  /** MariaDB GTID (domain-server-seq): opens an event group. */
  final case class MariaGtidEvent(nextPos: Long, domain: Long, server: Long,
                                  seqNo: Long, standalone: Boolean) extends Event {
    def gtid: String = s"$domain-$server-$seqNo"
  }
  /** MariaDB ANNOTATE_ROWS: the statement text for following row events. */
  final case class AnnotateRowsEvent(nextPos: Long, sql: String) extends Event
  /** MariaDB GTID_LIST: replication state at binlog rotation. */
  final case class MariaGtidListEvent(nextPos: Long,
                                      gtids: Seq[(Long, Long, Long)]) extends Event
  /** MySQL GTID (sid:gno): opens the next transaction; since 5.7 also
    * carries the logical-clock pair (last_committed, sequence_number)
    * that parallel appliers schedule by. `anonymous` marks
    * ANONYMOUS_GTID_LOG_EVENT groups (gtid_mode=OFF).
    */
  final case class MySqlGtidEvent(nextPos: Long, sid: String, gno: Long,
                                  lastCommitted: Long, seqNo: Long,
                                  anonymous: Boolean = false) extends Event {
    def gtid: String = if (anonymous) "" else s"$sid:$gno"
  }
  /** MySQL PREVIOUS_GTIDS: the executed GTID set at the binlog head
    * (intervals stored end-EXCLUSIVE on the wire, surfaced in the
    * canonical inclusive text form).
    */
  final case class PreviousGtidsEvent(nextPos: Long,
                                      set: GtidSet) extends Event
  /** MySQL ROWS_QUERY: the originating statement for following row
    * events (same role as MariaDB's ANNOTATE_ROWS).
    */
  final case class RowsQueryEvent(nextPos: Long, sql: String) extends Event

  /** QUERY event — the statement event that carries DDL (and the
    * row-format `BEGIN`). The reference replays exactly these into its
    * schema history and resolves later row events against the result
    * (`MySqlStreamingChangeEventSource` QUERY handling →
    * `relational/history/SchemaHistory`); `database` is the session
    * default schema that qualifies unqualified table names.
    */
  final case class QueryEvent(nextPos: Long, database: String,
                              sql: String) extends Event
  /** MySQL TRANSACTION_PAYLOAD: a whole transaction's event stream,
    * zstd-compressed (or stored raw) inside one event. `readSegment`
    * flattens the inner events in place, so downstream projections see
    * compressed and plain transactions identically.
    */
  final case class TransactionPayloadEvent(nextPos: Long, compression: Int,
                                           inner: Seq[Event]) extends Event
  final case class SkippedEvent(nextPos: Long, kind: Int) extends Event

  // ---------------------------------------------------------------- decode

  /** 16 raw SID bytes → canonical lowercase 8-4-4-4-12 UUID text (byte
    * order is positional, independent of the buffer's endianness).
    */
  private def uuidText(b: ByteBuffer): String = {
    val raw = new Array[Byte](16); b.get(raw)
    val hex = raw.map(x => f"${x & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  private def uuidBytes(sid: String): Array[Byte] =
    sid.replace("-", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def lenenc(b: ByteBuffer): Long = (b.get() & 0xff) match {
    case v if v < 0xfb => v
    case 0xfc => b.getShort() & 0xffff
    case 0xfd => (b.get() & 0xff) | ((b.get() & 0xff) << 8) | ((b.get() & 0xff) << 16)
    case 0xfe => b.getLong()
    case v => throw new IllegalArgumentException(s"bad length-encoded int 0x${v.toHexString}")
  }

  private def uint48(b: ByteBuffer): Long = {
    var v = 0L
    (0 until 6).foreach(i => v |= (b.get() & 0xffL) << (8 * i))
    v
  }

  private def bitmap(b: ByteBuffer, bits: Int): Array[Boolean] = {
    val bytes = new Array[Byte]((bits + 7) / 8)
    b.get(bytes)
    Array.tabulate(bits)(i => (bytes(i / 8) & (1 << (i % 8))) != 0)
  }

  // NEWDECIMAL packing (MySQL `decimal2bin`): digits in big-endian groups
  // of 9 per 4 bytes, partial leading/trailing groups in the minimum
  // byte count; first byte's sign bit XORed; negative values stored as
  // the bitwise NOT of the positive image (ref
  // `RowDeserializers.deserializeNewDecimal`).
  private val DigitBytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)

  private def decimalByteLen(precision: Int, scale: Int): Int = {
    val intDigits = precision - scale
    DigitBytes(intDigits % 9) + (intDigits / 9) * 4 +
      (scale / 9) * 4 + DigitBytes(scale % 9)
  }

  private def readGroup(bytes: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    (0 until n).foreach(i => v = (v << 8) | (bytes(off + i) & 0xffL))
    v
  }

  private def decodeDecimal(b: ByteBuffer, precision: Int, scale: Int): Dec = {
    val len = decimalByteLen(precision, scale)
    val raw = new Array[Byte](len)
    b.get(raw)
    val positive = (raw(0) & 0x80) != 0
    if (!positive) raw.indices.foreach(i => raw(i) = (~raw(i)).toByte)
    raw(0) = (raw(0) ^ 0x80).toByte
    val intDigits = precision - scale
    val sb = new StringBuilder
    var off = 0
    val leadDigits = intDigits % 9
    if (leadDigits > 0) {
      val n = DigitBytes(leadDigits)
      sb.append(readGroup(raw, off, n).toString.reverse.padTo(leadDigits, '0').reverse)
      off += n
    }
    (0 until intDigits / 9).foreach { _ =>
      sb.append(f"${readGroup(raw, off, 4)}%09d"); off += 4
    }
    val intText = {
      val t = sb.result().dropWhile(_ == '0')
      if (t.isEmpty) "0" else t
    }
    val fb = new StringBuilder
    (0 until scale / 9).foreach { _ =>
      fb.append(f"${readGroup(raw, off, 4)}%09d"); off += 4
    }
    val tailDigits = scale % 9
    if (tailDigits > 0) {
      val n = DigitBytes(tailDigits)
      fb.append(readGroup(raw, off, n).toString.reverse.padTo(tailDigits, '0').reverse)
      off += n
    }
    val sign = if (positive) "" else "-"
    Dec(if (scale > 0) s"$sign$intText.${fb.result()}" else s"$sign$intText")
  }

  private def fracBytes(fsp: Int): Int = (fsp + 1) / 2

  private def decodeDatetime2(b: ByteBuffer, fsp: Int): Dt = {
    // 5-byte big-endian packed: sign(1) yearMonth(17) day(5) hour(5)
    // minute(6) second(6); fractional appended big-endian, unit by fsp
    val raw = new Array[Byte](5)
    b.get(raw)
    var v = 0L
    raw.foreach(x => v = (v << 8) | (x & 0xffL))
    val yearMonth = ((v >> 22) & 0x1ffff).toInt
    val micros = fracBytes(fsp) match {
      case 0 => 0
      case n =>
        val fraw = new Array[Byte](n); b.get(fraw)
        var f = 0L; fraw.foreach(x => f = (f << 8) | (x & 0xffL))
        (f * (n match { case 1 => 10000L; case 2 => 100L; case _ => 1L })).toInt
    }
    Dt(yearMonth / 13, yearMonth % 13, ((v >> 17) & 0x1f).toInt,
      ((v >> 12) & 0x1f).toInt, ((v >> 6) & 0x3f).toInt, (v & 0x3f).toInt,
      micros, fsp)
  }

  private def beLong(b: ByteBuffer, n: Int): Long = {
    val raw = new Array[Byte](n); b.get(raw)
    var v = 0L; raw.foreach(x => v = (v << 8) | (x & 0xffL)); v
  }

  /** TIME2 (my_time.cc `my_time_packed_from_binary`): 3 bytes BE with a
    * 0x800000 offset carrying sign(1) hour(10) minute(6) second(6);
    * fsp 1-4 append a BE fractional that borrows from the int part when
    * the value is negative (the +1 / −0x100 dance below, exactly the
    * server's); fsp 5-6 store one 6-byte offset-binary number. The
    * unpacked `packed` is `±((hms << 24) + microseconds)`.
    */
  private[graft] def decodeTime2(b: ByteBuffer, fsp: Int): Tm = {
    val packed: Long = fsp match {
      case 0 => (beLong(b, 3) - 0x800000L) << 24
      case 1 | 2 =>
        var intpart = beLong(b, 3) - 0x800000L
        var frac = beLong(b, 1)
        if (intpart < 0 && frac != 0) { intpart += 1; frac -= 0x100 }
        (intpart << 24) + frac * 10000L
      case 3 | 4 =>
        var intpart = beLong(b, 3) - 0x800000L
        var frac = beLong(b, 2)
        if (intpart < 0 && frac != 0) { intpart += 1; frac -= 0x10000 }
        (intpart << 24) + frac * 100L
      case _ => beLong(b, 6) - 0x800000000000L
    }
    val neg = packed < 0
    val a = math.abs(packed)
    val hms = (a >> 24).toInt
    Tm(neg, (hms >> 12) & 0x3ff, (hms >> 6) & 0x3f, hms & 0x3f,
      (a & 0xffffffL).toInt, fsp)
  }

  /** TIMESTAMP2 (`my_timestamp_from_binary`): 4-byte BE epoch seconds
    * plus the BE fractional; rendered as a UTC wall-clock `Dt` (the
    * reference converts the instant in the database's timezone; UTC is
    * the fixture contract here).
    */
  private def decodeTimestamp2(b: ByteBuffer, fsp: Int): Dt = {
    val sec = beLong(b, 4)
    val micros = fracBytes(fsp) match {
      case 0 => 0L
      case 1 => beLong(b, 1) * 10000L
      case 2 => beLong(b, 2) * 100L
      case _ => beLong(b, 3)
    }
    val ldt = java.time.LocalDateTime.ofEpochSecond(sec, 0,
      java.time.ZoneOffset.UTC)
    Dt(ldt.getYear, ldt.getMonthValue, ldt.getDayOfMonth, ldt.getHour,
      ldt.getMinute, ldt.getSecond, micros.toInt, fsp)
  }

  // --------------------------------------------------- MySQL binary JSON
  // The json_binary format JSON columns arrive in (MySQL json_binary.h;
  // the reference delegates to the binlog client's JsonBinary —
  // `jdbc/BinlogValueConverters.java:458`): one type byte then a value;
  // containers store [count][size] headers, fixed-width key/value entry
  // tables (2-byte offsets in the "small" variants, 4-byte in "large"),
  // then key bytes and out-of-line nested values; literals/int16/uint16
  // (plus int32/uint32 in large) inline into the value-entry slot.

  /** A decoded JSON column value: rendered compact JSON text. */
  final case class Js(text: String)

  /** Typed JSON tree for fixture building (encoder input). */
  sealed trait JsonVal
  case object JNull extends JsonVal
  final case class JBool(b: Boolean) extends JsonVal
  final case class JInt(l: Long) extends JsonVal
  final case class JDouble(d: Double) extends JsonVal
  final case class JStr(s: String) extends JsonVal
  final case class JArr(items: Seq[JsonVal]) extends JsonVal
  final case class JObj(fields: Seq[(String, JsonVal)]) extends JsonVal

  private val JT_SMALL_OBJ = 0x00; private val JT_LARGE_OBJ = 0x01
  private val JT_SMALL_ARR = 0x02; private val JT_LARGE_ARR = 0x03
  private val JT_LITERAL = 0x04
  private val JT_INT16 = 0x05; private val JT_UINT16 = 0x06
  private val JT_INT32 = 0x07; private val JT_UINT32 = 0x08
  private val JT_INT64 = 0x09; private val JT_UINT64 = 0x0a
  private val JT_DOUBLE = 0x0b; private val JT_STRING = 0x0c

  private def jsLe(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    (0 until n).foreach(i => v |= (b(off + i) & 0xffL) << (8 * i))
    v
  }

  /** Decode one json_binary value to compact JSON text. `off` points at
    * the value body; `t` is its type byte (read by the caller — inlined
    * values have no body of their own).
    */
  private def jsRender(b: Array[Byte], t: Int, off: Int): String = t match {
    case JT_LITERAL => (b(off) & 0xff) match {
      case 0 => "null"; case 1 => "true"; case 2 => "false"
      case x => throw new IllegalArgumentException(s"bad literal $x")
    }
    case JT_INT16 => jsLe(b, off, 2).toShort.toString
    case JT_UINT16 => (jsLe(b, off, 2) & 0xffff).toString
    case JT_INT32 => jsLe(b, off, 4).toInt.toString
    case JT_UINT32 => (jsLe(b, off, 4) & 0xffffffffL).toString
    case JT_INT64 => jsLe(b, off, 8).toString
    case JT_UINT64 => java.lang.Long.toUnsignedString(jsLe(b, off, 8))
    case JT_DOUBLE =>
      java.lang.Double.longBitsToDouble(jsLe(b, off, 8)).toString
    case JT_STRING =>
      // varlen: 7-bit little-endian groups, high bit = continuation
      var len = 0; var shift = 0; var p = off
      var cont = true
      while (cont) {
        val x = b(p) & 0xff; p += 1
        len |= (x & 0x7f) << shift; shift += 7; cont = (x & 0x80) != 0
      }
      jsonString(new String(b, p, len, StandardCharsets.UTF_8))
    case JT_SMALL_OBJ | JT_LARGE_OBJ | JT_SMALL_ARR | JT_LARGE_ARR =>
      val large = t == JT_LARGE_OBJ || t == JT_LARGE_ARR
      val isObj = t == JT_SMALL_OBJ || t == JT_LARGE_OBJ
      val w = if (large) 4 else 2
      val count = jsLe(b, off, w).toInt
      val entryBase = off + 2 * w
      val keyEntrySize = w + 2           // key offset + u16 key length
      val valEntrySize = 1 + w           // type byte + offset-or-inline
      def valueAt(slot: Int): String = {
        val vt = b(slot) & 0xff
        val inlined = vt == JT_LITERAL || vt == JT_INT16 || vt == JT_UINT16 ||
          (large && (vt == JT_INT32 || vt == JT_UINT32))
        if (inlined) jsRender(b, vt, slot + 1)
        else jsRender(b, vt, off + jsLe(b, slot + 1, w).toInt)
      }
      if (isObj) {
        val valBase = entryBase + count * keyEntrySize
        (0 until count).map { i =>
          val ke = entryBase + i * keyEntrySize
          val kOff = off + jsLe(b, ke, w).toInt
          val kLen = jsLe(b, ke + w, 2).toInt
          val key = new String(b, kOff, kLen, StandardCharsets.UTF_8)
          s"${jsonString(key)}:${valueAt(valBase + i * valEntrySize)}"
        }.mkString("{", ",", "}")
      } else {
        (0 until count).map(i => valueAt(entryBase + i * valEntrySize))
          .mkString("[", ",", "]")
      }
    case other => throw new IllegalArgumentException(s"json type $other")
  }

  def decodeJsonBinary(bytes: Array[Byte]): String =
    jsRender(bytes, bytes(0) & 0xff, 1)

  // ------------------------------------------- partial JSON (diffs)
  // With `binlog_row_value_options=PARTIAL_JSON` (mysql 8.0), JSON
  // columns in UPDATE after-images may carry a json_diff SEQUENCE
  // instead of the full document: { op byte (0=REPLACE, 1=INSERT,
  // 2=REMOVE), lenenc path length + path ($.key, $.arr[N], …), and for
  // non-REMOVE ops lenenc value length + a json_binary value }. The
  // reference requires the option OFF; applying the diffs to the
  // before image reconstructs the full post-image, so partial events
  // decode to the same wire rows full events would.

  /** Parse one json_binary value into the typed tree — the inverse of
    * the renderer, needed to apply diffs to a before image.
    */
  private def jsParse(b: Array[Byte], t: Int, off: Int): JsonVal = t match {
    case JT_LITERAL => (b(off) & 0xff) match {
      case 0 => JNull; case 1 => JBool(true); case 2 => JBool(false)
      case x => throw new IllegalArgumentException(s"bad literal $x")
    }
    case JT_INT16 => JInt(jsLe(b, off, 2).toShort.toLong)
    case JT_UINT16 => JInt(jsLe(b, off, 2) & 0xffff)
    case JT_INT32 => JInt(jsLe(b, off, 4).toInt.toLong)
    case JT_UINT32 => JInt(jsLe(b, off, 4) & 0xffffffffL)
    case JT_INT64 => JInt(jsLe(b, off, 8))
    case JT_DOUBLE =>
      JDouble(java.lang.Double.longBitsToDouble(jsLe(b, off, 8)))
    case JT_STRING =>
      var len = 0; var shift = 0; var p = off
      var cont = true
      while (cont) {
        val x = b(p) & 0xff; p += 1
        len |= (x & 0x7f) << shift; shift += 7; cont = (x & 0x80) != 0
      }
      JStr(new String(b, p, len, StandardCharsets.UTF_8))
    case JT_SMALL_OBJ | JT_LARGE_OBJ | JT_SMALL_ARR | JT_LARGE_ARR =>
      val large = t == JT_LARGE_OBJ || t == JT_LARGE_ARR
      val isObj = t == JT_SMALL_OBJ || t == JT_LARGE_OBJ
      val w = if (large) 4 else 2
      val count = jsLe(b, off, w).toInt
      val entryBase = off + 2 * w
      val keyEntrySize = w + 2
      val valEntrySize = 1 + w
      def valueAt(slot: Int): JsonVal = {
        val vt = b(slot) & 0xff
        val inlined = vt == JT_LITERAL || vt == JT_INT16 || vt == JT_UINT16 ||
          (large && (vt == JT_INT32 || vt == JT_UINT32))
        if (inlined) jsParse(b, vt, slot + 1)
        else jsParse(b, vt, off + jsLe(b, slot + 1, w).toInt)
      }
      if (isObj) {
        val valBase = entryBase + count * keyEntrySize
        JObj((0 until count).map { i =>
          val ke = entryBase + i * keyEntrySize
          val kOff = off + jsLe(b, ke, w).toInt
          val kLen = jsLe(b, ke + w, 2).toInt
          new String(b, kOff, kLen, StandardCharsets.UTF_8) ->
            valueAt(valBase + i * valEntrySize)
        })
      } else JArr((0 until count).map(i =>
        valueAt(entryBase + i * valEntrySize)))
    case other => throw new IllegalArgumentException(s"json type $other")
  }

  def parseJsonBinary(bytes: Array[Byte]): JsonVal =
    jsParse(bytes, bytes(0) & 0xff, 1)

  /** One json_diff entry; ops follow mysql json_diff.h. */
  final case class JsonDiff(op: Int, path: String, value: Option[JsonVal])
  val DIFF_REPLACE = 0; val DIFF_INSERT = 1; val DIFF_REMOVE = 2

  /** `$`-rooted member/index path → legs (Left = object key,
    * Right = array index).
    */
  private[wire] def parseJsonPath(path: String): Seq[Either[String, Int]] = {
    require(path.startsWith("$"), s"json path must start at root: $path")
    val legs = Seq.newBuilder[Either[String, Int]]
    var i = 1
    while (i < path.length) path.charAt(i) match {
      case '.' =>
        val start = i + 1
        var j = start
        while (j < path.length && path.charAt(j) != '.' && path.charAt(j) != '[')
          j += 1
        legs += Left(path.substring(start, j)); i = j
      case '[' =>
        val close = path.indexOf(']', i)
        legs += Right(path.substring(i + 1, close).toInt); i = close + 1
      case other =>
        throw new IllegalArgumentException(s"bad json path char '$other' in $path")
    }
    legs.result()
  }

  /** Apply diffs in order to a document tree (REPLACE overwrites an
    * existing member/element, INSERT adds a missing object key or
    * splices an array element, REMOVE deletes). A path that does not
    * exist in the document — missing key, array index past the end, or
    * a leg whose node has the wrong shape — is a NO-OP for that diff
    * (the server's seek-then-apply semantics), never an error: one
    * stray diff must not kill the whole segment decode.
    */
  def applyJsonDiffs(doc: JsonVal, diffs: Seq[JsonDiff]): JsonVal = {
    def applyOne(node: JsonVal, legs: Seq[Either[String, Int]],
                 d: JsonDiff): JsonVal = legs match {
      case Seq() =>
        if (d.op == DIFF_REPLACE) d.value.get else node
      case Seq(leg) => (node, leg) match {
        case (JObj(fs), Left(key)) => d.op match {
          case DIFF_REPLACE => JObj(fs.map { case (k, v) =>
            if (k == key) k -> d.value.get else k -> v })
          case DIFF_INSERT =>
            if (fs.exists(_._1 == key)) JObj(fs) // mysql: insert never overwrites
            else JObj(fs :+ (key -> d.value.get))
          case DIFF_REMOVE => JObj(fs.filterNot(_._1 == key))
        }
        case (JArr(xs), Right(idx)) => d.op match {
          case DIFF_REPLACE =>
            if (idx < xs.size) JArr(xs.updated(idx, d.value.get)) else node
          case DIFF_INSERT =>
            val at = math.min(idx, xs.size)
            JArr((xs.take(at) :+ d.value.get) ++ xs.drop(at))
          case DIFF_REMOVE => JArr(xs.patch(idx, Nil, 1))
        }
        case _ => node // wrong-shape leg: nothing to apply
      }
      case leg +: rest => (node, leg) match {
        case (JObj(fs), Left(key)) => JObj(fs.map { case (k, v) =>
          if (k == key) k -> applyOne(v, rest, d) else k -> v })
        case (JArr(xs), Right(idx)) =>
          if (idx < xs.size) JArr(xs.updated(idx, applyOne(xs(idx), rest, d)))
          else node
        case _ => node
      }
    }
    diffs.foldLeft(doc)((acc, d) => applyOne(acc, parseJsonPath(d.path), d))
  }

  /** Parse a JSON cell payload that carries a diff sequence. */
  private def parseDiffSeq(bytes: Array[Byte]): Seq[JsonDiff] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[JsonDiff]
    while (b.hasRemaining) {
      val op = b.get() & 0xff
      val pathLen = lenenc(b).toInt
      val pathB = new Array[Byte](pathLen); b.get(pathB)
      val value =
        if (op == DIFF_REMOVE) None
        else {
          val vLen = lenenc(b).toInt
          val vB = new Array[Byte](vLen); b.get(vB)
          Some(parseJsonBinary(vB))
        }
      out += JsonDiff(op, new String(pathB, StandardCharsets.UTF_8), value)
    }
    out.result()
  }

  /** Encode a JSON tree in the SMALL container variants (fixture
    * builder; decode handles large too).
    */
  def encodeJsonBinary(v: JsonVal): Array[Byte] = {
    val (t, body) = jsEncode(v)
    Array(t.toByte) ++ body
  }

  /** SMALL containers address with 16-bit offsets: anything whose layout
    * exceeds `Short.MaxValue` would silently wrap `tail.toShort` and
    * produce bytes no server ever emits — fail fast instead (the encoder
    * is a fixture builder; LARGE-variant encode is out of scope, decode
    * handles both).
    */
  private def requireSmall(tail: Long): Unit =
    require(tail <= Short.MaxValue,
      s"container layout $tail bytes exceeds SMALL variant 16-bit offsets")

  private def jsEncode(v: JsonVal): (Int, Array[Byte]) = v match {
    case JNull => (JT_LITERAL, Array(0.toByte))
    case JBool(x) => (JT_LITERAL, Array(if (x) 1.toByte else 2.toByte))
    case JInt(l) if l >= Short.MinValue && l <= Short.MaxValue =>
      (JT_INT16, Array((l & 0xff).toByte, ((l >> 8) & 0xff).toByte))
    case JInt(l) if l >= Int.MinValue && l <= Int.MaxValue =>
      (JT_INT32, (0 until 4).map(i => ((l >> (8 * i)) & 0xff).toByte).toArray)
    case JInt(l) =>
      (JT_INT64, (0 until 8).map(i => ((l >> (8 * i)) & 0xff).toByte).toArray)
    case JDouble(d) =>
      val bits = java.lang.Double.doubleToLongBits(d)
      (JT_DOUBLE, (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray)
    case JStr(s) =>
      val sb = s.getBytes(StandardCharsets.UTF_8)
      var len = sb.length
      val pre = scala.collection.mutable.ArrayBuffer[Byte]()
      while (len > 0x7f) { pre += ((len & 0x7f) | 0x80).toByte; len >>= 7 }
      pre += len.toByte
      (JT_STRING, pre.toArray ++ sb)
    case JArr(items) =>
      val parts = items.map(jsEncode)
      val valEntrySize = 3
      var tail = 4 + items.size * valEntrySize
      val entries = leBuf(items.size * valEntrySize)
      val outline = scala.collection.mutable.ArrayBuffer[Byte]()
      parts.foreach { case (t, body) =>
        entries.put(t.toByte)
        if (t == JT_LITERAL || t == JT_INT16) {
          entries.putShort(if (t == JT_LITERAL) (body(0) & 0xff).toShort
            else jsLe(body, 0, 2).toShort)
        } else {
          // outlined: entry holds type + offset; the body (no type byte)
          // lands after the entry table, offsets relative to body start
          entries.putShort(tail.toShort)
          outline ++= body
          tail += body.length
        }
      }
      requireSmall(tail)
      val b = leBuf(4 + entries.position() + outline.size)
      b.putShort(items.size.toShort); b.putShort(tail.toShort)
      val e = new Array[Byte](entries.position()); entries.flip(); entries.get(e)
      b.put(e); b.put(outline.toArray)
      val out = new Array[Byte](b.position()); b.flip(); b.get(out)
      (JT_SMALL_ARR, out)
    case JObj(rawFields) =>
      // The server stores object keys sorted by (length, bytes) — memcmp
      // order, json_binary.cc — so a fixture laid out in insertion order
      // would diverge from genuine server bytes. Sort here; the decoder
      // renders stored order, which is then exactly what MySQL returns.
      val fields = rawFields.sortBy { f =>
        val kb = f._1.getBytes(StandardCharsets.UTF_8)
        (kb.length, kb.map(b => (b & 0xff).toChar).mkString)
      }
      val keys = fields.map(_._1.getBytes(StandardCharsets.UTF_8))
      val parts = fields.map(f => jsEncode(f._2))
      val keyEntrySize = 4; val valEntrySize = 3
      var tail = 4 + fields.size * (keyEntrySize + valEntrySize)
      val keyEntries = leBuf(fields.size * keyEntrySize)
      keys.foreach { k =>
        keyEntries.putShort(tail.toShort); keyEntries.putShort(k.length.toShort)
        tail += k.length
      }
      val valEntries = leBuf(fields.size * valEntrySize)
      val outline = scala.collection.mutable.ArrayBuffer[Byte]()
      val outlined = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
      parts.foreach { case (t, body) =>
        valEntries.put(t.toByte)
        if (t == JT_LITERAL || t == JT_INT16) {
          valEntries.putShort(if (t == JT_LITERAL) (body(0) & 0xff).toShort
            else jsLe(body, 0, 2).toShort)
        } else {
          valEntries.putShort(tail.toShort)
          outlined += ((t, body))
          tail += body.length
        }
      }
      outlined.foreach { case (_, body) => outline ++= body }
      requireSmall(tail)
      val b = leBuf(tail)
      b.putShort(fields.size.toShort); b.putShort(tail.toShort)
      val ke = new Array[Byte](keyEntries.position()); keyEntries.flip(); keyEntries.get(ke)
      val ve = new Array[Byte](valEntries.position()); valEntries.flip(); valEntries.get(ve)
      b.put(ke); b.put(ve)
      keys.foreach(b.put)
      b.put(outline.toArray)
      val out = new Array[Byte](b.position()); b.flip(); b.get(out)
      (JT_SMALL_OBJ, out)
  }

  /** Decode one storage cell. `unsigned` comes from WL#4618 signedness
    * metadata (absent ⇒ signed, the pre-8.0 behavior): the stored bytes
    * are identical either way — only the reinterpretation differs.
    * Unsigned BIGINT can exceed Long range, so it surfaces as exact
    * digits (`Dec`), matching the reference's precise handling mode
    * (`bigint.unsigned.handling.mode=precise`).
    */
  private def cell(b: ByteBuffer, colType: Int, meta: Int,
                   unsigned: Boolean = false): Any = colType match {
    case TYPE_TINY =>
      val v = b.get(); if (unsigned) v & 0xff else v.toInt
    case TYPE_SHORT =>
      val v = b.getShort(); if (unsigned) v & 0xffff else v.toInt
    case TYPE_LONG =>
      val v = b.getInt(); if (unsigned) v & 0xffffffffL else v
    case TYPE_LONGLONG =>
      val v = b.getLong()
      if (unsigned && v < 0) Dec(java.lang.Long.toUnsignedString(v)) else v
    case TYPE_INT24 =>
      val v = (b.get() & 0xff) | ((b.get() & 0xff) << 8) | ((b.get() & 0xff) << 16)
      if (unsigned) v else (v << 8) >> 8 // sign-extend 24 bits
    case TYPE_FLOAT => java.lang.Float.intBitsToFloat(b.getInt())
    case TYPE_DOUBLE => java.lang.Double.longBitsToDouble(b.getLong())
    case TYPE_YEAR =>
      val v = b.get() & 0xff
      if (v == 0) 0 else 1900 + v
    case TYPE_DATE =>
      val v = (b.get() & 0xff) | ((b.get() & 0xff) << 8) | ((b.get() & 0xff) << 16)
      Dt(v >> 9, (v >> 5) & 0xf, v & 0x1f)
    case TYPE_DATETIME2 => decodeDatetime2(b, meta)
    case TYPE_NEWDECIMAL => decodeDecimal(b, meta >> 8, meta & 0xff)
    case TYPE_BLOB =>
      var len = 0L
      (0 until meta).foreach(i => len |= (b.get() & 0xffL) << (8 * i))
      val bytes = new Array[Byte](len.toInt)
      b.get(bytes)
      bytes
    case TYPE_JSON =>
      var len = 0L
      (0 until meta).foreach(i => len |= (b.get() & 0xffL) << (8 * i))
      val bytes = new Array[Byte](len.toInt)
      b.get(bytes)
      Js(decodeJsonBinary(bytes))
    case TYPE_GEOMETRY => // blob-style length prefix, then SRID + WKB
      var len = 0L
      (0 until meta).foreach(i => len |= (b.get() & 0xffL) << (8 * i))
      val srid = (b.get() & 0xff) | ((b.get() & 0xff) << 8) |
        ((b.get() & 0xff) << 16) | ((b.get() & 0xff) << 24)
      val wkb = new Array[Byte](len.toInt - 4)
      b.get(wkb)
      Geom(srid, wkb)
    case TYPE_VARCHAR =>
      val len = if (meta < 256) b.get() & 0xff else b.getShort() & 0xffff
      val bytes = new Array[Byte](len)
      b.get(bytes)
      new String(bytes, StandardCharsets.UTF_8)
    case TYPE_TIME2 => decodeTime2(b, meta)
    case TYPE_TIMESTAMP2 => decodeTimestamp2(b, meta)
    case TYPE_BIT => // meta = total bits; ceil(bits/8) bytes BIG-endian
      require(meta <= 64, s"BIT($meta) exceeds the 64-bit render range")
      beLong(b, (meta + 7) / 8)
    case TYPE_STRING => stringRealType(meta) match {
      // CHAR(n): varchar-like, prefix width from the unpacked length
      case (TYPE_STRING, len) =>
        val n = if (len < 256) b.get() & 0xff else b.getShort() & 0xffff
        val bytes = new Array[Byte](n); b.get(bytes)
        new String(bytes, StandardCharsets.UTF_8)
      case (TYPE_ENUM, len) =>
        EnumV((if (len == 1) b.get() & 0xff else b.getShort() & 0xffff))
      case (TYPE_SET, len) =>
        var v = 0L
        (0 until len).foreach(i => v |= (b.get() & 0xffL) << (8 * i))
        SetV(v)
      case (other, _) => throw new IllegalArgumentException(
        s"unsupported TYPE_STRING real type $other")
    }
    case other => throw new IllegalArgumentException(
      s"unsupported column type $other")
  }

  /** Raw JSON cell (partial-update reconstruction carriers). */
  private final case class JsBytes(bytes: Array[Byte])
  private final case class JsDiffsCell(diffs: Seq[JsonDiff])

  private def blobBytes(b: ByteBuffer, meta: Int): Array[Byte] = {
    var len = 0L
    (0 until meta).foreach(i => len |= (b.get() & 0xffL) << (8 * i))
    val bytes = new Array[Byte](len.toInt)
    b.get(bytes)
    bytes
  }

  private def rowImage(b: ByteBuffer, map: TableMap,
                       present: Array[Boolean],
                       jsonRaw: Boolean = false,
                       jsonPartial: Set[Int] = Set.empty): Row = {
    val nPresent = present.count(identity)
    val nulls = bitmap(b, nPresent)
    var pi = 0
    val cells = map.colTypes.indices.map { i =>
      if (!present(i)) None
      else {
        val isNull = nulls(pi); pi += 1
        if (isNull) None
        else if (map.colTypes(i) == TYPE_JSON && jsonPartial(i))
          Some(JsDiffsCell(parseDiffSeq(blobBytes(b, map.colMeta(i)))))
        else if (map.colTypes(i) == TYPE_JSON && jsonRaw)
          Some(JsBytes(blobBytes(b, map.colMeta(i))))
        else Some(cell(b, map.colTypes(i), map.colMeta(i),
            map.isUnsigned(i)) match {
          // ENUM/SET resolve to their string values when the TABLE_MAP
          // carries WL#4618 value metadata (ordinal 0 = MySQL's
          // invalid-value empty member; set mask renders comma-joined
          // in member order, MySQL's own text form)
          case EnumV(ord) => map.enumValues.get(i) match {
            case Some(vs) if ord >= 1 && ord <= vs.size => vs(ord - 1)
            case Some(_) => ""
            case None => ord
          }
          case SetV(mask) => map.setValues.get(i) match {
            case Some(vs) => vs.zipWithIndex
              .collect { case (v, k) if (mask & (1L << k)) != 0 => v }
              .mkString(",")
            case None => mask
          }
          case v => v
        })
      }
    }
    Row(cells)
  }

  /** Decode one binlog file (magic + events) into an event iterator.
    * TABLE_MAP state is carried by the caller via `segmentRows`; here each
    * rows-event needs the latest map for its tableId to parse values, so
    * decoding is single-pass with an internal map registry.
    */
  def readSegment(bytes: Array[Byte]): Iterator[Event] = {
    require(bytes.length >= 4 && java.util.Arrays.equals(bytes.slice(0, 4), Magic),
      "not a binlog segment (bad magic)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(4)
    val maps = scala.collection.mutable.Map[Long, TableMap]()
    def crcOf(from: Int, until: Int): Long = {
      val c = new java.util.zip.CRC32()
      c.update(bytes, from, until - from)
      c.getValue
    }
    def storedCrc(at: Int): Long =
      (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
        ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)
    new Iterator[Event] {
      // set once the FORMAT_DESCRIPTION declares binlog_checksum=CRC32;
      // every later event then ends in a 4-byte CRC32 the body parse
      // must not consume (WL#2540)
      private var checksum = false
      def hasNext: Boolean = buf.remaining() >= 19
      def next(): Event = {
        val start = buf.position()
        /* timestamp */ buf.getInt()
        val kind = buf.get() & 0xff
        val serverId = buf.getInt()
        val eventSize = buf.getInt()
        val nextPos = buf.getInt().toLong & 0xffffffffL
        /* flags */ buf.getShort()
        val end = start + eventSize
        val dataEnd =
          if (checksum && kind != FORMAT_DESCRIPTION) {
            require(crcOf(start, end - 4) == storedCrc(end - 4),
              s"binlog event CRC32 mismatch (type $kind at offset $start)")
            end - 4
          } else end
        val ev = kind match {
          case FORMAT_DESCRIPTION =>
            // post-header: binlog_version(2) server_version(50)
            // create_ts(4) common_header_len(1), then the
            // post_header_len array. The array's FORMAT_DESCRIPTION
            // entry (index 14) is the FDE's own data length; anything
            // beyond it is the checksum block: alg(1) [+ crc32(4)]
            val arrayStart = start + 19 + 2 + 50 + 4 + 1
            val fdeDataLen = bytes(arrayStart + FORMAT_DESCRIPTION - 1) & 0xff
            val checksumBlockLen = (eventSize - 19) - fdeDataLen
            val alg =
              if (checksumBlockLen >= 1) bytes(start + 19 + fdeDataLen) & 0xff
              else ChecksumNone
            if (alg == ChecksumCrc32) {
              require(checksumBlockLen == 5,
                s"CRC32 declared but checksum block is $checksumBlockLen bytes")
              require(crcOf(start, end - 4) == storedCrc(end - 4),
                "FORMAT_DESCRIPTION CRC32 mismatch")
              checksum = true
            } else require(alg == ChecksumNone,
              s"unsupported binlog_checksum algorithm $alg")
            SkippedEvent(nextPos, kind)
          case TABLE_MAP =>
            val tableId = uint48(buf)
            buf.getShort() // flags
            val schemaLen = buf.get() & 0xff
            val schemaB = new Array[Byte](schemaLen); buf.get(schemaB); buf.get()
            val tableLen = buf.get() & 0xff
            val tableB = new Array[Byte](tableLen); buf.get(tableB); buf.get()
            val nCols = lenenc(buf).toInt
            val types = (0 until nCols).map(_ => buf.get() & 0xff)
            val metaLen = lenenc(buf).toInt
            val metaEnd = buf.position() + metaLen
            val meta = types.map {
              case TYPE_VARCHAR => buf.getShort() & 0xffff
              case TYPE_FLOAT | TYPE_DOUBLE | TYPE_BLOB | TYPE_DATETIME2 |
                   TYPE_JSON | TYPE_GEOMETRY | TYPE_TIMESTAMP2 |
                   TYPE_TIME2 =>
                buf.get() & 0xff
              case TYPE_NEWDECIMAL => // precision byte, scale byte
                ((buf.get() & 0xff) << 8) | (buf.get() & 0xff)
              case TYPE_STRING => // real-type byte, length byte (packed)
                ((buf.get() & 0xff) << 8) | (buf.get() & 0xff)
              case TYPE_BIT => // bits%8 byte, bytes byte → total bits
                val b0 = buf.get() & 0xff; val b1 = buf.get() & 0xff
                b1 * 8 + b0
              case _ => 0
            }
            require(buf.position() == metaEnd, "metadata block length mismatch")
            bitmap(buf, nCols) // nullability — unused by the row parser
            // WL#4618 optional metadata (binlog_row_metadata=FULL): TLV
            // fields to the end of the event. Signedness bits cover
            // numeric columns only, MSB-first within each byte.
            var unsignedCols: Seq[Boolean] = Nil
            var colNames: Seq[String] = Nil
            var pk: Seq[Int] = Nil
            var enumVals = Map.empty[Int, Seq[String]]
            var setVals = Map.empty[Int, Seq[String]]
            // ENUM_STR_VALUE / SET_STR_VALUE list one value-set per
            // column OF THAT REAL TYPE, in column order
            def strValueSets(fieldEnd: Int, realType: Int)
            : Map[Int, Seq[String]] = {
              val cols = types.indices.filter(i =>
                types(i) == TYPE_STRING &&
                  stringRealType(meta(i))._1 == realType)
              cols.map { col =>
                val n = lenenc(buf).toInt
                col -> (0 until n).map { _ =>
                  val l = lenenc(buf).toInt
                  val vb = new Array[Byte](l); buf.get(vb)
                  new String(vb, StandardCharsets.UTF_8)
                }
              }.toMap
            }
            while (buf.position() < dataEnd) {
              val fieldType = buf.get() & 0xff
              val fieldLen = lenenc(buf).toInt
              val fieldEnd = buf.position() + fieldLen
              fieldType match {
                case META_SIGNEDNESS =>
                  val numericIdx = types.indices.filter(i => isNumericType(types(i)))
                  val bits = new Array[Byte](fieldLen); buf.get(bits)
                  val flags = Array.fill(nCols)(false)
                  numericIdx.zipWithIndex.foreach { case (col, bit) =>
                    if ((bits(bit / 8) & (0x80 >> (bit % 8))) != 0)
                      flags(col) = true
                  }
                  unsignedCols = flags.toSeq
                case META_COLUMN_NAME =>
                  val b2 = Seq.newBuilder[String]
                  while (buf.position() < fieldEnd) {
                    val n = lenenc(buf).toInt
                    val nb = new Array[Byte](n); buf.get(nb)
                    b2 += new String(nb, StandardCharsets.UTF_8)
                  }
                  colNames = b2.result()
                case META_SIMPLE_PRIMARY_KEY =>
                  val b2 = Seq.newBuilder[Int]
                  while (buf.position() < fieldEnd) b2 += lenenc(buf).toInt
                  pk = b2.result()
                case META_ENUM_STR_VALUE =>
                  enumVals = strValueSets(fieldEnd, TYPE_ENUM)
                case META_SET_STR_VALUE =>
                  setVals = strValueSets(fieldEnd, TYPE_SET)
                case _ => () // DEFAULT_CHARSET, GEOMETRY_TYPE, … — skip
              }
              buf.position(fieldEnd)
            }
            val m = TableMap(tableId, new String(schemaB, StandardCharsets.UTF_8),
              new String(tableB, StandardCharsets.UTF_8), types, meta,
              names = colNames, unsigned = unsignedCols, primaryKey = pk,
              enumValues = enumVals, setValues = setVals)
            maps(tableId) = m
            TableMapEvent(nextPos, m)
          case WRITE_ROWS_V2 | UPDATE_ROWS_V2 | DELETE_ROWS_V2 =>
            val tableId = uint48(buf)
            buf.getShort() // flags
            val extraLen = buf.getShort() & 0xffff
            buf.position(buf.position() + (extraLen - 2))
            val map = maps.getOrElse(tableId, throw new IllegalStateException(
              s"rows event for unmapped table id $tableId"))
            val nCols = lenenc(buf).toInt
            require(nCols == map.colTypes.size, "column count mismatch vs TABLE_MAP")
            val present = bitmap(buf, nCols)
            val presentAfter =
              if (kind == UPDATE_ROWS_V2) bitmap(buf, nCols) else present
            val before = scala.collection.mutable.ArrayBuffer[Row]()
            val after = scala.collection.mutable.ArrayBuffer[Row]()
            while (buf.position() < dataEnd) {
              if (kind == UPDATE_ROWS_V2) {
                before += rowImage(buf, map, present)
                after += rowImage(buf, map, presentAfter)
              } else before += rowImage(buf, map, present)
            }
            RowsEvent(nextPos, kind, tableId, before.toSeq, after.toSeq)
          case PARTIAL_UPDATE_ROWS =>
            val tableId = uint48(buf)
            buf.getShort() // flags
            val extraLen = buf.getShort() & 0xffff
            buf.position(buf.position() + (extraLen - 2))
            val map = maps.getOrElse(tableId, throw new IllegalStateException(
              s"rows event for unmapped table id $tableId"))
            val nCols = lenenc(buf).toInt
            require(nCols == map.colTypes.size, "column count mismatch vs TABLE_MAP")
            val present = bitmap(buf, nCols)
            val presentAfter = bitmap(buf, nCols)
            val jsonCols = map.colTypes.indices
              .filter(i => map.colTypes(i) == TYPE_JSON)
            val before = scala.collection.mutable.ArrayBuffer[Row]()
            val after = scala.collection.mutable.ArrayBuffer[Row]()
            while (buf.position() < dataEnd) {
              val b0 = rowImage(buf, map, present, jsonRaw = true)
              // after image: value_options, then (if PARTIAL_JSON) one
              // partial bit per JSON column, then the usual image
              val valueOptions = lenenc(buf)
              val partial: Set[Int] =
                if ((valueOptions & 1) == 0) Set.empty
                else {
                  val bits = bitmap(buf, jsonCols.size)
                  jsonCols.zip(bits).filter(_._2).map(_._1).toSet
                }
              val a0 = rowImage(buf, map, presentAfter, jsonRaw = true,
                jsonPartial = partial)
              def full(r: Row): Row = Row(r.cells.map {
                case Some(JsBytes(bytes)) => Some(Js(decodeJsonBinary(bytes)))
                case c => c
              })
              val aFull = Row(a0.cells.zipWithIndex.map {
                case (Some(JsDiffsCell(ds)), i) =>
                  val baseBytes = b0.cells(i) match {
                    case Some(JsBytes(bytes)) => bytes
                    case other => throw new IllegalStateException(
                      s"partial JSON diff without a before image: $other")
                  }
                  val applied = applyJsonDiffs(parseJsonBinary(baseBytes), ds)
                  // re-encode → decode: renders the post-image exactly as
                  // the server would store it (sorted keys, canon layout)
                  Some(Js(decodeJsonBinary(encodeJsonBinary(applied))))
                case (Some(JsBytes(bytes)), _) =>
                  Some(Js(decodeJsonBinary(bytes)))
                case (c, _) => c
              })
              before += full(b0)
              after += aFull
            }
            RowsEvent(nextPos, PARTIAL_UPDATE_ROWS, tableId, before.toSeq,
              after.toSeq)
          case XID =>
            XidEvent(nextPos, buf.getLong())
          case QUERY =>
            // post-header: thread_id(4) exec_time(4) schema_len(1)
            // error_code(2) status_vars_len(2); body: status vars
            // (skipped), default schema, NUL, statement text to the end
            buf.getInt(); buf.getInt()
            val schemaLen = buf.get() & 0xff
            buf.getShort()
            val statusLen = buf.getShort() & 0xffff
            buf.position(buf.position() + statusLen)
            val sB = new Array[Byte](schemaLen); buf.get(sB)
            buf.get() // NUL terminator
            val qB = new Array[Byte](dataEnd - buf.position()); buf.get(qB)
            QueryEvent(nextPos, new String(sB, StandardCharsets.UTF_8),
              new String(qB, StandardCharsets.UTF_8))
          case MARIADB_GTID =>
            // payload: seqno(8) domainId(4) flags2(1); server from header
            val seqNo = buf.getLong()
            val domain = buf.getInt().toLong & 0xffffffffL
            val flags2 = buf.get() & 0xff
            MariaGtidEvent(nextPos, domain, serverId.toLong & 0xffffffffL,
              seqNo, (flags2 & FL_STANDALONE) != 0)
          case GTID_LOG | ANONYMOUS_GTID_LOG =>
            // payload: flags(1) sid(16) gno(8 LE), then since 5.7 the
            // logical-clock block: typecode(1)=2 last_committed(8)
            // sequence_number(8); later servers append commit
            // timestamps we tolerate and skip (positioned to `end`)
            buf.get() // commit flag (rbr_only)
            val sid = uuidText(buf)
            val gno = buf.getLong()
            val (lc, sn) =
              if (dataEnd - buf.position() >= 17 && (buf.get() & 0xff) == 2)
                (buf.getLong(), buf.getLong())
              else (0L, 0L)
            MySqlGtidEvent(nextPos, sid, gno, lc, sn,
              anonymous = kind == ANONYMOUS_GTID_LOG)
          case ROWS_QUERY =>
            // body: query-length(1, possibly truncated — ignored, as the
            // mysql-binlog-connector does) then the statement text
            buf.get()
            val qB = new Array[Byte](dataEnd - buf.position())
            buf.get(qB)
            RowsQueryEvent(nextPos, new String(qB, StandardCharsets.UTF_8))
          case TRANSACTION_PAYLOAD =>
            // TLV header (libbinlogevents Transaction_payload_event):
            // field-type(lenenc) [length(lenenc) value(lenenc)]* until
            // HEADER_END_MARK(0); then the payload bytes. Fields:
            // 1=payload_size 2=compression_type 3=uncompressed_size
            var compression = CompressNone.toLong
            var payloadSize = -1L
            var uncompressedSize = -1L
            var headerDone = false
            while (!headerDone) {
              val t = lenenc(buf)
              if (t == 0L) headerDone = true
              else {
                val len = lenenc(buf).toInt
                val valEnd = buf.position() + len
                t match {
                  case 1 => payloadSize = lenenc(buf)
                  case 2 => compression = lenenc(buf)
                  case 3 => uncompressedSize = lenenc(buf)
                  case _ => () // unknown field: skip by length
                }
                buf.position(valEnd)
              }
            }
            val n =
              if (payloadSize >= 0) payloadSize.toInt
              else dataEnd - buf.position()
            val payload = new Array[Byte](n); buf.get(payload)
            val raw = compression match {
              case CompressZstd =>
                require(uncompressedSize >= 0,
                  "zstd payload without uncompressed_size")
                com.github.luben.zstd.Zstd
                  .decompress(payload, uncompressedSize.toInt)
              case CompressNone => payload
              case other => throw new IllegalArgumentException(
                s"unsupported transaction payload compression $other")
            }
            TransactionPayloadEvent(nextPos, compression.toInt,
              readSegment(Magic ++ raw).toSeq)
          case PREVIOUS_GTIDS_LOG =>
            // payload: n_sids(8 LE){ sid(16) n_ivs(8){ start(8) end(8)
            // EXCLUSIVE }} — converted to the inclusive canonical form
            val nSids = buf.getLong()
            val sets = (0L until nSids).map { _ =>
              val sid = uuidText(buf)
              val nIvs = buf.getLong()
              sid -> (0L until nIvs).map { _ =>
                val a = buf.getLong(); val b = buf.getLong()
                (a, b - 1)
              }
            }.toMap
            PreviousGtidsEvent(nextPos, GtidSet(sets))
          case MARIADB_ANNOTATE_ROWS =>
            val sqlB = new Array[Byte](dataEnd - buf.position())
            buf.get(sqlB)
            AnnotateRowsEvent(nextPos, new String(sqlB, StandardCharsets.UTF_8))
          case MARIADB_GTID_LIST =>
            val count = (buf.getInt() & 0x0fffffff) // low 28 bits
            MariaGtidListEvent(nextPos, (0 until count).map { _ =>
              val d = buf.getInt().toLong & 0xffffffffL
              val s = buf.getInt().toLong & 0xffffffffL
              val q = buf.getLong()
              (d, s, q)
            })
          case other =>
            SkippedEvent(nextPos, other)
        }
        buf.position(end)
        ev
      }
    }.flatMap {
      // compressed transactions splice their inner events in place —
      // downstream projections never see the container
      case TransactionPayloadEvent(_, _, inner) => inner
      case e => Seq(e)
    }
  }

  // ---------------------------------------------------------------- encode
  // Fixture author + round-trip oracle for the decoder (not a server).

  private def leBuf(size: Int) = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)

  private def putLenenc(b: ByteBuffer, v: Long): Unit =
    if (v < 0xfb) b.put(v.toByte)
    else if (v <= 0xffff) { b.put(0xfc.toByte); b.putShort(v.toShort) }
    else { b.put(0xfe.toByte); b.putLong(v) }

  private def putUint48(b: ByteBuffer, v: Long): Unit =
    (0 until 6).foreach(i => b.put(((v >> (8 * i)) & 0xff).toByte))

  private def putBitmap(b: ByteBuffer, bits: Seq[Boolean]): Unit = {
    val bytes = new Array[Byte]((bits.size + 7) / 8)
    bits.zipWithIndex.foreach { case (set, i) =>
      if (set) bytes(i / 8) = (bytes(i / 8) | (1 << (i % 8))).toByte
    }
    b.put(bytes)
  }

  private def writeGroup(b: ByteBuffer, v: Long, n: Int): Unit =
    ((n - 1) to 0 by -1).foreach(i => b.put(((v >> (8 * i)) & 0xff).toByte))

  private def encodeDecimal(b: ByteBuffer, precision: Int, scale: Int,
                            text: String): Unit = {
    val negative = text.startsWith("-")
    val t = text.stripPrefix("-")
    val (ip, fp) = t.span(_ != '.')
    val intDigits = precision - scale
    val intStr = ip.reverse.padTo(intDigits, '0').reverse
    val fracStr = fp.stripPrefix(".").padTo(scale, '0')
    val start = b.position()
    val leadDigits = intDigits % 9
    if (leadDigits > 0)
      writeGroup(b, intStr.take(leadDigits).toLong, DigitBytes(leadDigits))
    intStr.drop(leadDigits).grouped(9).foreach(g => writeGroup(b, g.toLong, 4))
    fracStr.take((scale / 9) * 9).grouped(9).foreach(g => writeGroup(b, g.toLong, 4))
    val tailDigits = scale % 9
    if (tailDigits > 0)
      writeGroup(b, fracStr.drop((scale / 9) * 9).toLong, DigitBytes(tailDigits))
    b.put(start, (b.get(start) ^ 0x80).toByte)
    if (negative)
      (start until b.position()).foreach(i => b.put(i, (~b.get(i)).toByte))
  }

  private def encodeDatetime2(b: ByteBuffer, dt: Dt): Unit = {
    val v = (1L << 39) | ((dt.year * 13L + dt.month) << 22) |
      (dt.day.toLong << 17) | (dt.hour.toLong << 12) |
      (dt.minute.toLong << 6) | dt.second.toLong
    writeGroup(b, v, 5)
    fracBytes(dt.fsp) match {
      case 0 => ()
      case 1 => writeGroup(b, dt.micros / 10000L, 1)
      case 2 => writeGroup(b, dt.micros / 100L, 2)
      case _ => writeGroup(b, dt.micros.toLong, 3)
    }
  }

  private def putBe(b: ByteBuffer, v: Long, n: Int): Unit =
    (n - 1 to 0 by -1).foreach(i => b.put(((v >> (8 * i)) & 0xff).toByte))

  /** Inverse of [[decodeTime2]]: fold the sign into the packed value,
    * then split into the offset-binary int part and (for fsp 1-4) the
    * borrowing fractional byte(s).
    */
  private[graft] def encodeTime2(b: ByteBuffer, t: Tm): Unit = {
    val hms = (t.hour.toLong << 12) | (t.minute.toLong << 6) | t.second
    val packed0 = (hms << 24) + t.micros
    val packed = if (t.neg) -packed0 else packed0
    def split(scale: Long, modBase: Long): (Long, Long) =
      if (packed >= 0) (packed >> 24, (packed & 0xffffffL) / scale)
      else {
        val a = -packed
        val aInt = a >> 24; val aFrac = (a & 0xffffffL) / scale
        if (aFrac == 0) (-aInt, 0L) else (-aInt - 1, modBase - aFrac)
      }
    t.fsp match {
      case 0 => putBe(b, (packed >> 24) + 0x800000L, 3)
      case 1 | 2 =>
        val (i0, f0) = split(10000L, 0x100L)
        putBe(b, i0 + 0x800000L, 3); putBe(b, f0, 1)
      case 3 | 4 =>
        val (i0, f0) = split(100L, 0x10000L)
        putBe(b, i0 + 0x800000L, 3); putBe(b, f0, 2)
      case _ => putBe(b, packed + 0x800000000000L, 6)
    }
  }

  private def encodeTimestamp2(b: ByteBuffer, dt: Dt): Unit = {
    val sec = java.time.LocalDateTime.of(dt.year, dt.month, dt.day,
      dt.hour, dt.minute, dt.second).toEpochSecond(java.time.ZoneOffset.UTC)
    putBe(b, sec, 4)
    fracBytes(dt.fsp) match {
      case 0 => ()
      case 1 => putBe(b, dt.micros / 10000L, 1)
      case 2 => putBe(b, dt.micros / 100L, 2)
      case _ => putBe(b, dt.micros.toLong, 3)
    }
  }

  private def putCell(b: ByteBuffer, colType: Int, meta: Int, v: Any): Unit =
    (colType, v) match {
      case (TYPE_TINY, i: Int) => b.put(i.toByte)
      case (TYPE_SHORT, i: Int) => b.putShort(i.toShort)
      case (TYPE_LONG, i: Int) => b.putInt(i)
      case (TYPE_LONGLONG, l: Long) => b.putLong(l)
      case (TYPE_INT24, i: Int) =>
        b.put((i & 0xff).toByte); b.put(((i >> 8) & 0xff).toByte)
        b.put(((i >> 16) & 0xff).toByte)
      case (TYPE_FLOAT, f: Float) => b.putInt(java.lang.Float.floatToIntBits(f))
      case (TYPE_DOUBLE, d: Double) => b.putLong(java.lang.Double.doubleToLongBits(d))
      case (TYPE_YEAR, y: Int) => b.put((if (y == 0) 0 else y - 1900).toByte)
      case (TYPE_DATE, dt: Dt) =>
        val v = (dt.year << 9) | (dt.month << 5) | dt.day
        b.put((v & 0xff).toByte); b.put(((v >> 8) & 0xff).toByte)
        b.put(((v >> 16) & 0xff).toByte)
      case (TYPE_DATETIME2, dt: Dt) => encodeDatetime2(b, dt)
      case (TYPE_NEWDECIMAL, Dec(t)) => encodeDecimal(b, meta >> 8, meta & 0xff, t)
      case (TYPE_BLOB, bytes: Array[Byte]) =>
        (0 until meta).foreach(i => b.put(((bytes.length >> (8 * i)) & 0xff).toByte))
        b.put(bytes)
      case (TYPE_JSON, jv: JsonVal) =>
        val bytes = encodeJsonBinary(jv)
        (0 until meta).foreach(i => b.put(((bytes.length >> (8 * i)) & 0xff).toByte))
        b.put(bytes)
      case (TYPE_GEOMETRY, Geom(srid, wkb)) =>
        val len = wkb.length + 4
        (0 until meta).foreach(i => b.put(((len >> (8 * i)) & 0xff).toByte))
        (0 until 4).foreach(i => b.put(((srid >> (8 * i)) & 0xff).toByte))
        b.put(wkb)
      case (TYPE_VARCHAR, s: String) =>
        val bytes = s.getBytes(StandardCharsets.UTF_8)
        if (meta < 256) b.put(bytes.length.toByte) else b.putShort(bytes.length.toShort)
        b.put(bytes)
      case (TYPE_TIME2, t: Tm) => encodeTime2(b, t)
      case (TYPE_TIMESTAMP2, dt: Dt) => encodeTimestamp2(b, dt)
      case (TYPE_BIT, v: Long) => putBe(b, v, (meta + 7) / 8)
      case (TYPE_STRING, value) => (stringRealType(meta), value) match {
        case ((TYPE_STRING, len), s: String) =>
          val bytes = s.getBytes(StandardCharsets.UTF_8)
          if (len < 256) b.put(bytes.length.toByte)
          else b.putShort(bytes.length.toShort)
          b.put(bytes)
        case ((TYPE_ENUM, len), EnumV(ord)) =>
          if (len == 1) b.put(ord.toByte) else b.putShort(ord.toShort)
        case ((TYPE_SET, len), SetV(mask)) =>
          (0 until len).foreach(i => b.put(((mask >> (8 * i)) & 0xff).toByte))
        case other2 => throw new IllegalArgumentException(
          s"can't encode string-typed $other2")
      }
      case other => throw new IllegalArgumentException(s"can't encode $other")
    }

  private def putRow(b: ByteBuffer, map: TableMap, present: Seq[Boolean],
                     row: Row): Unit = {
    val presentCells = row.cells.indices.filter(present)
    putBitmap(b, presentCells.map(i => row.cells(i).isEmpty))
    presentCells.foreach { i =>
      row.cells(i).foreach(v => putCell(b, map.colTypes(i), map.colMeta(i), v))
    }
  }

  private def event(kind: Int, nextPos: Long, body: Array[Byte]): Array[Byte] = {
    val b = leBuf(19 + body.length)
    b.putInt(1700000000)            // timestamp
    b.put(kind.toByte)
    b.putInt(1)                     // server id
    b.putInt(19 + body.length)      // event size
    b.putInt(nextPos.toInt)
    b.putShort(0)                   // flags
    b.put(body)
    b.array()
  }

  def encodeTableMap(nextPos: Long, map: TableMap): Array[Byte] = {
    val b = leBuf(4096)
    putUint48(b, map.tableId); b.putShort(1)
    val sb = map.schema.getBytes(StandardCharsets.UTF_8)
    val tb = map.table.getBytes(StandardCharsets.UTF_8)
    b.put(sb.length.toByte); b.put(sb); b.put(0.toByte)
    b.put(tb.length.toByte); b.put(tb); b.put(0.toByte)
    putLenenc(b, map.colTypes.size)
    map.colTypes.foreach(t => b.put(t.toByte))
    val metaBytes = leBuf(2 * map.colTypes.size)
    map.colTypes.zip(map.colMeta).foreach {
      case (TYPE_VARCHAR, m) => metaBytes.putShort(m.toShort)
      case (TYPE_FLOAT | TYPE_DOUBLE | TYPE_BLOB | TYPE_DATETIME2 |
            TYPE_JSON | TYPE_GEOMETRY | TYPE_TIMESTAMP2 | TYPE_TIME2, m) =>
        metaBytes.put(m.toByte)
      case (TYPE_NEWDECIMAL | TYPE_STRING, m) =>
        metaBytes.put(((m >> 8) & 0xff).toByte); metaBytes.put((m & 0xff).toByte)
      case (TYPE_BIT, m) => // bits%8 byte, bytes byte
        metaBytes.put((m % 8).toByte); metaBytes.put((m / 8).toByte)
      case _ => ()
    }
    val meta = new Array[Byte](metaBytes.position()); metaBytes.flip(); metaBytes.get(meta)
    putLenenc(b, meta.length); b.put(meta)
    putBitmap(b, map.colTypes.map(_ => true)) // all nullable
    // WL#4618 optional metadata, when the map carries it
    def tlv(fieldType: Int, bytes: Array[Byte]): Unit = {
      b.put(fieldType.toByte); putLenenc(b, bytes.length.toLong); b.put(bytes)
    }
    if (map.unsigned.exists(identity)) {
      val numericIdx = map.colTypes.indices.filter(i => isNumericType(map.colTypes(i)))
      val bits = new Array[Byte]((numericIdx.size + 7) / 8)
      numericIdx.zipWithIndex.foreach { case (col, bit) =>
        if (map.unsigned(col))
          bits(bit / 8) = (bits(bit / 8) | (0x80 >> (bit % 8))).toByte
      }
      tlv(META_SIGNEDNESS, bits)
    }
    if (map.names.nonEmpty) {
      val nb = leBuf(2048)
      map.names.foreach { n =>
        val s = n.getBytes(StandardCharsets.UTF_8)
        putLenenc(nb, s.length.toLong); nb.put(s)
      }
      val bytes = new Array[Byte](nb.position()); nb.flip(); nb.get(bytes)
      tlv(META_COLUMN_NAME, bytes)
    }
    if (map.primaryKey.nonEmpty) {
      val kb = leBuf(64)
      map.primaryKey.foreach(i => putLenenc(kb, i.toLong))
      val bytes = new Array[Byte](kb.position()); kb.flip(); kb.get(bytes)
      tlv(META_SIMPLE_PRIMARY_KEY, bytes)
    }
    def strValueTlv(fieldType: Int, realType: Int,
                    values: Map[Int, Seq[String]]): Unit = {
      val cols = map.colTypes.indices.filter(i =>
        map.colTypes(i) == TYPE_STRING &&
          stringRealType(map.colMeta(i))._1 == realType)
      if (cols.nonEmpty && values.nonEmpty) {
        val vb = leBuf(4096)
        cols.foreach { col =>
          val vs = values.getOrElse(col, Nil)
          putLenenc(vb, vs.size.toLong)
          vs.foreach { v =>
            val sb2 = v.getBytes(StandardCharsets.UTF_8)
            putLenenc(vb, sb2.length.toLong); vb.put(sb2)
          }
        }
        val bytes = new Array[Byte](vb.position()); vb.flip(); vb.get(bytes)
        tlv(fieldType, bytes)
      }
    }
    strValueTlv(META_SET_STR_VALUE, TYPE_SET, map.setValues)
    strValueTlv(META_ENUM_STR_VALUE, TYPE_ENUM, map.enumValues)
    val body = new Array[Byte](b.position()); b.flip(); b.get(body)
    event(TABLE_MAP, nextPos, body)
  }

  /** Fixture FORMAT_DESCRIPTION: binlog v4, a post_header_len array
    * whose own entry locates the checksum block (the reader's detection
    * path), and the declared `binlog_checksum` algorithm. With CRC32 the
    * FDE carries its own checksum like every later event.
    */
  def encodeFormatDescription(checksumAlg: Int = ChecksumNone,
                              nextPos: Long = 0L): Array[Byte] = {
    val nEntries = 41 // covers event types 1..41 (≥ TRANSACTION_PAYLOAD)
    val b = leBuf(2 + 50 + 4 + 1 + nEntries + 1)
    b.putShort(4)
    val ver = "8.0.36".getBytes(StandardCharsets.UTF_8)
    b.put(ver); (ver.length until 50).foreach(_ => b.put(0.toByte))
    b.putInt(1700000000) // create timestamp
    b.put(19.toByte)     // common header length
    val dataLen = 2 + 50 + 4 + 1 + nEntries
    (1 to nEntries).foreach { t =>
      b.put((if (t == FORMAT_DESCRIPTION) dataLen else 0).toByte)
    }
    b.put(checksumAlg.toByte)
    val body = new Array[Byte](b.position()); b.flip(); b.get(body)
    val ev = event(FORMAT_DESCRIPTION, nextPos, body)
    if (checksumAlg == ChecksumCrc32) appendCrc32(ev) else ev
  }

  /** Append the WL#2540 event checksum: grow eventSize by 4 and add the
    * CRC32 of the adjusted header+body, little-endian.
    */
  def appendCrc32(ev: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(ev, ev.length + 4)
    val size = ev.length + 4
    out(9) = (size & 0xff).toByte; out(10) = ((size >> 8) & 0xff).toByte
    out(11) = ((size >> 16) & 0xff).toByte; out(12) = ((size >> 24) & 0xff).toByte
    val c = new java.util.zip.CRC32(); c.update(out, 0, ev.length)
    val v = c.getValue
    out(ev.length) = (v & 0xff).toByte
    out(ev.length + 1) = ((v >> 8) & 0xff).toByte
    out(ev.length + 2) = ((v >> 16) & 0xff).toByte
    out(ev.length + 3) = ((v >> 24) & 0xff).toByte
    out
  }

  /** A segment in checksummed framing: magic, FDE declaring CRC32, then
    * every event CRC32-suffixed — what a real `binlog_checksum=CRC32`
    * server (the 5.6.6+ default) writes.
    */
  def writeSegmentCrc(events: Seq[Array[Byte]]): Array[Byte] =
    writeSegment(encodeFormatDescription(ChecksumCrc32) +:
      events.map(appendCrc32))

  /** Fixture encoder for PARTIAL_UPDATE_ROWS: each row = (full before
    * image, after image whose non-partial cells carry values, partial
    * diffs per JSON column index). Partial JSON cells encode the diff
    * sequence under the usual blob-style length prefix.
    */
  def encodePartialUpdateRows(nextPos: Long, map: TableMap,
      rows: Seq[(Row, Row, Map[Int, Seq[JsonDiff]])]): Array[Byte] = {
    val b = leBuf(1 << 20)
    putUint48(b, map.tableId); b.putShort(0)
    b.putShort(2)
    putLenenc(b, map.colTypes.size.toLong)
    val present = map.colTypes.map(_ => true)
    putBitmap(b, present); putBitmap(b, present)
    val jsonCols = map.colTypes.indices.filter(i => map.colTypes(i) == TYPE_JSON)
    rows.foreach { case (beforeRow, afterRow, diffs) =>
      putRow(b, map, present, beforeRow)
      putLenenc(b, 1L) // value_options: PARTIAL_JSON
      putBitmap(b, jsonCols.map(diffs.contains))
      // after image: null bitmap + cells, diff sequences for partial cols
      val presentCells = afterRow.cells.indices.filter(present)
      putBitmap(b, presentCells.map(i =>
        afterRow.cells(i).isEmpty && !diffs.contains(i)))
      presentCells.foreach { i =>
        if (diffs.contains(i)) {
          val body = leBuf(1 << 16)
          diffs(i).foreach { d =>
            body.put(d.op.toByte)
            val pb = d.path.getBytes(StandardCharsets.UTF_8)
            putLenenc(body, pb.length.toLong); body.put(pb)
            d.value.foreach { v =>
              val vb = encodeJsonBinary(v)
              putLenenc(body, vb.length.toLong); body.put(vb)
            }
          }
          val bytes = new Array[Byte](body.position()); body.flip(); body.get(bytes)
          val meta = map.colMeta(i)
          (0 until meta).foreach(k =>
            b.put(((bytes.length >> (8 * k)) & 0xff).toByte))
          b.put(bytes)
        } else afterRow.cells(i).foreach(v =>
          putCell(b, map.colTypes(i), map.colMeta(i), v))
      }
    }
    val body = new Array[Byte](b.position()); b.flip(); b.get(body)
    event(PARTIAL_UPDATE_ROWS, nextPos, body)
  }

  def encodeRows(kind: Int, nextPos: Long, map: TableMap,
                 rows: Seq[Row], afterRows: Seq[Row] = Seq.empty): Array[Byte] = {
    val b = leBuf(1 << 20)
    putUint48(b, map.tableId); b.putShort(0)
    b.putShort(2) // extraLen: no extra payload
    putLenenc(b, map.colTypes.size)
    val present = map.colTypes.map(_ => true)
    putBitmap(b, present)
    if (kind == UPDATE_ROWS_V2) putBitmap(b, present)
    if (kind == UPDATE_ROWS_V2)
      rows.zip(afterRows).foreach { case (before, after) =>
        putRow(b, map, present, before); putRow(b, map, present, after)
      }
    else rows.foreach(putRow(b, map, present, _))
    val body = new Array[Byte](b.position()); b.flip(); b.get(body)
    event(kind, nextPos, body)
  }

  def encodeXid(nextPos: Long, xid: Long): Array[Byte] = {
    val b = leBuf(8); b.putLong(xid)
    event(XID, nextPos, b.array())
  }

  def encodeMariaGtid(nextPos: Long, domain: Long, seqNo: Long,
                      standalone: Boolean = false): Array[Byte] = {
    val b = leBuf(13)
    b.putLong(seqNo); b.putInt(domain.toInt)
    b.put((if (standalone) FL_STANDALONE else 0).toByte)
    event(MARIADB_GTID, nextPos, b.array())
  }

  def encodeAnnotateRows(nextPos: Long, sql: String): Array[Byte] =
    event(MARIADB_ANNOTATE_ROWS, nextPos, sql.getBytes(StandardCharsets.UTF_8))

  def encodeTransactionPayload(nextPos: Long,
                               innerEvents: Seq[Array[Byte]],
                               compress: Boolean = true): Array[Byte] = {
    val inner = innerEvents.flatten.toArray
    val raw =
      if (compress) com.github.luben.zstd.Zstd.compress(inner, 3)
      else inner
    def lenencBytes(v: Long): Array[Byte] = {
      val b = leBuf(9); putLenenc(b, v)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    val fields = new ByteArrayOutputStream()
    def field(t: Long, value: Long): Unit = {
      val vb = lenencBytes(value)
      fields.write(lenencBytes(t))
      fields.write(lenencBytes(vb.length.toLong))
      fields.write(vb)
    }
    field(2, if (compress) CompressZstd.toLong else CompressNone.toLong)
    if (compress) field(3, inner.length.toLong)
    field(1, raw.length.toLong)
    fields.write(lenencBytes(0L)) // HEADER_END_MARK
    val hdr = fields.toByteArray
    val b = leBuf(hdr.length + raw.length)
    b.put(hdr); b.put(raw)
    event(TRANSACTION_PAYLOAD, nextPos, b.array())
  }

  def encodeQuery(nextPos: Long, database: String, sql: String): Array[Byte] = {
    val dB = database.getBytes(StandardCharsets.UTF_8)
    val qB = sql.getBytes(StandardCharsets.UTF_8)
    val b = leBuf(4 + 4 + 1 + 2 + 2 + dB.length + 1 + qB.length)
    b.putInt(0) // thread id
    b.putInt(0) // execution time
    b.put(dB.length.toByte)
    b.putShort(0) // error code
    b.putShort(0) // no status vars
    b.put(dB); b.put(0.toByte); b.put(qB)
    event(QUERY, nextPos, b.array())
  }

  def encodeRowsQuery(nextPos: Long, sql: String): Array[Byte] = {
    val qB = sql.getBytes(StandardCharsets.UTF_8)
    val b = leBuf(1 + qB.length)
    b.put(math.min(qB.length, 255).toByte)
    b.put(qB)
    event(ROWS_QUERY, nextPos, b.array())
  }

  def encodeMySqlGtid(nextPos: Long, sid: String, gno: Long,
                      lastCommitted: Long = 0L, seqNo: Long = 0L,
                      anonymous: Boolean = false): Array[Byte] = {
    val b = leBuf(1 + 16 + 8 + 17)
    b.put(1.toByte)            // commit flag
    b.put(uuidBytes(sid))
    b.putLong(gno)
    b.put(2.toByte)            // logical-clock typecode
    b.putLong(lastCommitted)
    b.putLong(seqNo)
    event(if (anonymous) ANONYMOUS_GTID_LOG else GTID_LOG, nextPos, b.array())
  }

  /** The executed-set binary form shared by PREVIOUS_GTIDS_LOG_EVENT and
    * the COM_BINLOG_DUMP_GTID command payload: n_sids(8 LE){ sid(16)
    * n_ivs(8){ start(8) end(8) EXCLUSIVE }}.
    */
  def encodeGtidSetBody(set: GtidSet): Array[Byte] = {
    val ivCount = set.sets.valuesIterator.map(_.size).sum
    val b = leBuf(8 + set.sets.size * 24 + ivCount * 16)
    b.putLong(set.sets.size.toLong)
    set.sets.toSeq.sortBy(_._1).foreach { case (sid, ivs) =>
      b.put(uuidBytes(sid))
      b.putLong(ivs.size.toLong)
      ivs.foreach { case (a, inclB) => b.putLong(a); b.putLong(inclB + 1) }
    }
    java.util.Arrays.copyOf(b.array(), b.position())
  }

  def decodeGtidSetBody(bytes: Array[Byte]): GtidSet = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nSids = b.getLong()
    GtidSet((0L until nSids).map { _ =>
      val sid = uuidText(b)
      val nIvs = b.getLong()
      sid -> (0L until nIvs).map { _ =>
        val a = b.getLong(); val e = b.getLong()
        (a, e - 1)
      }
    }.toMap)
  }

  def encodePreviousGtids(nextPos: Long, set: GtidSet): Array[Byte] =
    event(PREVIOUS_GTIDS_LOG, nextPos, encodeGtidSetBody(set))

  def encodeMariaGtidList(nextPos: Long,
                          gtids: Seq[(Long, Long, Long)]): Array[Byte] = {
    val b = leBuf(4 + gtids.size * 16)
    b.putInt(gtids.size)
    gtids.foreach { case (d, s, q) =>
      b.putInt(d.toInt); b.putInt(s.toInt); b.putLong(q)
    }
    event(MARIADB_GTID_LIST, nextPos, b.array())
  }

  def writeSegment(events: Seq[Array[Byte]]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(Magic)
    events.foreach(o.write)
    o.toByteArray
  }

  // ------------------------------------------------- wire-row projection

  private def jsonString(s: String): String = JsonText.jsonString(s)

  private def jsonCell(v: Option[Any]): String = v match {
    case None => "null"
    case Some(i: Int) => i.toString
    case Some(l: Long) => l.toString
    case Some(f: Float) => f.toString
    case Some(d: Double) => d.toString
    case Some(Dec(t)) => t            // exact digits, unquoted
    case Some(Js(text)) => text       // decoded JSON subtree, verbatim
    case Some(dt: Dt) => jsonString(dt.toString)
    case Some(t: Tm) => jsonString(t.toString)
    case Some(Geom(srid, wkb)) => // the reference's geometry struct shape
      s"""{"srid":$srid,"wkb":${jsonString(
        java.util.Base64.getEncoder.encodeToString(wkb))}}"""
    case Some(b: Array[Byte]) =>
      jsonString(java.util.Base64.getEncoder.encodeToString(b))
    case Some(s: String) => jsonString(s)
    case Some(other) => jsonString(other.toString)
  }

  private def jsonObject(names: Seq[String], row: Row,
                         only: Option[Set[Int]] = None): String =
    names.zipWithIndex
      .filter { case (_, i) => only.forall(_.contains(i)) }
      .map { case (n, i) => s"${jsonString(n)}:${jsonCell(row.cells(i))}" }
      .mkString("{", ",", "}")

  /** Resolve binlog column names + key indices from schema-history DDL
    * (semicolon-separated CREATE TABLE statements) — the reference's
    * split: row events are positional, names and keys live in the
    * replayed schema history (`relational/history/SchemaHistory`).
    */
  def schemasFromDdl(ddl: String): (Map[String, Seq[String]], Map[String, Seq[Int]]) = {
    // fold in order so CREATE…LIKE resolves against earlier statements;
    // out-of-subset statements follow the skip policy (warn + skip)
    // instead of throwing out of the partition read
    val names = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    val keys = scala.collection.mutable.LinkedHashMap[String, Seq[Int]]()
    def full(t: graft.model.Envelope.TableId): String =
      Seq(Option(t.catalog), Option(t.schema), Some(t.table))
        .flatten.mkString(".")
    ddl.split(";").map(_.trim).filter(_.nonEmpty).foreach { s =>
      graft.model.DdlParser.parseWithPolicy(s, skipUnparseable = true) match {
        case graft.model.DdlParser.Applied(
            ct: graft.model.DdlParser.CreateTable) =>
          val cols = ct.schema.fieldNames.toSeq
          val pk = graft.model.DdlParser.primaryKeyOf(s)
            .map(cols.indexOf).filter(_ >= 0)
          names(full(ct.table)) = cols
          keys(full(ct.table)) = if (pk.nonEmpty) pk else Seq(0)
        case graft.model.DdlParser.Applied(
            lk: graft.model.DdlParser.CreateTableLike) =>
          names.get(full(lk.source)).foreach(names(full(lk.table)) = _)
          keys.get(full(lk.source)).foreach(keys(full(lk.table)) = _)
        case _ => ()
      }
    }
    (names.toMap, keys.toMap)
  }

  /** Column names for projection: explicit (schema-history) names win,
    * then WL#4618 COLUMN_NAME metadata carried on the wire
    * (`binlog_row_metadata=FULL`), then positional `c<i>`. */
  private def namesOf(m: TableMap): Seq[String] =
    if (m.names.nonEmpty) m.names else m.colTypes.indices.map(i => s"c$i")

  /** Key columns: explicit indices win, then the wire's
    * SIMPLE_PRIMARY_KEY metadata, then column 0. */
  private def keysOf(m: TableMap): Seq[Int] =
    if (m.primaryKey.nonEmpty) m.primaryKey else Seq(0)

  /** An unqualified DDL table name resolves against the QUERY event's
    * session default schema, exactly as mysqld executed it.
    */
  private def qualifiedName(db: String, t: graft.model.Envelope.TableId): String = {
    val parts = Seq(Option(t.catalog), Option(t.schema), Some(t.table)).flatten
    if (parts.size == 1 && db.nonEmpty) s"$db.${t.table}"
    else parts.mkString(".")
  }

  /** The schema-change feed — the reference's schema-change topic
    * (`include.schema.changes=true`: `HistorizedRelationalDatabaseSchema`
    * emits one SchemaChangeEvent per applied DDL, carrying the source
    * position, database, affected table and the raw statement). QUERY
    * events whose statement parses as DDL project to
    * (pos, database, table, kind, ddl); transaction markers (BEGIN) and
    * other non-DDL statements are skipped, like the reference's filter
    * on its DDL parser results.
    */
  def schemaChangeRows(bytes: Array[Byte],
                       skipUnparseableDdl: Boolean = true)
  : Seq[(Long, String, String, String, String)] = {
    import graft.model.DdlParser
    readSegment(bytes).collect { case QueryEvent(pos, db, sql) =>
      (pos, db, sql)
    }.flatMap { case (pos, db, sql) =>
      DdlParser.parseWithPolicy(sql, skipUnparseableDdl) match {
        case DdlParser.Applied(p) =>
          val kind = p match {
            case _: DdlParser.CreateTable => "CREATE"
            case _: DdlParser.CreateTableLike => "CREATE"
            case _: DdlParser.AlterTable => "ALTER"
            case _: DdlParser.DropTable => "DROP"
            case _: DdlParser.RenameTable => "RENAME"
            case _: DdlParser.TruncateTable => "TRUNCATE"
          }
          Some((pos, db, qualifiedName(db, p.table), kind, sql))
        // non-DDL (BEGIN, DML) is filtered; unparseable DDL follows the
        // policy — skip mode already warned, strict mode threw above
        case _ => None
      }
    }.toSeq
  }

  /** Replay one in-stream statement (QUERY event) onto the name/key
    * registry — mid-segment schema evolution, the reference's
    * schema-history mechanism: a CREATE seeds names + pk, an ALTER
    * ADD/DROP/RENAME COLUMN rewrites the known column list (key indices
    * shift when an earlier column drops), RENAME/DROP TABLE move or
    * retire the entry. Non-DDL statements (BEGIN, SET, DML) and ALTERs
    * on tables with no known schema are ignored, as is TRUNCATE (no
    * schema change). Evolution only rewrites the registry — later row
    * events against a post-DDL TABLE_MAP resolve their names from it.
    */
  private[graft] def applyDdl(
      db: String, sql: String,
      names: scala.collection.mutable.Map[String, Seq[String]],
      keys: scala.collection.mutable.Map[String, Seq[Int]],
      skipUnparseableDdl: Boolean = true): Unit = {
    import graft.model.{DdlParser, Envelope}
    import graft.operators.SchemaEvolution.{AddColumn, DropColumn, RenameColumn}
    def qual(t: Envelope.TableId): String = qualifiedName(db, t)
    val parsed = DdlParser.parseWithPolicy(sql, skipUnparseableDdl) match {
      case DdlParser.Applied(p) => p
      case DdlParser.NotDdl => return // BEGIN / SET / DML: never a schema op
      case DdlParser.SkippedUnparseable(t, _) =>
        // mark the table STALE: drop its registry entries so later row
        // events resolve from wire metadata / positional names instead
        // of a column list we know is out of date (the reference's
        // skip.unparseable.ddl leaves its history silent the same way)
        t.foreach { tid =>
          val full = qual(tid)
          names.remove(full); keys.remove(full): Unit
        }
        return
    }
    parsed match {
      case DdlParser.CreateTable(t, schema) =>
        val full = qual(t)
        val cols = schema.fieldNames.toSeq
        names(full) = cols
        val pk = DdlParser.primaryKeyOf(sql).map(cols.indexOf).filter(_ >= 0)
        keys(full) = if (pk.nonEmpty) pk else Seq(0)
      case DdlParser.CreateTableLike(t, src) =>
        // the new table copies the source's CURRENT registry shape; an
        // unknown source leaves the table unseeded (rows fall back to
        // wire metadata / positional names, same as any unseen table)
        val full = qual(t); val from = qual(src)
        names.get(from).foreach(names(full) = _)
        keys.get(from).foreach(keys(full) = _)
      case DdlParser.AlterTable(t, changes) =>
        val full = qual(t)
        names.get(full).foreach { cur0 =>
          var cur = cur0
          changes.foreach {
            case AddColumn(n, _) => cur = cur :+ n
            case DropColumn(n) =>
              val at = cur.indexOf(n)
              if (at >= 0) {
                cur = cur.patch(at, Nil, 1)
                keys.get(full).foreach(ks => keys(full) =
                  ks.filter(_ != at).map(k => if (k > at) k - 1 else k))
              }
            case RenameColumn(from, to) =>
              cur = cur.map(c => if (c == from) to else c)
            case _ => () // type widening does not move names
          }
          names(full) = cur
        }
      case DdlParser.RenameTable(from0, to0) =>
        val from = qual(from0); val to = qual(to0)
        names.remove(from).foreach(names(to) = _)
        keys.remove(from).foreach(keys(to) = _)
      case DdlParser.DropTable(t) =>
        val full = qual(t)
        names.remove(full); keys.remove(full): Unit
      case _: DdlParser.TruncateTable => ()
    }
  }

  /** Project a binlog segment to ChangeLogSource wire rows.
    *
    * With `binlog_row_metadata=MINIMAL` (the server default) the binlog
    * carries no name/key metadata — the reference resolves both from its
    * schema history — so `colNames`/`keyCols` supply them per table.
    * With FULL metadata (WL#4618) the TABLE_MAP itself carries
    * COLUMN_NAME and SIMPLE_PRIMARY_KEY fields, which are used when no
    * explicit entry is given; the last fallback is positional `c<i>`
    * names and key = column 0. `pos` is the event's end-position
    * (`nextPos`), monotonic in a file. In-stream DDL (QUERY events)
    * evolves the name/key registry mid-segment via [[applyDdl]], so rows
    * after an ALTER resolve against the post-ALTER column list.
    */
  def segmentRows(bytes: Array[Byte],
                  colNames: Map[String, Seq[String]],
                  keyCols: Map[String, Seq[Int]] = Map.empty): Iterator[PgOutput.WireRow] = {
    val maps = scala.collection.mutable.Map[Long, TableMap]()
    val nameState = scala.collection.mutable.Map.from(colNames)
    val keyState = scala.collection.mutable.Map.from(keyCols)
    readSegment(bytes).flatMap {
      case TableMapEvent(_, m) => maps(m.tableId) = m; Nil
      case QueryEvent(_, db, sql) => applyDdl(db, sql, nameState, keyState); Nil
      case RowsEvent(pos, kind, tableId, rows, afterRows) =>
        val m = maps(tableId)
        val full = s"${m.schema}.${m.table}"
        val names = nameState.getOrElse(full, namesOf(m))
        val kidx = keyState.getOrElse(full, keysOf(m)).toSet
        kind match {
          case WRITE_ROWS_V2 => rows.map(r => PgOutput.WireRow(full, "c", pos,
            jsonObject(names, r, Some(kidx)), jsonObject(names, r)))
          case UPDATE_ROWS_V2 | PARTIAL_UPDATE_ROWS =>
            afterRows.map(r => PgOutput.WireRow(full, "u", pos,
              jsonObject(names, r, Some(kidx)), jsonObject(names, r)))
          case DELETE_ROWS_V2 => rows.map(r => PgOutput.WireRow(full, "d", pos,
            jsonObject(names, r, Some(kidx)), "null"))
          case _ => Nil
        }
      case _ => Nil
    }
  }

  /** MySQL-GTID projection (reference `debezium-connector-mysql` +
    * `debezium-connector-binlog/gtid/`): row events carry the OWNING
    * gtid (`sid:gno` — the GTID_LOG_EVENT opens the transaction, XID
    * closes it; anonymous groups carry ""), and `sourceFilter` applies
    * the reference's `gtid.source.includes`/`excludes` server-UUID
    * projection — a filtered-out transaction's row events are DROPPED
    * WHOLESALE, exactly as the reference skips events between a
    * non-matching GTID and its terminator. Row events also carry the
    * ROWS_QUERY statement text that produced them (MySQL's
    * `binlog_rows_query_log_events`, the reference's `include.query` —
    * reset at group boundaries like MariaDB's ANNOTATE_ROWS). Returns
    * the rows plus the PREVIOUS_GTIDS executed set seen at the segment
    * head (the resume position MySQL hands to `COM_BINLOG_DUMP_GTID`).
    */
  def segmentRowsGtid(bytes: Array[Byte],
                      colNames: Map[String, Seq[String]],
                      keyCols: Map[String, Seq[Int]] = Map.empty,
                      sourceFilter: String => Boolean = _ => true)
  : (Seq[(PgOutput.WireRow, String, String)], GtidSet) = {
    val maps = scala.collection.mutable.Map[Long, TableMap]()
    var gtid = ""
    var query = ""
    var admitted = true
    var previous = GtidSet.empty
    val out = Seq.newBuilder[(PgOutput.WireRow, String, String)]
    readSegment(bytes).foreach {
      case TableMapEvent(_, m) => maps(m.tableId) = m
      case g: MySqlGtidEvent =>
        gtid = g.gtid
        query = "" // a new group resets the statement text
        admitted = g.anonymous || sourceFilter(g.sid)
      case RowsQueryEvent(_, sql) => query = sql
      case PreviousGtidsEvent(_, set) => previous = set
      case XidEvent(_, _) => gtid = ""; query = ""; admitted = true
      case RowsEvent(pos, kind, tableId, rows, afterRows) if admitted =>
        val m = maps(tableId)
        val full = s"${m.schema}.${m.table}"
        val names = colNames.getOrElse(full, namesOf(m))
        val kidx = keyCols.getOrElse(full, keysOf(m)).toSet
        val wireRows = kind match {
          case WRITE_ROWS_V2 => rows.map(r => PgOutput.WireRow(full, "c", pos,
            jsonObject(names, r, Some(kidx)), jsonObject(names, r)))
          case UPDATE_ROWS_V2 | PARTIAL_UPDATE_ROWS =>
            afterRows.map(r => PgOutput.WireRow(full, "u", pos,
              jsonObject(names, r, Some(kidx)), jsonObject(names, r)))
          case DELETE_ROWS_V2 => rows.map(r => PgOutput.WireRow(full, "d", pos,
            jsonObject(names, r, Some(kidx)), "null"))
          case _ => Nil
        }
        wireRows.foreach(w => out += ((w, gtid, query)))
      case _ => ()
    }
    (out.result(), previous)
  }

  /** MariaDB projection (reference `debezium-connector-mariadb`): row
    * events carry the OWNING GTID (`domain-server-seq` — the GTID event
    * opens the group, XID or a standalone flag closes it) and the
    * ANNOTATE_ROWS statement text that produced them. `gtidListJson`
    * surfaces the GTID_LIST replication state seen at the segment head
    * (the resume position a MariaDB client hands to
    * `BINLOG_GTID_DUMP`).
    */
  def segmentRowsMaria(bytes: Array[Byte],
                       colNames: Map[String, Seq[String]],
                       keyCols: Map[String, Seq[Int]] = Map.empty)
  : (Seq[(PgOutput.WireRow, String, String)], String) = {
    val maps = scala.collection.mutable.Map[Long, TableMap]()
    var gtid = ""
    var annotation = ""
    var gtidList = "[]"
    val out = Seq.newBuilder[(PgOutput.WireRow, String, String)]
    readSegment(bytes).foreach {
      case TableMapEvent(_, m) => maps(m.tableId) = m
      case g: MariaGtidEvent =>
        gtid = g.gtid
        annotation = "" // a new event group resets the statement text
      case AnnotateRowsEvent(_, sql) => annotation = sql
      case MariaGtidListEvent(_, gtids) =>
        gtidList = gtids.map { case (d, s, q) => s""""$d-$s-$q"""" }
          .mkString("[", ",", "]")
      case XidEvent(_, _) => annotation = ""
      case RowsEvent(pos, kind, tableId, rows, afterRows) =>
        val m = maps(tableId)
        val full = s"${m.schema}.${m.table}"
        val names = colNames.getOrElse(full, namesOf(m))
        val kidx = keyCols.getOrElse(full, keysOf(m)).toSet
        val wireRows = kind match {
          case WRITE_ROWS_V2 => rows.map(r => PgOutput.WireRow(full, "c", pos,
            jsonObject(names, r, Some(kidx)), jsonObject(names, r)))
          case UPDATE_ROWS_V2 | PARTIAL_UPDATE_ROWS =>
            afterRows.map(r => PgOutput.WireRow(full, "u", pos,
              jsonObject(names, r, Some(kidx)), jsonObject(names, r)))
          case DELETE_ROWS_V2 => rows.map(r => PgOutput.WireRow(full, "d", pos,
            jsonObject(names, r, Some(kidx)), "null"))
          case _ => Nil
        }
        wireRows.foreach(w => out += ((w, gtid, annotation)))
      case _ => ()
    }
    (out.result(), gtidList)
  }
}
