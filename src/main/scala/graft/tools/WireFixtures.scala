package graft.tools

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.sources.wire.{MySqlBinlog, PgOutput}

/** Deterministic recorded-wire fixtures — the byte streams a replication
  * client would have captured from a live server, authored once and
  * committed under `src/main/resources/graft/fixtures/`. The data is
  * FORMULA-derived (`i`, `i*7`, `'item_'||i` …) so the DuckDB oracle can
  * regenerate the expected decode output from `range()` with no parquet
  * input — the decoder is checked against an independent reconstruction,
  * not against itself.
  *
  * `main` re-emits the files; a spec asserts the committed bytes equal
  * this builder's output, so fixture and builder cannot drift apart.
  */
object WireFixtures {

  // ------------------------------------------------------------- pgoutput
  // Two relations, three transactions, TOAST marker, delete-by-key,
  // truncate, and a logical decoding message.

  val ItemsRel: PgOutput.Relation = PgOutput.Relation(5001, "public", "cdc_items", 'd',
    Seq(PgOutput.Column(1, "id", 23, -1),      // int4, key
      PgOutput.Column(0, "qty", 20, -1),       // int8
      PgOutput.Column(0, "label", 25, -1)))    // text

  val TagsRel: PgOutput.Relation = PgOutput.Relation(5002, "public", "cdc_tags", 'd',
    Seq(PgOutput.Column(1, "id", 23, -1),
      PgOutput.Column(0, "tag", 25, -1)))

  /** Array columns: int8[] (1016) and text[] (1009) — the canonical pg
    * array text forms (quoting, escapes, NULL, nesting) render as typed
    * JSON arrays.
    */
  val ArraysRel: PgOutput.Relation = PgOutput.Relation(5003, "public", "cdc_arrays", 'd',
    Seq(PgOutput.Column(1, "id", 23, -1),
      PgOutput.Column(0, "nums", 1016, -1),
      PgOutput.Column(0, "tags", 1009, -1)))

  def pgoutputSegment: Array[Byte] = {
    import PgOutput._
    val frames = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    def f(wal: Long, m: Message): Unit = frames += ((wal, encode(m)))

    f(999, Begin(1999, 770000000000000L, 501))
    f(999, ItemsRel)
    (0 until 40).foreach { i =>
      f(1000L + i, Insert(5001, Seq(
        VText(i.toString), VText((i * 7).toString), VText(s"item_$i"))))
    }
    f(1999, Commit(0, 1999, 2000, 770000000000000L))

    f(1999, Begin(2999, 770000001000000L, 502))
    (0 until 40).filter(_ % 5 == 0).foreach { i =>
      val label = if (i % 10 == 5) VUnchangedToast else VText(s"item_$i")
      f(2000L + i, Update(5001, None, None, Seq(
        VText(i.toString), VText((i * 7 + 1000).toString), label)))
    }
    f(2099, TagsRel)
    (0 until 10).foreach { i =>
      f(2100L + i, Insert(5002, Seq(
        VText(i.toString), VText(s"tag_${i % 3}"))))
    }
    f(2999, Commit(0, 2999, 3000, 770000001000000L))

    f(2999, Begin(4999, 770000002000000L, 503))
    (0 until 40).filter(_ % 6 == 0).foreach { i =>
      f(3000L + i, Delete(5001, 'K', Seq(
        VText(i.toString), VNull, VNull)))
    }
    f(4000, Truncate(0, Seq(5002)))
    f(4050, Truncate(3, Seq(5002))) // CASCADE | RESTART IDENTITY
    f(4100, LogicalMessage(1, 4100, "graft", "hello".getBytes("UTF-8")))
    f(4150, ArraysRel)
    (0 until 5).foreach { i =>
      f(4200L + i, Insert(5003, Seq(
        VText(i.toString),
        VText(s"{$i,${i * 10},NULL}"),
        VText(s"""{"a b","q\\"$i",plain$i}"""))))
    }
    f(4999, Commit(0, 4999, 5000, 770000002000000L))

    writeSegment(frames.toSeq)
  }

  /** Wire rows the pgoutput fixture decodes to (count for segment names). */
  def pgoutputRowCount: Long =
    PgOutput.segmentRows(pgoutputSegment).size.toLong

  /** Protocol v2 streamed-transaction fixture: txs 601 and 602 stream
    * their inserts in interleaved S..E chunks BEFORE any commit; 601
    * stream-commits at LSN 7000, 602 stream-aborts — its rows must
    * never release.
    */
  def pgoutputStreamedSegment: Array[Byte] = {
    import PgOutput._
    val frames = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    def f(wal: Long, m: Message): Unit = frames += ((wal, encode(m)))
    def ins(id: Int): Message = Insert(5001, Seq(
      VText(id.toString), VText((id * 3).toString), VText(s"s_$id")))

    f(5000, ItemsRel)
    f(5001, StreamStart(601, firstSegment = true))
    (0 until 5).foreach(i => f(6000L + i, Streamed(601, ins(100 + i))))
    f(5002, StreamStop)
    f(5003, StreamStart(602, firstSegment = true))
    (0 until 5).foreach(i => f(6500L + i, Streamed(602, ins(200 + i))))
    f(5004, StreamStop)
    f(5005, StreamStart(601, firstSegment = false))
    (5 until 10).foreach(i => f(6000L + i, Streamed(601, ins(100 + i))))
    f(5006, StreamStop)
    f(7000, StreamCommit(601, 0, 7000, 7001, 770000003000000L))
    f(5007, StreamStart(602, firstSegment = false))
    (5 until 8).foreach(i => f(6500L + i, Streamed(602, ins(200 + i))))
    f(5008, StreamStop)
    f(7100, StreamAbort(602, 602))
    writeSegment(frames.toSeq)
  }

  def pgoutputStreamedRowCount: Long =
    PgOutput.segmentRows(pgoutputStreamedSegment).size.toLong

  /** Binary-format tuples (PG 14+ `binary = true` subscriptions): every
    * column arrives as the type's `send()` wire bytes with tag 'b'.
    * Covers bool, int2/int8, float8, numeric (base-10000 wire format),
    * text, bytea, date, timestamp, uuid — plus the int4 key.
    */
  val BinRel: PgOutput.Relation = PgOutput.Relation(5004, "public", "cdc_bin", 'd',
    Seq(PgOutput.Column(1, "id", 23, -1),      // int4, key
      PgOutput.Column(0, "flag", 16, -1),      // bool
      PgOutput.Column(0, "s2", 21, -1),        // int2
      PgOutput.Column(0, "i8", 20, -1),        // int8
      PgOutput.Column(0, "f8", 701, -1),       // float8
      PgOutput.Column(0, "dec", 1700, -1),     // numeric
      PgOutput.Column(0, "name", 25, -1),      // text
      PgOutput.Column(0, "raw", 17, -1),       // bytea
      PgOutput.Column(0, "d", 1082, -1),       // date
      PgOutput.Column(0, "ts", 1114, -1),      // timestamp
      PgOutput.Column(0, "uid", 2950, -1)))    // uuid

  def pgoutputBinarySegment: Array[Byte] = {
    import PgOutput._
    def be16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).putShort(v.toShort).array()
    def be32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
    def be64(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()
    val pgEpochDay = java.time.LocalDate.of(2000, 1, 1).toEpochDay
    val pgEpoch = java.time.LocalDateTime.of(2000, 1, 1, 0, 0)

    val frames = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    def f(wal: Long, m: Message): Unit = frames += ((wal, encode(m)))
    f(7999, Begin(8999, 770000004000000L, 504))
    f(7999, BinRel)
    (0 until 12).foreach { i =>
      val sign = if (i % 4 == 3) "-" else ""
      val dec = f"$sign${i * 1234 + 7}%d.${i * 37}%03d"
      val day = java.time.LocalDate.of(2022, 3, 1).plusDays(i)
      val ts = java.time.LocalDateTime.of(2023, 5, 6, 7, 8, i,
        (i * 80000 + 40) * 1000)
      f(8000L + i, Insert(5004, Seq(
        VBinary(be32(i)),
        VBinary(Array((if (i % 2 == 0) 1 else 0).toByte)),
        VBinary(be16(i * 3 - 5)),
        VBinary(be64(3000000000L + i)),
        // i=7/i=10 pin the scientific renderings ('1.25e+23'/'2.5e-07'
        // in PG text form, not Java's '1.25E23'/'2.5E-7')
        VBinary(be64(java.lang.Double.doubleToLongBits(
          if (i == 7) 1.25e23 else if (i == 10) 2.5e-7 else i + 0.5))),
        VBinary(numericStringToBinary(dec)),
        VBinary(s"bin_$i".getBytes(StandardCharsets.UTF_8)),
        VBinary(Array[Byte]((i + 1).toByte, (i + 2).toByte, (i * 7 + 1).toByte)),
        VBinary(be32((day.toEpochDay - pgEpochDay).toInt)),
        VBinary(be64(java.time.temporal.ChronoUnit.MICROS.between(pgEpoch, ts))),
        VBinary(be64(0x1122334455667788L) ++
          be64(java.lang.Long.parseLong(f"$i%012d", 16))))))
    }
    f(8999, Commit(0, 8999, 9000, 770000004000000L))
    writeSegment(frames.toSeq)
  }

  def pgoutputBinaryRowCount: Long =
    PgOutput.segmentRows(pgoutputBinarySegment).size.toLong

  // --------------------------------------------------------------- binlog
  // One table, multi-row events (10 rows per WRITE event), an UPDATE with
  // before+after images and a NULL in the after image, a DELETE, an XID.

  val BlMap: MySqlBinlog.TableMap = MySqlBinlog.TableMap(901L, "testdb", "bl_items",
    Seq(MySqlBinlog.TYPE_LONG, MySqlBinlog.TYPE_LONGLONG, MySqlBinlog.TYPE_VARCHAR),
    Seq(0, 0, 40))

  /** Full relational type gamut of the row decoder: signed TINY/SHORT/
    * INT24, IEEE FLOAT/DOUBLE, YEAR, packed DATE, packed DATETIME2(6)
    * with microseconds, packed NEWDECIMAL(12,3) incl. negatives, BLOB
    * with a 2-byte length prefix.
    */
  val TypesMap: MySqlBinlog.TableMap = {
    import MySqlBinlog._
    TableMap(902L, "testdb", "bl_types",
      Seq(TYPE_LONG, TYPE_TINY, TYPE_SHORT, TYPE_INT24, TYPE_FLOAT,
        TYPE_DOUBLE, TYPE_YEAR, TYPE_DATE, TYPE_DATETIME2, TYPE_NEWDECIMAL,
        TYPE_BLOB),
      Seq(0, 0, 0, 0, 4, 8, 0, 0, 6, (12 << 8) | 3, 2))
  }

  def typesRow(i: Int): MySqlBinlog.Row = {
    import MySqlBinlog._
    val sign = if (i % 3 == 2) "-" else ""
    Row(Seq(
      Some(i), Some(i - 5), Some(i * 100 - 500), Some(i * 10000 - 50000),
      Some(i + 0.5f), Some(i * 2.25),
      Some(1990 + i), Some(Dt(2020, 1, i + 1)),
      Some(Dt(2021, 2, 3, 4, 5, i, i * 100000, 6)),
      Some(Dec(f"$sign${i * 12345}%d.${i * 37}%03d")),
      Some(Array[Byte]((i + 1).toByte, (i + 2).toByte, (i * 7 + 1).toByte))))
  }

  /** JSON column (MySQL json_binary payload): nested object/array,
    * inlined literals/int16, outlined string/int32/int64.
    */
  val JsonMap: MySqlBinlog.TableMap = MySqlBinlog.TableMap(903L, "testdb", "bl_json",
    Seq(MySqlBinlog.TYPE_LONG, MySqlBinlog.TYPE_JSON), Seq(0, 4))

  def jsonRow(i: Int): MySqlBinlog.Row = {
    import MySqlBinlog._
    Row(Seq(Some(i), Some(JObj(Seq(
      "id" -> JInt(i),
      "name" -> JStr(s"js_$i"),
      "flags" -> JArr(Seq(JBool(i % 2 == 0), JNull, JInt(i * 1000))),
      "nested" -> JObj(Seq("depth" -> JInt(2), "big" -> JInt(100000L + i))),
      "huge" -> JInt(3000000000L + i))))))
  }

  /** GEOMETRY column: 4-byte LE SRID + WKB (little-endian point). */
  val GeoMap: MySqlBinlog.TableMap = MySqlBinlog.TableMap(904L, "testdb", "bl_geo",
    Seq(MySqlBinlog.TYPE_LONG, MySqlBinlog.TYPE_GEOMETRY), Seq(0, 4))

  /** WKB for POINT(x y), little-endian byte order marker. */
  def wkbPoint(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(1); b.putDouble(x); b.putDouble(y)
    b.array()
  }

  def geoRow(i: Int): MySqlBinlog.Row = {
    import MySqlBinlog._
    // rows 0-5 points; 6 = LINESTRING, 7 = POLYGON — the GEOMETRY column
    // carries any WKB, and the full Wkb traverser handles it downstream
    val wkb = i match {
      case 6 => graft.functions.Wkb.makeLineString(Seq((1.5, 2.5), (3.5, 4.5)))
      case 7 => graft.functions.Wkb.makePolygon(Seq(Seq(
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))))
      case _ => wkbPoint(i.toDouble, i + 0.5)
    }
    Row(Seq(Some(i), Some(Geom(4326, wkb))))
  }

  /** MariaDB-flavored segment: GTID_LIST state at the head, then two
    * GTID-opened event groups (domain 0 and domain 1), each with an
    * ANNOTATE_ROWS statement text before its row events and an XID
    * commit (reference debezium-connector-mariadb event stream shape).
    */
  def mariadbSegment: Array[Byte] = {
    import MySqlBinlog._
    def row(i: Int): Row = Row(Seq(Some(i), Some(i * 5L), Some(s"md_$i")))
    val events = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    events += encodeMariaGtidList(90, Seq((0L, 1L, 41L), (1L, 1L, 6L)))
    events += encodeMariaGtid(100, domain = 0, seqNo = 42)
    events += encodeAnnotateRows(110,
      "INSERT INTO testdb.bl_items SELECT seq, seq*5, concat('md_', seq)")
    events += encodeTableMap(120, BlMap)
    events += encodeRows(WRITE_ROWS_V2, 200, BlMap, (0 until 12).map(row))
    events += encodeXid(300, 7001L)
    events += encodeMariaGtid(310, domain = 1, seqNo = 7)
    events += encodeAnnotateRows(320,
      "UPDATE testdb.bl_items SET qty = qty + 1000 WHERE id % 3 = 0")
    val upd = (0 until 12).filter(_ % 3 == 0)
    events += encodeRows(UPDATE_ROWS_V2, 400, BlMap, upd.map(row),
      upd.map(i => Row(Seq(Some(i), Some(i * 5L + 1000), Some(s"md_$i")))))
    events += encodeXid(500, 7002L)
    writeSegment(events.toSeq)
  }

  val GtidSidA = "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"
  val GtidSidB = "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb"

  /** MySQL-GTID flavor: PREVIOUS_GTIDS head state, two GTID-framed
    * transactions from different server UUIDs (the second is dropped by
    * the `gtid.source.includes` filter in the query), and one anonymous
    * group (gtid_mode=OFF interop — always admitted).
    */
  def mysqlGtidSegment: Array[Byte] = {
    import MySqlBinlog._
    import graft.sources.wire.GtidSet
    def row(i: Int): Row = Row(Seq(Some(i), Some(i * 5L), Some(s"mg_$i")))
    val events = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    events += encodePreviousGtids(90, GtidSet(Map(
      GtidSidA -> Seq((1L, 41L)), GtidSidB -> Seq((1L, 6L)))))
    events += encodeMySqlGtid(100, GtidSidA, gno = 42,
      lastCommitted = 41, seqNo = 42)
    events += encodeRowsQuery(110,
      "INSERT INTO testdb.bl_items SELECT seq, seq*5, concat('mg_', seq)")
    events += encodeTableMap(120, BlMap)
    events += encodeRows(WRITE_ROWS_V2, 200, BlMap, (0 until 12).map(row))
    events += encodeXid(300, 9001L)
    // each transaction re-logs its TABLE_MAP (as a real binlog does) so
    // GTID-granular skipping never orphans a later group's row events
    events += encodeMySqlGtid(310, GtidSidB, gno = 7)
    events += encodeTableMap(390, BlMap)
    val upd = (0 until 12).filter(_ % 3 == 0)
    events += encodeRows(UPDATE_ROWS_V2, 400, BlMap, upd.map(row),
      upd.map(i => Row(Seq(Some(i), Some(i * 5L + 1000), Some(s"mg_$i")))))
    events += encodeXid(500, 9002L)
    // the anonymous transaction arrives as a zstd-compressed
    // TRANSACTION_PAYLOAD (binlog_transaction_compression=ON): the
    // decoder splices the inner events in place, so the oracle sees the
    // same rows a plain transaction would produce
    events += encodeMySqlGtid(510, GtidSidA, gno = 0, anonymous = true)
    events += encodeTransactionPayload(700, Seq(
      encodeTableMap(590, BlMap),
      encodeRows(WRITE_ROWS_V2, 600, BlMap, Seq(row(100), row(101))),
      encodeXid(700, 9003L)))
    writeSegment(events.toSeq)
  }

  /** `binlog_row_metadata=FULL` + `binlog_checksum=CRC32` (both real-
    * server defaults/options the MINIMAL fixtures don't exercise): the
    * TABLE_MAP carries WL#4618 optional metadata — column names, a
    * SIGNEDNESS bitmap over the numeric columns (note the non-numeric
    * VARCHAR in the middle: its column takes no bit), and the simple
    * primary key — so the projection needs NO external DDL; and every
    * event (FDE included) ends in a verified CRC32. Values sit past the
    * signed boundaries so a signed decode would visibly corrupt them:
    * TINY>127, SMALLINT>32767, MEDIUMINT>2^23, INT>2^31, BIGINT>2^63
    * (surfaced as exact digits).
    */
  val UnsignedMap: MySqlBinlog.TableMap = {
    import MySqlBinlog._
    TableMap(905L, "testdb", "bl_unsigned",
      Seq(TYPE_LONG, TYPE_VARCHAR, TYPE_TINY, TYPE_SHORT, TYPE_INT24,
        TYPE_LONG, TYPE_LONGLONG, TYPE_LONGLONG, TYPE_DOUBLE),
      Seq(0, 40, 0, 0, 0, 0, 0, 0, 8),
      names = Seq("id", "name", "u8", "u16", "u24", "u32", "u64", "s64",
        "ratio"),
      unsigned = Seq(false, false, true, true, true, true, true, false,
        false),
      primaryKey = Seq(0))
  }

  def unsignedRow(i: Int): MySqlBinlog.Row = MySqlBinlog.Row(Seq(
    Some(i), Some(s"ux_$i"), Some(200 + i), Some(65000 + i * 3),
    Some(16000000 + i), Some(((4000000000L + i) & 0xffffffffL).toInt),
    Some(java.lang.Long.MIN_VALUE + i * 7L), Some(-1000L - i),
    Some(i - 0.5)))

  def binlogMetadataSegment: Array[Byte] = {
    import MySqlBinlog._
    val events = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    events += encodeTableMap(100, UnsignedMap)
    events += encodeRows(WRITE_ROWS_V2, 200, UnsignedMap,
      (0 until 8).map(unsignedRow))
    events += encodeXid(300, 9101L)
    events += encodeTableMap(310, UnsignedMap)
    val upd = Seq(0, 4)
    events += encodeRows(UPDATE_ROWS_V2, 400, UnsignedMap,
      upd.map(unsignedRow),
      upd.map { i =>
        val r = unsignedRow(i).cells.toArray
        r(6) = Some(java.lang.Long.MIN_VALUE + i * 7L + 1)
        r(8) = Some(i - 0.5 + 100)
        Row(r.toSeq)
      })
    events += encodeRows(DELETE_ROWS_V2, 500, UnsignedMap,
      Seq(unsignedRow(5)))
    events += encodeXid(600, 9102L)
    writeSegmentCrc(events.toSeq)
  }

  /** OpenLogReplicator stream: three committed transactions (inserts /
    * updates-with-before-image / deletes), one DDL, one checkpoint —
    * each a PAYLOAD RedoResponse with its confirmable (c_scn, c_idx).
    */
  def olrResponses: Seq[Array[Byte]] = {
    import graft.sources.wire.OlrDecoder._
    val schema = encodeSchema("GRAFT", "OLR_ITEMS", 51234L)
    def afterRow(i: Int): Seq[Array[Byte]] = Seq(
      encodeValueLong("ID", i.toLong),
      encodeValueLong("QTY", i * 3L),
      encodeValueString("LABEL", s"olr_$i"),
      encodeValueDouble("SCORE", i * 0.5))
    def keyOnly(i: Int): Seq[Array[Byte]] =
      Seq(encodeValueLong("ID", i.toLong))
    val begin = encodePayload(OpBegin, schema, "")
    val commit = encodePayload(OpCommit, schema, "")
    val inserts = (0 until 12).map(i =>
      encodePayload(OpInsert, schema, f"AAAT5/AAB$i%03d", Nil, afterRow(i)))
    val updates = (0 until 12).filter(_ % 4 == 0).map { i =>
      val after = Seq(
        encodeValueLong("ID", i.toLong),
        encodeValueLong("QTY", i * 3L + 100),
        encodeValueString("LABEL", s"olr_$i"),
        encodeValueDouble("SCORE", i * 0.5))
      encodePayload(OpUpdate, schema, f"AAAT5/AAB$i%03d", keyOnly(i), after)
    }
    val deletes = (0 until 12).filter(_ % 5 == 0).map(i =>
      encodePayload(OpDelete, schema, f"AAAT5/AAB$i%03d", keyOnly(i), Nil))
    Seq(
      encodeResponse(RespPayload, scn = 990L, xid = "7.34.123",
        payloads = begin +: inserts :+ commit, cScn = 1000L, cIdx = 1L),
      encodeResponse(RespPayload, scn = 1005L, xid = "7.35.124",
        payloads = begin +: updates :+ commit, cScn = 1010L, cIdx = 1L),
      encodeResponse(RespPayload, scn = 1015L, xid = "7.36.125",
        payloads = begin +: deletes :+ commit, cScn = 1020L, cIdx = 1L),
      encodeResponse(RespPayload, scn = 1025L, xid = "7.37.126",
        payloads = Seq(encodePayload(OpDdl, schema, "", Nil, Nil,
          "ALTER TABLE GRAFT.OLR_ITEMS ADD NOTE VARCHAR2(30)")),
        cScn = 1030L, cIdx = 1L),
      encodeResponse(RespPayload, scn = 1035L,
        payloads = Seq(encodePayload(OpChkpt, schema, "")),
        cScn = 1040L, cIdx = 1L))
  }

  def olrSegment: Array[Byte] =
    graft.sources.wire.OlrDecoder.writeSegment(olrResponses)

  def olrRowCount: Long =
    graft.sources.wire.OlrDecoder.segmentRows(olrSegment).size.toLong

  /** The string/temporal tail of the type gamut: CHAR (TYPE_STRING with
    * the packed real-type metadata), ENUM and SET (ordinal/bitmask
    * storage, resolved to value NAMES via WL#4618
    * ENUM_STR_VALUE/SET_STR_VALUE metadata on this map), BIT(12)
    * (big-endian bit field), TIME(3) incl. a negative duration, and
    * TIMESTAMP(6) (UTC seconds + fractional). Names/pk also ride the
    * optional metadata, so this table needs no DDL anywhere.
    */
  val MoreMap: MySqlBinlog.TableMap = {
    import MySqlBinlog._
    TableMap(906L, "testdb", "bl_more",
      Seq(TYPE_LONG, TYPE_STRING, TYPE_STRING, TYPE_STRING, TYPE_BIT,
        TYPE_TIME2, TYPE_TIMESTAMP2),
      Seq(0, (TYPE_STRING << 8) | 6, (TYPE_ENUM << 8) | 1,
        (TYPE_SET << 8) | 1, 12, 3, 6),
      names = Seq("id", "ch", "color", "tags", "bits", "dur", "at"),
      primaryKey = Seq(0),
      enumValues = Map(2 -> Seq("red", "green", "blue")),
      setValues = Map(3 -> Seq("a", "b", "c")))
  }

  def moreRow(i: Int): MySqlBinlog.Row = {
    import MySqlBinlog._
    Row(Seq(
      Some(i), Some(s"ch_$i"), Some(EnumV(i % 3 + 1)), Some(SetV(i % 8L)),
      Some(i * 257L),
      Some(Tm(neg = i == 5, 10 + i, i * 2, i * 3, i * 111 * 1000, 3)),
      Some(Dt(2023, 11, 14, 22, 13, 20 + i, i * 7, 6))))
  }

  def binlogSegment: Array[Byte] = {
    import MySqlBinlog._
    def row(i: Int): Row =
      Row(Seq(Some(i), Some(i * 11L), Some(s"bl_$i")))
    val events = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    events += encodeTableMap(400, BlMap)
    (0 until 3).foreach { k =>
      events += encodeRows(WRITE_ROWS_V2, 500L + k, BlMap,
        (k * 10 until (k + 1) * 10).map(row))
    }
    val upd = (0 until 30).filter(_ % 4 == 0)
    events += encodeRows(UPDATE_ROWS_V2, 600, BlMap,
      upd.map(row),
      upd.map(i => Row(Seq(Some(i), Some(i * 11L + 7),
        if (i % 8 == 4) None else Some(s"bl_$i")))))
    events += encodeRows(DELETE_ROWS_V2, 700, BlMap,
      (0 until 30).filter(_ % 9 == 0).map(row))
    events += encodeXid(800, 9001L)
    events += encodeTableMap(900, TypesMap)
    events += encodeRows(WRITE_ROWS_V2, 901, TypesMap, (0 until 10).map(typesRow))
    events += encodeXid(902, 9002L)
    events += encodeTableMap(950, JsonMap)
    events += encodeRows(WRITE_ROWS_V2, 951, JsonMap, (0 until 10).map(jsonRow))
    events += encodeXid(952, 9003L)
    events += encodeTableMap(960, GeoMap)
    events += encodeRows(WRITE_ROWS_V2, 961, GeoMap, (0 until 8).map(geoRow))
    events += encodeXid(962, 9004L)
    // PARTIAL_UPDATE_ROWS (binlog_row_value_options=PARTIAL_JSON): the
    // JSON column carries a json_diff sequence — replace a member and
    // an array element, remove a nested member, insert a new key
    val partialRows = Seq(0, 3, 6, 9).map { i =>
      val diffs = Seq(
        JsonDiff(DIFF_REPLACE, "$.name", Some(JStr(s"js_${i}_patched"))),
        JsonDiff(DIFF_REPLACE, "$.flags[2]", Some(JInt(i * 1000 + 1))),
        JsonDiff(DIFF_REMOVE, "$.nested.depth", None),
        JsonDiff(DIFF_INSERT, "$.extra", Some(JInt(i * 5L))))
      (jsonRow(i), Row(Seq(Some(i), None)), Map(1 -> diffs))
    }
    events += encodePartialUpdateRows(970, JsonMap, partialRows)
    events += encodeXid(971, 9005L)
    events += encodeTableMap(980, MoreMap)
    events += encodeRows(WRITE_ROWS_V2, 981, MoreMap, (0 until 6).map(moreRow))
    events += encodeXid(982, 9006L)
    // In-stream DDL: a QUERY event carries the ALTER (and row-format
    // transactions open with a QUERY "BEGIN", which must be ignored);
    // mysqld then assigns the table a NEW table id, so the next
    // TABLE_MAP arrives under 907 with the widened column list. Rows
    // after the ALTER must resolve the 4th column's name from the
    // evolved schema registry, not the stale 3-column DDL seed.
    events += encodeQuery(989, "testdb",
      "CREATE TABLE audit_log (id INT PRIMARY KEY, msg TEXT)")
    events += encodeQuery(990, "testdb", "BEGIN")
    events += encodeQuery(991, "testdb",
      "ALTER TABLE bl_items ADD COLUMN note VARCHAR(20)")
    events += encodeTableMap(992, BlMapV2)
    events += encodeRows(WRITE_ROWS_V2, 993, BlMapV2,
      (100 until 106).map(rowV2))
    events += encodeXid(994, 9007L)
    // Production-binlog DDL beyond the day-to-day subset: CREATE…LIKE
    // and partition clauses PARSE as of r12 (LIKE copies the source's
    // registry shape; partitioning is storage layout, ignored), while a
    // CTAS stays out of subset and exercises the skip.unparseable.ddl
    // policy — warn, skip, mark the table stale. Placed after every row
    // event so registry changes have no decode side effects here.
    events += encodeQuery(995, "testdb",
      "CREATE TABLE bl_items_like LIKE bl_items")
    events += encodeQuery(996, "testdb",
      "ALTER TABLE bl_types PARTITION BY RANGE (id) " +
        "(PARTITION p0 VALUES LESS THAN (100), " +
        "PARTITION p1 VALUES LESS THAN MAXVALUE)")
    events += encodeQuery(997, "testdb",
      "CREATE TABLE bl_sel AS SELECT id, qty FROM bl_items")
    writeSegment(events.toSeq)
  }

  /** Post-ALTER shape of `bl_items` (new table id, added `note`). */
  val BlMapV2: MySqlBinlog.TableMap = MySqlBinlog.TableMap(907L, "testdb",
    "bl_items",
    Seq(MySqlBinlog.TYPE_LONG, MySqlBinlog.TYPE_LONGLONG,
      MySqlBinlog.TYPE_VARCHAR, MySqlBinlog.TYPE_VARCHAR),
    Seq(0, 0, 40, 20))

  def rowV2(i: Int): MySqlBinlog.Row = MySqlBinlog.Row(Seq(
    Some(i), Some(i * 11L), Some(s"bl_$i"),
    if (i % 2 == 0) Some(s"n_$i") else None))

  def binlogRowCount: Long =
    MySqlBinlog.segmentRows(binlogSegment, Map.empty).size.toLong

  // ------------------------------------------- SQL Server CDC change table
  // Recorded poll of cdc.fn_cdc_get_all_changes_dbo_products: 40 inserts
  // (4-row transactions), 10 update pairs (max-type `notes` column NULL +
  // mask-bit-clear for i%8==0 — the unavailable-value path; explicit
  // name=NULL for i%8==4 — the JSON-null path), 7 deletes. Binary LSN /
  // seqval / mask columns are base64 in the JSONL recording.

  private val b64 = java.util.Base64.getEncoder

  /** 10-byte SQL Server LSN: vlf(4) block(4) slot(2), big-endian. */
  def sqlServerLsn(vlf: Int, block: Int, slot: Int): Array[Byte] =
    ByteBuffer.allocate(10).putInt(vlf).putInt(block)
      .putShort(slot.toShort).array()

  def sqlServerCtJsonl: String = {
    def jl(lsn: Array[Byte], seq: Array[Byte], op: Int, mask: Array[Byte],
           id: Int, name: Option[String], price: Double,
           notes: Option[String]): String = {
      def str(v: Option[String]) = v.map("\"" + _ + "\"").getOrElse("null")
      s"""{"__$$start_lsn":"${b64.encodeToString(lsn)}",""" +
        s""""__$$seqval":"${b64.encodeToString(seq)}",""" +
        s""""__$$operation":$op,""" +
        s""""__$$update_mask":"${b64.encodeToString(mask)}",""" +
        s""""id":$id,"name":${str(name)},"price":$price,"notes":${str(notes)}}"""
    }
    val all = Array[Byte](0x0F) // insert/delete masks cover every column
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    (0 until 40).foreach { i =>
      lines += jl(sqlServerLsn(0x25, 0x100 + i / 4, 3), sqlServerLsn(0, i, 1),
        2, all, i, Some(s"prod_$i"), i * 2.5, Some(s"note_$i"))
    }
    (0 until 40).filter(_ % 4 == 0).foreach { i =>
      val cl = sqlServerLsn(0x25, 0x200 + i, 3)
      val sv = sqlServerLsn(0, i, 2)
      if (i % 8 == 0) { // only price changed; notes (max-type) not captured
        val m = Array[Byte](0x04)
        lines += jl(cl, sv, 3, m, i, Some(s"prod_$i"), i * 2.5, None)
        lines += jl(cl, sv, 4, m, i, Some(s"prod_$i"), i * 2.5 + 100, None)
      } else { // name set to NULL, price + notes rewritten
        val m = Array[Byte](0x0E)
        lines += jl(cl, sv, 3, m, i, Some(s"prod_$i"), i * 2.5, Some(s"note_$i"))
        lines += jl(cl, sv, 4, m, i, None, i * 2.5 + 100, Some(s"edited_$i"))
      }
    }
    (0 until 40).filter(_ % 6 == 3).foreach { i =>
      lines += jl(sqlServerLsn(0x25, 0x300 + i, 3), sqlServerLsn(0, i, 3),
        1, all, i, Some(s"prod_$i"), i * 2.5, Some(s"note_$i"))
    }
    lines.mkString("", "\n", "\n")
  }

  // ----------------------------------------------- Oracle LogMiner poll
  // Recorded V$LOGMNR_CONTENTS result set: tx1 = 30 inserts (one split
  // across 3 CSF chunks, one with Unsupported Type + NULL), tx2 = 6
  // updates with full supplemental-logging where-clauses (one cancelled
  // by a partial-rollback compensating row), tx3 = 5 deletes (one of a
  // previously-updated row, exercising IS NULL), tx4 = inserts ended by
  // ROLLBACK(36) — never emitted.

  def logMinerContentsJsonl: String = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    var rn = 0L
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    def rowT(scn: Long, opcode: Int, xid: String, csf: Int, rbk: Int,
             rowId: String, rsId: String, table: String, sql: String): Unit = {
      rn += 1
      lines += s"""{"rownum":$rn,"scn":$scn,"opcode":$opcode,""" +
        s""""xid":"$xid","csf":$csf,"rbk":$rbk,"row_id":"$rowId",""" +
        s""""rs_id":"$rsId","seg_owner":"ORA","table_name":"$table",""" +
        s""""sql_redo":"${esc(sql)}"}"""
    }
    def row(scn: Long, opcode: Int, xid: String, csf: Int, rbk: Int,
            rowId: String, rsId: String, sql: String): Unit =
      rowT(scn, opcode, xid, csf, rbk, rowId, rsId, "PRODUCTS", sql)
    def ss(i: Int) = f"${i % 60}%02d"
    def nameSql(i: Int) = if (i == 7) "it''s_7" else s"ora_$i"
    def created(i: Int) =
      s"TO_DATE('2021-03-15 10:00:${ss(i)}', 'YYYY-MM-DD HH24:MI:SS')"
    def rid(i: Int) = f"AAA$i%03d"

    val (tx1, tx2, tx3, tx4) = ("0A0001", "0B0002", "0C0003", "0D0004")
    row(5000, 6, tx1, 0, 0, "", "R5000", "start transaction")
    (0 until 30).foreach { i =>
      val values =
        if (i == 11) s"('$i','${nameSql(i)}',Unsupported Type,NULL)"
        else s"('$i','${nameSql(i)}','$i.25',${created(i)})"
      val sql = "insert into \"ORA\".\"PRODUCTS\"(\"ID\",\"NAME\"," +
        s""""PRICE","CREATED") values $values;"""
      if (i == 7) // CSF continuation: one statement over three rows
        sql.grouped(40).toSeq match {
          case chunks =>
            chunks.zipWithIndex.foreach { case (chunk, k) =>
              row(5001 + i, 1, tx1, if (k == chunks.size - 1) 0 else 1, 0,
                rid(i), s"R${5001 + i}", chunk)
            }
        }
      else row(5001 + i, 1, tx1, 0, 0, rid(i), s"R${5001 + i}", sql)
    }
    row(5100, 7, tx1, 0, 0, "", "R5100", "commit;")

    (0 until 30).filter(_ % 5 == 0).foreach { i =>
      val sql = "update \"ORA\".\"PRODUCTS\" set \"PRICE\" = " +
        s"'${i + 100}.25', " + "\"NAME\" = NULL where \"ID\" = " +
        s"'$i' and " + "\"NAME\" = " + s"'${nameSql(i)}' and " +
        "\"PRICE\" = " + s"'$i.25' and " + "\"CREATED\" = " +
        s"${created(i)};"
      row(5200 + i, 3, tx2, 0, 0, rid(i), s"R${5200 + i}", sql)
    }
    // partial rollback: compensating record cancels the i=15 update
    row(5216, 3, tx2, 0, 1, rid(15), "R5216",
      "update \"ORA\".\"PRODUCTS\" set \"PRICE\" = '15.25' where \"ID\" = '15';")
    row(5300, 7, tx2, 0, 0, "", "R5300", "commit;")

    (0 until 30).filter(_ % 7 == 0).foreach { i =>
      val (nameCond, price) =
        if (i == 0) ("\"NAME\" IS NULL", s"${i + 100}.25") // updated row
        else ("\"NAME\" = " + s"'${nameSql(i)}'", s"$i.25")
      val sql = "delete from \"ORA\".\"PRODUCTS\" where \"ID\" = " +
        s"'$i' and $nameCond and " + "\"PRICE\" = " + s"'$price' and " +
        "\"CREATED\" = " + s"${created(i)};"
      row(5400 + i, 2, tx3, 0, 0, rid(i), s"R${5400 + i}", sql)
    }
    row(5500, 7, tx3, 0, 0, "", "R5500", "commit;")

    (100 to 104).foreach { j =>
      val sql = "insert into \"ORA\".\"PRODUCTS\"(\"ID\",\"NAME\"," +
        s""""PRICE","CREATED") values ('$j','dead_$j','1.25',${created(0)});"""
      row(5500 + j, 1, tx4, 0, 0, f"AAA$j%03d", s"R${5500 + j}", sql)
    }
    row(5700, 36, tx4, 0, 0, "", "R5700", "rollback;")

    // LOB chains (lob.enabled): SEL_LOB_LOCATOR(9) names the column and
    // locks the row, LOB_WRITE(10) chunks land at dbms_lob.write
    // offsets, LOB_TRIM(11) truncates. tx5 = insert + 2-chunk CLOB
    // merged into the insert's after image; tx6 = direct LOB mutation
    // with no DML (write + trim) → synthetic update with unavailable
    // non-key columns; tx7 = BLOB via HEXTORAW chunks (byte offsets);
    // tx8 = locator + write ended by ROLLBACK — never emitted.
    def selLob(col: String, table: String, id: Int): String =
      s"""declare  loc_c clob;begin  select "$col" into loc_c from """ +
        s""""ORA"."$table" where "ID" = '$id' for update;end;"""
    def lobWrite(data: String, len: Int, off: Int): String =
      s"declare  loc_c clob;  buf_c varchar2($len);begin  " +
        s"buf_c := $data;  dbms_lob.write(loc_c, $len, $off, buf_c);end;"
    val (tx5, tx6, tx7, tx8) = ("0E0005", "0E0006", "0E0007", "0E0008")
    rowT(5800, 1, tx5, 0, 0, "BBB001", "R5800", "NOTES",
      "insert into \"ORA\".\"NOTES\"(\"ID\",\"TITLE\",\"BODY\") values " +
        "('1','n1',EMPTY_CLOB());")
    rowT(5801, 9, tx5, 0, 0, "BBB001", "R5801", "NOTES",
      selLob("BODY", "NOTES", 1))
    rowT(5802, 10, tx5, 0, 0, "BBB001", "R5802", "NOTES",
      lobWrite("'hello '", 6, 1))
    rowT(5803, 10, tx5, 0, 0, "BBB001", "R5803", "NOTES",
      lobWrite("'world'", 5, 7))
    rowT(5810, 7, tx5, 0, 0, "", "R5810", "NOTES", "commit;")

    rowT(5820, 9, tx6, 0, 0, "BBB002", "R5820", "NOTES",
      selLob("BODY", "NOTES", 2))
    rowT(5821, 10, tx6, 0, 0, "BBB002", "R5821", "NOTES",
      lobWrite("'abcdefgh'", 8, 1))
    rowT(5822, 11, tx6, 0, 0, "BBB002", "R5822", "NOTES",
      "declare  loc_c clob;begin  dbms_lob.trim(loc_c, 5);end;")
    rowT(5830, 7, tx6, 0, 0, "", "R5830", "NOTES", "commit;")

    rowT(5840, 1, tx7, 0, 0, "CCC003", "R5840", "FILES",
      "insert into \"ORA\".\"FILES\"(\"ID\",\"DATA\") values " +
        "('3',EMPTY_BLOB());")
    rowT(5841, 9, tx7, 0, 0, "CCC003", "R5841", "FILES",
      selLob("DATA", "FILES", 3))
    rowT(5842, 10, tx7, 0, 0, "CCC003", "R5842", "FILES",
      lobWrite("HEXTORAW('DEAD')", 2, 1))
    rowT(5843, 10, tx7, 0, 0, "CCC003", "R5843", "FILES",
      lobWrite("HEXTORAW('BEEF')", 2, 3))
    rowT(5850, 7, tx7, 0, 0, "", "R5850", "FILES", "commit;")

    rowT(5860, 9, tx8, 0, 0, "BBB009", "R5860", "NOTES",
      selLob("BODY", "NOTES", 9))
    rowT(5861, 10, tx8, 0, 0, "BBB009", "R5861", "NOTES",
      lobWrite("'zzz'", 3, 1))
    rowT(5870, 36, tx8, 0, 0, "", "R5870", "NOTES", "rollback;")

    // XML chains: XML_BEGIN(68) names the column (text-storage `update
    // "O"."T" a set a."COL" = XMLTYPE()` or binary `XML DOC BEGIN:
    // select …`), XML_WRITE(70) fragments CONCATENATE (`XML_REDO :=`,
    // quoted or HEXTORAW incl. Oracle's missing-end-quote bug, or NULL),
    // XML_END(71) closes. tx9 = insert + 2-fragment chain merged into
    // the insert; tx10 = direct mutation, binary begin + buggy HEXTORAW
    // → synthetic update; tx11 = chain ended by ROLLBACK — never
    // emitted; tx12 = explicit XML_REDO := NULL → null column.
    val (tx9, tx10, tx11, tx12) = ("0F0009", "0F000A", "0F000B", "0F000C")
    rowT(5880, 1, tx9, 0, 0, "DDD001", "R5880", "PAGES",
      "insert into \"ORA\".\"PAGES\"(\"ID\",\"XDOC\") values " +
        "('1',Unsupported Type);")
    rowT(5881, 68, tx9, 0, 0, "DDD001", "R5881", "PAGES",
      "update \"ORA\".\"PAGES\" a set a.\"XDOC\" = XMLTYPE() " +
        "where \"ID\" = '1';")
    rowT(5882, 70, tx9, 0, 0, "DDD001", "R5882", "PAGES",
      "XML_REDO := '<page>hel' : 9")
    rowT(5883, 70, tx9, 0, 0, "DDD001", "R5883", "PAGES",
      "XML_REDO := 'lo</page>' : 9")
    rowT(5884, 71, tx9, 0, 0, "DDD001", "R5884", "PAGES", "XML DOC END")
    rowT(5890, 7, tx9, 0, 0, "", "R5890", "PAGES", "commit;")

    rowT(5900, 68, tx10, 0, 0, "DDD002", "R5900", "PAGES",
      "XML DOC BEGIN:  select \"XDOC\" from \"ORA\".\"PAGES\" where " +
        "\"ID\" = '2' for update;")
    // <p>ab</p> as HEXTORAW, final chunk missing the closing quote
    rowT(5901, 70, tx10, 0, 0, "DDD002", "R5901", "PAGES",
      "XML_REDO := HEXTORAW('3C703E61623C2F703E) : 9")
    rowT(5902, 71, tx10, 0, 0, "DDD002", "R5902", "PAGES", "XML DOC END")
    rowT(5905, 7, tx10, 0, 0, "", "R5905", "PAGES", "commit;")

    rowT(5910, 68, tx11, 0, 0, "DDD003", "R5910", "PAGES",
      "update \"ORA\".\"PAGES\" a set a.\"XDOC\" = XMLTYPE() " +
        "where \"ID\" = '3';")
    rowT(5911, 70, tx11, 0, 0, "DDD003", "R5911", "PAGES",
      "XML_REDO := '<dead/>' : 7")
    rowT(5915, 36, tx11, 0, 0, "", "R5915", "PAGES", "rollback;")

    rowT(5920, 68, tx12, 0, 0, "DDD004", "R5920", "PAGES",
      "XML DOC BEGIN:  select \"XDOC\" from \"ORA\".\"PAGES\" where " +
        "\"ID\" = '4' for update;")
    rowT(5921, 70, tx12, 0, 0, "DDD004", "R5921", "PAGES",
      "XML_REDO := NULL")
    rowT(5922, 71, tx12, 0, 0, "DDD004", "R5922", "PAGES", "XML DOC END")
    rowT(5925, 7, tx12, 0, 0, "", "R5925", "PAGES", "commit;")

    // 32K extended-string chains (VARCHAR2(32767)): 32K_BEGIN(91) wraps
    // an UPDATE in a `Stmt := '…';` assignment with '' escaping,
    // 32K_WRITE(92) carries a raw slice at fixed offset 12, fragments
    // concatenate, 32K_END(93) closes. tx13 merges into its insert;
    // tx14's chain ends in ROLLBACK and never emits.
    def xsBegin(id: Int): String =
      "declare  v varchar2(32767);begin  Stmt := 'update \"ORA\"." +
        s""""MEMOS" set "BODY" = :1 where "ID" = ''$id''';end;"""
    def xsWrite(data: String): String = s"esw_buf := '$data';end;"
    val (tx13, tx14) = ("0F000D", "0F000E")
    rowT(5930, 1, tx13, 0, 0, "EEE001", "R5930", "MEMOS",
      "insert into \"ORA\".\"MEMOS\"(\"ID\",\"BODY\") values " +
        "('1',Unsupported Type);")
    rowT(5931, 91, tx13, 0, 0, "EEE001", "R5931", "MEMOS", xsBegin(1))
    rowT(5932, 92, tx13, 0, 0, "EEE001", "R5932", "MEMOS",
      xsWrite("long text part one "))
    rowT(5933, 92, tx13, 0, 0, "EEE001", "R5933", "MEMOS",
      xsWrite("and part two"))
    rowT(5934, 93, tx13, 0, 0, "EEE001", "R5934", "MEMOS", "32K DOC END")
    rowT(5940, 7, tx13, 0, 0, "", "R5940", "MEMOS", "commit;")

    rowT(5950, 91, tx14, 0, 0, "EEE002", "R5950", "MEMOS", xsBegin(2))
    rowT(5951, 92, tx14, 0, 0, "EEE002", "R5951", "MEMOS",
      xsWrite("doomed"))
    rowT(5955, 36, tx14, 0, 0, "", "R5955", "MEMOS", "rollback;")

    // re-begin on the same (row, column) starts a NEW document: only
    // the second chain's value survives (fragments have no offsets)
    val tx16 = "0F0010"
    rowT(5970, 68, tx16, 0, 0, "DDD006", "R5970", "PAGES",
      "update \"ORA\".\"PAGES\" a set a.\"XDOC\" = XMLTYPE() " +
        "where \"ID\" = '6';")
    rowT(5971, 70, tx16, 0, 0, "DDD006", "R5971", "PAGES",
      "XML_REDO := '<a/>' : 4")
    rowT(5972, 71, tx16, 0, 0, "DDD006", "R5972", "PAGES", "XML DOC END")
    rowT(5973, 68, tx16, 0, 0, "DDD006", "R5973", "PAGES",
      "update \"ORA\".\"PAGES\" a set a.\"XDOC\" = XMLTYPE() " +
        "where \"ID\" = '6';")
    rowT(5974, 70, tx16, 0, 0, "DDD006", "R5974", "PAGES",
      "XML_REDO := '<b/>' : 4")
    rowT(5975, 71, tx16, 0, 0, "DDD006", "R5975", "PAGES", "XML DOC END")
    rowT(5978, 7, tx16, 0, 0, "", "R5978", "PAGES", "commit;")

    // LOB_ERASE(29) is unsupported in the reference: it warns and
    // DISCARDS the open chain's merge state — tx15's committed chain
    // produces nothing despite the earlier write
    val tx15 = "0F000F"
    rowT(5960, 9, tx15, 0, 0, "BBB005", "R5960", "NOTES",
      selLob("BODY", "NOTES", 5))
    rowT(5961, 10, tx15, 0, 0, "BBB005", "R5961", "NOTES",
      lobWrite("'gone'", 4, 1))
    rowT(5962, 29, tx15, 0, 0, "BBB005", "R5962", "NOTES",
      "declare  loc_c clob;begin  dbms_lob.erase(loc_c, 2, 1);end;")
    rowT(5965, 7, tx15, 0, 0, "", "R5965", "NOTES", "commit;")

    // DDL (OPERATION_CODE=5, ref EventType.DDL): the statement rides
    // SQL_REDO, the affected object SEG_OWNER/TABLE_NAME; Oracle
    // auto-commits DDL so each arrives in its own transaction. decode()
    // ignores opcode 5 entirely — only the schema-change feed sees it.
    val (txD1, txD2) = ("1D0001", "1D0002")
    rowT(5990, 5, txD1, 0, 0, "", "R5990", "PRODUCTS",
      "ALTER TABLE \"ORA\".\"PRODUCTS\" ADD (\"STOCK\" NUMBER(10,0));")
    rowT(5991, 7, txD1, 0, 0, "", "R5991", "PRODUCTS", "commit;")
    rowT(5995, 5, txD2, 0, 0, "", "R5995", "AUDIT",
      "truncate table \"ORA\".\"AUDIT\";")
    rowT(5996, 7, txD2, 0, 0, "", "R5996", "AUDIT", "commit;")
    lines.mkString("", "\n", "\n")
  }

  /** LogMiner recording with MID-POLL SCHEMA EVOLUTION (Oracle DDL
    * dialect): a transaction under the initial 3-column PRODUCTS
    * schema, then a parenthesized multi-ADD + MODIFY (and an index DDL
    * the parse listeners must skip), a transaction whose DML carries
    * the two NEW columns, and a table CREATED in-stream (quoted
    * owner.name pair, per-column PRIMARY KEY, NUMBER/BINARY_DOUBLE
    * types) followed by its first inserts — `LogMiner.decodeEvolving`
    * must resolve every row against the schema version at its SCN.
    */
  def logMinerEvolvedJsonl: String = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    var rn = 0L
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    def row(scn: Long, opcode: Int, xid: String, rowId: String,
            table: String, sql: String): Unit = {
      rn += 1
      lines += s"""{"rownum":$rn,"scn":$scn,"opcode":$opcode,""" +
        s""""xid":"$xid","csf":0,"rbk":0,"row_id":"$rowId",""" +
        s""""rs_id":"R$scn","seg_owner":"ORA","table_name":"$table",""" +
        s""""sql_redo":"${esc(sql)}"}"""
    }
    // tx A: six inserts under the INITIAL (ID, NAME, PRICE) schema
    row(7000, 6, "AA0001", "", "PRODUCTS", "start transaction")
    (0 until 6).foreach { i =>
      row(7001 + i, 1, "AA0001", f"AEV$i%03d", "PRODUCTS",
        "insert into \"ORA\".\"PRODUCTS\"(\"ID\",\"NAME\",\"PRICE\") " +
          s"values ('$i','ev_$i','$i.5');")
    }
    row(7010, 7, "AA0001", "", "PRODUCTS", "commit;")
    // auto-committed DDL: paren multi-ADD, paren MODIFY (no shape
    // change), and an index statement the intake must skip
    row(7020, 5, "AADD01", "", "PRODUCTS",
      "ALTER TABLE \"ORA\".\"PRODUCTS\" ADD (\"STOCK\" NUMBER(10,0), " +
        "\"TAG\" VARCHAR2(64));")
    row(7021, 5, "AADD02", "", "PRODUCTS",
      "ALTER TABLE \"ORA\".\"PRODUCTS\" MODIFY (\"PRICE\" NUMBER(12,2));")
    row(7022, 5, "AADD03", "", "PRODUCTS",
      "CREATE UNIQUE INDEX \"ORA\".\"PRODUCTS_IX\" ON " +
        "\"ORA\".\"PRODUCTS\" (\"NAME\");")
    // tx B: DML under the EVOLVED 5-column schema
    row(7029, 6, "AA0002", "", "PRODUCTS", "start transaction")
    (6 until 12).foreach { i =>
      row(7024 + i, 1, "AA0002", f"AEV$i%03d", "PRODUCTS",
        "insert into \"ORA\".\"PRODUCTS\"(\"ID\",\"NAME\",\"PRICE\"," +
          "\"STOCK\",\"TAG\") " +
          s"values ('$i','ev_$i','$i.5','${i * 10}','tag_$i');")
    }
    row(7045, 3, "AA0002", "AEV003", "PRODUCTS",
      "update \"ORA\".\"PRODUCTS\" set \"STOCK\" = '99' where " +
        "\"ID\" = '3' and \"NAME\" = 'ev_3' and \"PRICE\" = '3.5';")
    row(7050, 7, "AA0002", "", "PRODUCTS", "commit;")
    // in-stream CREATE TABLE, then its first transaction
    row(7060, 5, "AADD04", "", "RATINGS",
      "CREATE TABLE \"ORA\".\"RATINGS\" (\"ID\" NUMBER(9,0) PRIMARY KEY, " +
        "\"SCORE\" BINARY_DOUBLE);")
    row(7069, 6, "AA0003", "", "RATINGS", "start transaction")
    (0 until 3).foreach { i =>
      row(7070 + i, 1, "AA0003", f"ARA$i%03d", "RATINGS",
        "insert into \"ORA\".\"RATINGS\"(\"ID\",\"SCORE\") " +
          s"values ('$i','$i.75');")
    }
    row(7080, 7, "AA0003", "", "RATINGS", "commit;")
    lines.mkString("", "\n", "\n")
  }

  // ------------------------------------------- MongoDB change stream
  // Recorded watch() cursor (JSONL): 40 inserts, 8 updates with
  // updateDescription (+ full post-image; i%10==5 also removes `price`),
  // 4 replaces, 7 deletes, one collection `drop` (server-filtered by the
  // reference pipeline, must not decode), and one insert split into 3
  // fragments ($changeStreamSplitLargeEvent) whose disjoint top-level
  // fields reassemble on the resume-token position prefix. Updates,
  // replaces and deletes carry `fullDocumentBeforeChange` — the
  // collection-pre-images capture the reference's
  // `capture.mode=*_with_pre_image` family reads (each before image is
  // the document state the prior events produced).

  /** Resume token: 16 hex digits of position, 4 of fragment ordinal. */
  def mongoToken(ord: Long, frag: Int): String = f"$ord%016x$frag%04x"

  def mongoOrd(tSec: Long): Long = tSec * 4294967296L + 1L

  def mongoChangeStreamJsonl: String = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    def ev(tSec: Long, opType: String, parts: String*): Unit = {
      val tok = mongoToken(mongoOrd(tSec), 0)
      lines += (s"""{"_id":{"_data":"$tok"},"operationType":"$opType",""" +
        s""""clusterTime":{"t":$tSec,"i":1},""" +
        s""""ns":{"db":"shop","coll":"items"}""" +
        parts.map("," + _).mkString + "}")
    }
    (0 until 40).foreach { i =>
      ev(1680000000L + i, "insert",
        s""""documentKey":{"_id":$i}""",
        s""""fullDocument":{"_id":$i,"sku":"sku_$i","qty":${i * 7},"price":${i * 1.5}}""")
    }
    (0 until 40).filter(_ % 5 == 0).foreach { i =>
      val removed = if (i % 10 == 5) """["price"]""" else "[]"
      val doc =
        if (i % 10 == 5) s"""{"_id":$i,"sku":"sku_$i","qty":${i * 7 + 1000}}"""
        else s"""{"_id":$i,"sku":"sku_$i","qty":${i * 7 + 1000},"price":${i * 1.5}}"""
      ev(1680000100L + i, "update",
        s""""documentKey":{"_id":$i}""",
        s""""fullDocument":$doc""",
        s""""fullDocumentBeforeChange":{"_id":$i,"sku":"sku_$i","qty":${i * 7},"price":${i * 1.5}}""",
        s""""updateDescription":{"updatedFields":{"qty":${i * 7 + 1000}},"removedFields":$removed}""")
    }
    (0 until 40).filter(_ % 10 == 7).foreach { i =>
      ev(1680000200L + i, "replace",
        s""""documentKey":{"_id":$i}""",
        s""""fullDocument":{"_id":$i,"sku":"sku_${i}_v2","qty":${i * 7},"price":${i * 1.5 + 10}}""",
        s""""fullDocumentBeforeChange":{"_id":$i,"sku":"sku_$i","qty":${i * 7},"price":${i * 1.5}}""")
    }
    (0 until 40).filter(_ % 6 == 0).foreach { i =>
      // pre-image = the state the earlier events left: the i%5==0 update
      // bumped qty; no deleted id hit the price-removing or replace legs
      val qty = if (i % 5 == 0) i * 7 + 1000 else i * 7
      ev(1680000300L + i, "delete", s""""documentKey":{"_id":$i}""",
        s""""fullDocumentBeforeChange":{"_id":$i,"sku":"sku_$i","qty":$qty,"price":${i * 1.5}}""")
    }
    ev(1680000400L, "drop")
    val splitOrd = mongoOrd(1680000500L)
    lines += (s"""{"_id":{"_data":"${mongoToken(splitOrd, 1)}"},""" +
      """"splitEvent":{"fragment":1,"of":3},"operationType":"insert",""" +
      """"clusterTime":{"t":1680000500,"i":1}}""")
    lines += (s"""{"_id":{"_data":"${mongoToken(splitOrd, 2)}"},""" +
      """"splitEvent":{"fragment":2,"of":3},""" +
      """"ns":{"db":"shop","coll":"items"},"documentKey":{"_id":999}}""")
    lines += (s"""{"_id":{"_data":"${mongoToken(splitOrd, 3)}"},""" +
      """"splitEvent":{"fragment":3,"of":3},""" +
      s""""fullDocument":{"_id":999,"sku":"sku_big","qty":0,"blob":"${"x" * 64}"}}""")
    lines.mkString("", "\n", "\n")
  }

  /** Wire rows the mongo recording decodes to (for `.cs` segment names). */
  def mongoRowCount: Long =
    graft.sources.wire.MongoChangeStream
      .segmentRows(mongoChangeStreamJsonl.linesIterator).size.toLong

  // ------------------------------------ MongoDB BSON type-gamut stream
  // Change-stream recording whose documents carry the BSON types a real
  // mongod emits beyond the JSON-native set — ObjectId `_id` (0x07,
  // virtually every real collection), UTC datetime (0x09), Binary with
  // subtype (0x05), internal Timestamp (0x11), Decimal128 (0x13) and
  // regex (0x0B) — all as canonical Extended JSON wrappers, so the
  // fixture-server parse → BSON wire encode → live-client decode →
  // render round trip exercises every new element type end-to-end
  // (reference type dispatch: MongoDataConverter.java).

  /** ObjectId hex for document `i` (20-hex prefix + 4-hex counter). */
  def bsonOid(i: Int): String = f"65e0a1b2c3d4e5f6a7b8$i%04x"

  def mongoBsonTypesJsonl: String = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    def ev(tSec: Long, opType: String, parts: String*): Unit = {
      val tok = mongoToken(mongoOrd(tSec), 0)
      lines += (s"""{"_id":{"_data":"$tok"},"operationType":"$opType",""" +
        s""""clusterTime":{"t":$tSec,"i":1},""" +
        s""""ns":{"db":"shop","coll":"typed"}""" +
        parts.map("," + _).mkString + "}")
    }
    val b64 = java.util.Base64.getEncoder
    def doc(i: Int, amount: String, tsT: Long, tsI: Long): String = {
      val bin = b64.encodeToString(
        s"bin_$i".getBytes(StandardCharsets.UTF_8))
      s"""{"_id":{"$$oid":"${bsonOid(i)}"},"sku":"tsku_$i",""" +
        s""""created":{"$$date":{"$$numberLong":"${1680000000000L + i * 1000L}"}},""" +
        s""""payload":{"$$binary":{"base64":"$bin","subType":"00"}},""" +
        s""""seen":{"$$timestamp":{"t":$tsT,"i":$tsI}},""" +
        s""""amount":{"$$numberDecimal":"$amount"},""" +
        s""""pattern":{"$$regularExpression":{"pattern":"^doc_$i","options":"i"}}}"""
    }
    (0 until 12).foreach { i =>
      ev(1690000000L + i, "insert",
        s""""documentKey":{"_id":{"$$oid":"${bsonOid(i)}"}}""",
        s""""fullDocument":${doc(i, s"$i.25", 1690000000L + i, i + 1L)}""")
    }
    (0 until 12).filter(_ % 4 == 0).foreach { i =>
      ev(1690000100L + i, "update",
        s""""documentKey":{"_id":{"$$oid":"${bsonOid(i)}"}}""",
        s""""fullDocument":${doc(i, s"${i + 100}.75", 1690000100L + i, i + 2L)}""",
        s""""updateDescription":{"updatedFields":{"amount":{"$$numberDecimal":"${i + 100}.75"}},"removedFields":[]}""")
    }
    Seq(3, 7).foreach { i =>
      ev(1690000200L + i, "delete",
        s""""documentKey":{"_id":{"$$oid":"${bsonOid(i)}"}}""")
    }
    lines.mkString("", "\n", "\n")
  }

  // ---------------------------------------------------------- decoderbufs
  // One protobuf RowMessage per WAL frame (pg_logicaldec.proto): the
  // legacy logical-decoding plugin the reference supports next to
  // pgoutput. Exercises int32/int64/string datums, datum_missing
  // (TOAST), bool, double, Point, and the BEGIN/COMMIT frames.

  def pgprotoSegment: Array[Byte] = {
    import graft.serde.Protobuf
    def datum(name: String, oid: Long)(f: Protobuf.Writer => Unit): Array[Byte] = {
      val w = new Protobuf.Writer
      w.string(1, name); w.varint(2, oid); f(w); w.result()
    }
    def int4(n: String, v: Int) = datum(n, 23)(_.varint(3, v.toLong))
    def int8(n: String, v: Long) = datum(n, 20)(_.varint(4, v))
    def text(n: String, v: String) = datum(n, 25)(_.string(8, v))
    def boolD(n: String, v: Boolean) =
      datum(n, 16)(_.varint(7, if (v) 1L else 0L))
    def dbl(n: String, v: Double) =
      datum(n, 701)(_.fixed64(6, java.lang.Double.doubleToLongBits(v)))
    def point(n: String, x: Double, y: Double) = datum(n, 600)(_.msgField(10,
      p => {
        p.fixed64(1, java.lang.Double.doubleToLongBits(x))
        p.fixed64(2, java.lang.Double.doubleToLongBits(y)): Unit
      }))
    def missing(n: String, oid: Long) = datum(n, oid)(_.varint(11, 1L))
    def row(tx: Long, table: String, op: Int, nt: Seq[Array[Byte]],
            ot: Seq[Array[Byte]] = Nil): Array[Byte] = {
      val w = new Protobuf.Writer
      w.varint(1, tx)
      w.varint(2, 1700000000000000L + tx)
      if (table.nonEmpty) w.string(3, table)
      w.varint(4, op.toLong)
      nt.foreach(w.bytes(5, _))
      ot.foreach(w.bytes(6, _))
      w.result()
    }
    import graft.sources.wire.PgProtoDecoder._
    val frames = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    def f(wal: Long, b: Array[Byte]): Unit = frames += ((wal, b))

    f(4900, row(601, "", OpBegin, Nil))
    (0 until 12).foreach { i =>
      f(5000L + i, row(601, "public.pb_items", OpInsert, Seq(
        int4("id", i), int8("qty", i * 3L), text("label", s"pb_$i"))))
    }
    f(5999, row(601, "", OpCommit, Nil))

    f(5999, row(602, "", OpBegin, Nil))
    (0 until 12).filter(_ % 4 == 0).foreach { i =>
      val label = if (i % 8 == 4) missing("label", 25) else text("label", s"pb_$i")
      f(6000L + i, row(602, "public.pb_items", OpUpdate,
        Seq(int4("id", i), int8("qty", i * 3L + 500), label),
        ot = Seq(int4("id", i))))
    }
    (0 until 12).filter(_ % 5 == 0).foreach { i =>
      f(7000L + i, row(602, "public.pb_items", OpDelete, Nil,
        ot = Seq(int4("id", i))))
    }
    f(7999, row(602, "", OpCommit, Nil))

    f(7999, row(603, "", OpBegin, Nil))
    (0 until 3).foreach { i =>
      f(8000L + i, row(603, "public.pb_geo", OpInsert, Seq(
        int4("id", i), boolD("active", i % 2 == 0),
        dbl("score", i * 3 + 0.5), point("loc", i.toDouble, i * 2.0))))
    }
    f(8999, row(603, "", OpCommit, Nil))

    graft.sources.wire.PgOutput.writeSegment(frames.toSeq)
  }

  /** Wire rows the decoderbufs fixture decodes to. */
  def pgprotoRowCount: Long =
    graft.sources.wire.PgProtoDecoder.segmentRows(pgprotoSegment).size.toLong

  val FixtureDir = "src/main/resources/graft/fixtures"

  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else FixtureDir)
    Files.createDirectories(dir)
    Files.write(dir.resolve("pgoutput_segment.pgo"), pgoutputSegment)
    Files.write(dir.resolve("pgoutput_streamed.pgo"), pgoutputStreamedSegment)
    Files.write(dir.resolve("pgoutput_binary.pgo"), pgoutputBinarySegment)
    Files.write(dir.resolve("pgproto_segment.pbo"), pgprotoSegment)
    Files.write(dir.resolve("binlog_segment.blog"), binlogSegment)
    Files.write(dir.resolve("sqlserver_ct.jsonl"),
      sqlServerCtJsonl.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("logminer_contents.jsonl"),
      logMinerContentsJsonl.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("logminer_evolved.jsonl"),
      logMinerEvolvedJsonl.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("mongo_changestream.jsonl"),
      mongoChangeStreamJsonl.getBytes(StandardCharsets.UTF_8))
    println(s"wrote pgoutput rows=$pgoutputRowCount " +
      s"streamed rows=$pgoutputStreamedRowCount " +
      s"binlog rows=$binlogRowCount to $dir")
  }
}
