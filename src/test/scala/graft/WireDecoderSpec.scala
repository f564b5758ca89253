package graft

import java.nio.ByteBuffer
import java.nio.ByteOrder
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.wire.{MySqlBinlog, PgOutput}
import graft.tools.WireFixtures

/** The wire decoders are checked three independent ways: (1) against
  * HAND-BUILT byte frames laid out from the published protocol docs —
  * not via our own encoder, so an encode/decode pair that both got the
  * layout wrong cannot pass; (2) encoder/decoder round-trips; (3) the
  * COMMITTED fixture files must be byte-equal to the builder output, so
  * the recorded artifacts and the formula oracles cannot drift apart.
  */
class WireDecoderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  // ------------------------------------------------------------ pgoutput

  test("pgoutput Begin decodes from hand-built network-order bytes") {
    val b = ByteBuffer.allocate(21) // big-endian by default
    b.put('B'.toByte)
    b.putLong(0x0102030405060708L)  // final LSN
    b.putLong(770000000000000L)     // commit ts (µs since 2000-01-01)
    b.putInt(501)                   // xid
    val msg = PgOutput.decode(b.array())
    assert(msg == PgOutput.Begin(0x0102030405060708L, 770000000000000L, 501L))
  }

  test("pgoutput Insert decodes a hand-built tuple (text/null/toast tags)") {
    val payload = "42".getBytes("UTF-8")
    val b = ByteBuffer.allocate(64)
    b.put('I'.toByte)
    b.putInt(5001)                  // relation id
    b.put('N'.toByte)               // new-tuple marker
    b.putShort(3)                   // n columns
    b.put('t'.toByte); b.putInt(payload.length); b.put(payload)
    b.put('n'.toByte)               // SQL null
    b.put('u'.toByte)               // unchanged TOAST
    val frame = new Array[Byte](b.position()); b.flip(); b.get(frame)
    val msg = PgOutput.decode(frame)
    assert(msg == PgOutput.Insert(5001, Seq(
      PgOutput.VText("42"), PgOutput.VNull, PgOutput.VUnchangedToast)))
  }

  test("pgoutput Relation decodes flags/oids and NUL-terminated names") {
    val b = ByteBuffer.allocate(128)
    b.put('R'.toByte); b.putInt(7)
    b.put("public".getBytes("UTF-8")); b.put(0.toByte)
    b.put("t1".getBytes("UTF-8")); b.put(0.toByte)
    b.put('d'.toByte)
    b.putShort(2)
    b.put(1.toByte); b.put("id".getBytes("UTF-8")); b.put(0.toByte)
    b.putInt(23); b.putInt(-1)
    b.put(0.toByte); b.put("v".getBytes("UTF-8")); b.put(0.toByte)
    b.putInt(25); b.putInt(-1)
    val frame = new Array[Byte](b.position()); b.flip(); b.get(frame)
    val msg = PgOutput.decode(frame)
    assert(msg == PgOutput.Relation(7, "public", "t1", 'd', Seq(
      PgOutput.Column(1, "id", 23, -1), PgOutput.Column(0, "v", 25, -1))))
    assert(msg.asInstanceOf[PgOutput.Relation].columns.head.isKey)
  }

  test("pgoutput encode/decode round-trips every message shape") {
    import PgOutput._
    val msgs: Seq[Message] = Seq(
      Begin(10, 20, 30), Commit(0, 10, 11, 20), Origin(5, "src"),
      WireFixtures.ItemsRel, TypeMsg(600, "public", "citext"),
      Insert(5001, Seq(VText("1"), VText("7"), VText("a"))),
      Update(5001, Some('K'), Some(Seq(VText("1"), VNull, VNull)),
        Seq(VText("1"), VText("8"), VUnchangedToast)),
      Delete(5001, 'K', Seq(VText("1"), VNull, VNull)),
      Truncate(0, Seq(5001, 5002)),
      LogicalMessage(1, 99, "pfx", "body".getBytes("UTF-8")))
    msgs.foreach {
      case m: LogicalMessage =>
        val d = decode(encode(m)).asInstanceOf[LogicalMessage]
        assert((d.flags, d.lsn, d.prefix) == ((m.flags, m.lsn, m.prefix)))
        assert(d.content.sameElements(m.content))
      case m => assert(decode(encode(m)) == m, s"round-trip failed for $m")
    }
  }

  test("pgoutput bytea text representation renders as base64 in wire rows") {
    import PgOutput._
    val rel = Relation(9001, "public", "bins", 'd', Seq(
      Column(1, "id", 23, -1), Column(0, "payload", 17, -1)))
    val seg = writeSegment(Seq(
      (1L, encode(rel)),
      (2L, encode(Insert(9001, Seq(VText("7"), VText("\\x01ff10")))))))
    val row = segmentRows(seg).next()
    val b64 = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](0x01, 0xff.toByte, 0x10))
    assert(row.payloadJson == s"""{"id":7,"payload":"$b64"}""")
  }

  test("pgoutput array-text property: quoting/escapes/NULL/nesting render to JSON") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import PgOutput._
    val rel = Relation(9100, "public", "arr", 'd', Seq(
      Column(1, "id", 23, -1), Column(0, "ts", 1009, -1),
      Column(0, "ns", 1016, -1)))
    def needsQuote(s: String): Boolean =
      s.isEmpty || s == "NULL" ||
        s.exists(c => c == ',' || c == '"' || c == '\\' || c == '{' ||
          c == '}' || c == ' ')
    def pgElem(s: String, forceQuote: Boolean): String =
      if (forceQuote || needsQuote(s))
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      else s
    def jsonStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val genElem: Gen[String] = Gen.listOf(Gen.oneOf(
      'a', 'b', ' ', ',', '"', '\\', '{', '}')).map(_.take(6).mkString)
    val genText = for {
      elems <- Gen.listOf(genElem).map(_.take(5))
      force <- Gen.oneOf(true, false)
    } yield (elems, force)
    val genNums = Gen.listOf(
      Gen.oneOf(Gen.chooseNum(-99L, 99L).map(_.toString),
        Gen.const("NULL"))).map(_.take(5))

    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(150),
      Prop.forAll(genText, genNums) { case ((elems, force), nums) =>
        val tsLit = elems.map(pgElem(_, force)).mkString("{", ",", "}")
        val nsLit = nums.mkString("{", ",", "}")
        val seg = writeSegment(Seq(
          (1L, encode(rel)),
          (2L, encode(Insert(9100, Seq(
            VText("1"), VText(tsLit), VText(nsLit)))))))
        val row = segmentRows(seg).next()
        val wantTs = elems.map(jsonStr).mkString("[", ",", "]")
        val wantNs = nums.map(n => if (n == "NULL") "null" else n)
          .mkString("[", ",", "]")
        row.payloadJson == s"""{"id":1,"ts":$wantTs,"ns":$wantNs}"""
      })
    assert(res.passed, res.status.toString)
  }

  test("pgoutput fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/pgoutput_segment.pgo")
    assert(in != null, "fixture missing from classpath")
    val committed = try in.readAllBytes() finally in.close()
    assert(committed.sameElements(WireFixtures.pgoutputSegment),
      "committed fixture drifted from WireFixtures builder")
  }

  test("pgoutput cstr decodes UTF-8 identifiers; encode sizes by bytes") {
    import PgOutput._
    // multi-byte table/column names must round-trip intact (per-byte
    // toChar garbled them; char-sized buffers overflowed)
    val rel = Relation(7, "pübliç", "café_页", 'd',
      Seq(Column(1, "idé", 23, -1), Column(0, "名前", 25, -1)))
    assert(decode(encode(rel)) == rel)
    val o = Origin(5L, "origine_données_中文")
    assert(decode(encode(o)) == o)
    // a tuple value larger than the old fixed 64 KiB cap encodes fine
    val big = Insert(7, Seq(VText("x" * 200000), VNull))
    decode(encode(big)) match {
      case Insert(_, Seq(VText(s), VNull)) => assert(s.length == 200000)
      case other => fail(s"bad round-trip: $other")
    }
  }

  test("pgoutput non-finite floats and numerics render as quoted JSON") {
    import PgOutput._
    val rel = Relation(5008, "public", "cdc_f", 'd',
      Seq(Column(1, "id", 23, -1), Column(0, "f", 701, -1),
        Column(0, "n", 1700, -1)))
    def row(f: Double, n: String) = Insert(5008, Seq(
      VText("1"),
      VBinary(java.nio.ByteBuffer.allocate(8)
        .putLong(java.lang.Double.doubleToLongBits(f)).array()),
      VText(n)))
    val seg = writeSegment(Seq(
      (10L, encode(rel)),
      (11L, encode(row(Double.NaN, "NaN"))),
      (12L, encode(row(Double.PositiveInfinity, "Infinity")))))
    val rows = segmentRows(seg).toSeq
    assert(rows(0).payloadJson == """{"id":1,"f":"NaN","n":"NaN"}""")
    assert(rows(1).payloadJson == """{"id":1,"f":"Infinity","n":"Infinity"}""")
  }

  test("pgoutput binary fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/pgoutput_binary.pgo")
    assert(in != null, "fixture missing from classpath")
    val committed = try in.readAllBytes() finally in.close()
    assert(committed.sameElements(WireFixtures.pgoutputBinarySegment),
      "committed fixture drifted from WireFixtures builder")
  }

  test("pgproto fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/pgproto_segment.pbo")
    assert(in != null, "fixture missing from classpath")
    val committed = try in.readAllBytes() finally in.close()
    assert(committed.sameElements(WireFixtures.pgprotoSegment),
      "committed fixture drifted from WireFixtures builder")
  }

  test("pgproto decoderbufs: datum variety, keys, BEGIN/COMMIT/UNKNOWN skip") {
    import graft.sources.wire.PgProtoDecoder
    import graft.serde.Protobuf
    val rows = PgProtoDecoder.segmentRows(WireFixtures.pgprotoSegment).toSeq
    // 12 inserts + 3 updates + 3 deletes + 3 geo inserts, no tx frames
    assert(rows.size == 21)
    assert(rows.count(_.op == "c") == 15)
    val ins0 = rows.find(r => r.op == "c" && r.pos == 5000L).get
    assert(ins0.table == "public.pb_items")
    assert(ins0.keyJson == """{"id":0}""")
    assert(ins0.payloadJson == """{"id":0,"qty":0,"label":"pb_0"}""")
    // update keys come from old_tuple (replica identity), TOAST marker
    val upd4 = rows.find(r => r.op == "u" && r.pos == 6004L).get
    assert(upd4.keyJson == """{"id":4}""")
    assert(upd4.payloadJson.contains("__graft_unchanged_toast__"))
    // delete carries only the old-tuple key
    val del5 = rows.find(r => r.op == "d" && r.pos == 7005L).get
    assert(del5.keyJson == """{"id":5}""" && del5.payloadJson == "null")
    // bool/double/point rendering
    val geo1 = rows.find(_.pos == 8001L).get
    assert(geo1.payloadJson ==
      """{"id":1,"active":false,"score":3.5,"loc":{"x":1.0,"y":2.0}}""")
    // float (fixed32), bytea, int32 sign-extension, UNKNOWN op tolerance
    def datum(name: String, oid: Long)(f: Protobuf.Writer => Unit) = {
      val w = new Protobuf.Writer
      w.string(1, name); w.varint(2, oid); f(w); w.result()
    }
    val w = new Protobuf.Writer
    w.varint(1, 9L); w.string(3, "public.x"); w.varint(4, 0L)
    w.bytes(5, datum("f4", 700)(_.fixed32(5,
      java.lang.Float.floatToIntBits(2.5f))))
    w.bytes(5, datum("neg", 23)(_.varint(3, -7L))) // sign-extended varint
    w.bytes(5, datum("raw", 17)(_.bytes(9, Array[Byte](0x0a, 0x7f))))
    val unknown = {
      val u = new Protobuf.Writer
      u.varint(1, 9L); u.varint(4, -1L); u.result() // Op.UNKNOWN
    }
    val seg = graft.sources.wire.PgOutput.writeSegment(
      Seq((1L, w.result()), (2L, unknown)))
    val extra = PgProtoDecoder.segmentRows(seg).toSeq
    assert(extra.size == 1, "UNKNOWN op must be tolerated and skipped")
    assert(extra.head.payloadJson ==
      """{"f4":2.5,"neg":-7,"raw":"\\x0a7f"}""")
  }

  test("pgoutput numeric wire codec: round trip and digit-group alignment") {
    import PgOutput._
    // values exercising: multi-group ints, leading/trailing zero groups,
    // weight < 0 (pure fractions), negatives, zero, dscale padding
    Seq("0", "1", "-1", "9999", "10000", "123456789", "0.5", "0.0001",
      "-0.070", "12345678.000100", "7.007", "-99999999.999999",
      "20001.000", "0.000000001").foreach { s =>
      assert(numericBinaryToString(numericStringToBinary(s)) == s,
        s"numeric round-trip failed for $s")
    }
    // NaN sign word decodes to the NaN sentinel
    val nan = java.nio.ByteBuffer.allocate(8)
      .putShort(0).putShort(0).putShort(0xC000.toShort).putShort(0).array()
    assert(numericBinaryToString(nan) == "NaN")
  }

  test("pgoutput binary tuples decode per type OID through segmentRows") {
    val rows = PgOutput.segmentRows(WireFixtures.pgoutputBinarySegment).toSeq
    assert(rows.size == 12)
    val r3 = rows.find(_.keyJson == """{"id":3}""").get
    assert(r3.payloadJson ==
      """{"id":3,"flag":false,"s2":4,"i8":3000000003,"f8":3.5,""" +
        """"dec":-3709.111,"name":"bin_3","raw":"BAUW",""" +
        """"d":"2022-03-04","ts":"2023-05-06 07:08:03.240040",""" +
        """"uid":"11223344-5566-7788-0000-000000000003"}""")
    // scientific-range floats render in PG text form, not Java's
    val r7 = rows.find(_.keyJson == """{"id":7}""").get
    assert(r7.payloadJson.contains(""""f8":1.25e+23,"""), r7.payloadJson)
    val r10 = rows.find(_.keyJson == """{"id":10}""").get
    assert(r10.payloadJson.contains(""""f8":2.5e-07,"""), r10.payloadJson)
  }

  test("pgFloatText matches PostgreSQL float8out/float4out form") {
    import PgOutput.pgFloatText
    def f8(d: Double): String = pgFloatText(d, 15, float4 = false)
    assert(f8(0.5) == "0.5" && f8(7.5) == "7.5" && f8(100.0) == "100")
    assert(f8(0.0001) == "0.0001")      // Java says 1.0E-4
    assert(f8(0.00001) == "1e-05")
    assert(f8(1e14) == "100000000000000")
    assert(f8(1e15) == "1e+15")         // PG switches at 1e15
    assert(f8(1.25e23) == "1.25e+23" && f8(-1.25e23) == "-1.25e+23")
    assert(f8(2.5e-7) == "2.5e-07")
    assert(f8(0.0) == "0" && f8(-0.0) == "-0")
    assert(f8(Double.NaN) == "NaN" && f8(Double.PositiveInfinity) == "Infinity")
    // JDK-4511638: Java 17's toString emits 17 digits here, but the
    // shortest round-trip (what PG's Ryu prints) needs only 16
    assert(f8(5.7223519193314771e17) == "5.722351919331477e+17")
    // general shortest-digits property across magnitudes
    (1 to 400).foreach { i =>
      val d = java.lang.Double.longBitsToDouble(
        0x3FF0000000000000L + i * 0x000F2D3A9E000000L)
      val s = f8(math.abs(d))
      assert(java.lang.Double.parseDouble(s) == math.abs(d), s"$d -> $s")
      // no representation one digit shorter round-trips
      val digits = s.takeWhile(_ != 'e').replace("-", "").replace(".", "")
        .dropWhile(_ == '0').reverse.dropWhile(_ == '0').reverse
      if (digits.length > 1) {
        val shorter = new java.math.BigDecimal(math.abs(d)).round(
          new java.math.MathContext(digits.length - 1,
            java.math.RoundingMode.HALF_EVEN))
        assert(shorter.doubleValue() != math.abs(d),
          s"$s is not shortest for $d")
      }
    }
    def f4(f: Float): String = pgFloatText(f.toDouble, 6, float4 = true)
    assert(f4(123456f) == "123456")
    assert(f4(1234567f) == "1.234567e+06") // PG float4 switches at 1e6
    assert(f4(0.25f) == "0.25")
    assert(java.lang.Float.parseFloat(f4(3.4028235e38f)) == 3.4028235e38f)
  }

  test("pgoutput streams over a real socket: handshake, keepalive, byte-identical WAL") {
    import graft.sources.net.PgReplicationClient
    import graft.tools.{PgWireServer, WireFixtures}
    val original = WireFixtures.pgoutputSegment
    val frames = PgOutput.readSegmentFrames(original).toSeq
    val (port, session, server) = PgWireServer.serve(frames)
    val seg = PgReplicationClient.fetchSegment("127.0.0.1", port,
      user = "graft", database = "testdb", slot = "slot1",
      publication = "pub1")
    server.join(10000)
    // the WAL survives the v3-protocol round trip byte-identically
    assert(java.util.Arrays.equals(seg, original))
    assert(PgOutput.segmentRows(seg).size == WireFixtures.pgoutputRowCount)
    // the client spoke the protocol: replication startup parameter,
    // slot + publication in START_REPLICATION, a standby status update
    // answering the keepalive, and a CopyDone ack
    assert(session.sawReplicationParam, "replication=database param missing")
    assert(session.replicationQuery.contains("SLOT \"slot1\"") &&
      session.replicationQuery.contains("publication_names 'pub1'") &&
      session.replicationQuery.contains("proto_version '1'"),
      session.replicationQuery)
    assert(session.statusUpdates.get == 1, "keepalive went unanswered")
    assert(session.copyDoneAcked, "CopyDone not acknowledged")
  }

  test("binlog streams over a real socket: native-password auth, byte-identical events") {
    import graft.sources.net.MySqlBinlogClient
    import graft.tools.{MySqlWireServer, WireFixtures}
    val original = WireFixtures.binlogSegment
    val events = MySqlWireServer.segmentEvents(original)
    assert(events.nonEmpty && events.map(_.length).sum == original.length - 4)
    val (port, session, server) = MySqlWireServer.serve(events, "sekrit")
    val seg = MySqlBinlogClient.fetchSegment("127.0.0.1", port,
      user = "repl", password = "sekrit", serverId = 7,
      binlogFile = "binlog.000001")
    server.join(10000)
    assert(java.util.Arrays.equals(seg, original))
    assert(session.user == "repl" && session.authOk,
      "native-password token rejected")
    assert(session.requestedFile == "binlog.000001" &&
      session.requestedPos == 4 && session.requestedServerId == 7)
    // a wrong password is REJECTED server-side (the token is verified,
    // not waved through) and surfaces as ERR 1045 on the client
    val (port2, session2, _) = MySqlWireServer.serve(events, "sekrit")
    val ex = intercept[java.io.IOException] {
      MySqlBinlogClient.fetchSegment("127.0.0.1", port2,
        user = "repl", password = "wrong", serverId = 7,
        binlogFile = "binlog.000001")
    }
    assert(ex.getMessage.contains("1045") && !session2.authOk)
  }

  test("binlog-dump-gtid over a socket: executed transactions are skipped") {
    import graft.sources.net.MySqlBinlogClient
    import graft.sources.wire.{GtidSet, MySqlBinlog}
    import graft.tools.{MySqlWireServer, WireFixtures}
    val events = MySqlWireServer.segmentEvents(WireFixtures.mysqlGtidSegment)
    val (port, session, server) = MySqlWireServer.serve(events, "sekrit")
    // client already executed everything from sid A (incl. gno 42): the
    // server must replay ONLY the sid-B transaction + the anonymous group
    val executed = GtidSet.parse(s"${WireFixtures.GtidSidA}:1-42")
    val seg = MySqlBinlogClient.fetchSegment("127.0.0.1", port,
      user = "repl", password = "sekrit", serverId = 7,
      binlogFile = "binlog.000001", executedGtids = Some(executed))
    server.join(10000)
    assert(session.requestedGtids == executed.text,
      "the executed set must round-trip through the command payload")
    val (rows, prev) = MySqlBinlog.segmentRowsGtid(seg,
      Map("testdb.bl_items" -> Seq("id", "qty", "label")))
    // sid-A's 12 inserts skipped wholesale; B's 4 updates + 2 anonymous
    // inserts replayed; the head PREVIOUS_GTIDS still present
    assert(rows.size == 6)
    assert(rows.count(_._2 == s"${WireFixtures.GtidSidB}:7") == 4)
    assert(rows.count(_._2 == "") == 2)
    assert(!prev.isEmpty, "head PREVIOUS_GTIDS must replay")

    // a skipped transaction shipped COMPRESSED must still terminate its
    // group: dropping the TRANSACTION_PAYLOAD ends the skip, so the
    // following sid-B transaction replays in full
    import graft.sources.wire.MySqlBinlog._
    def row(i: Int): Row = Row(Seq(Some(i), Some(i * 2L), Some(s"z$i")))
    val packed = writeSegment(Seq(
      encodeMySqlGtid(100, WireFixtures.GtidSidA, gno = 42),
      encodeTransactionPayload(200, Seq(
        encodeTableMap(120, WireFixtures.BlMap),
        encodeRows(WRITE_ROWS_V2, 130, WireFixtures.BlMap, Seq(row(1))),
        encodeXid(140, 1L))),
      encodeMySqlGtid(210, WireFixtures.GtidSidB, gno = 7),
      encodeTableMap(220, WireFixtures.BlMap),
      encodeRows(WRITE_ROWS_V2, 230, WireFixtures.BlMap, Seq(row(2))),
      encodeXid(240, 2L)))
    val (p2, s2, srv2) = MySqlWireServer.serve(
      MySqlWireServer.segmentEvents(packed), "sekrit")
    val seg2 = MySqlBinlogClient.fetchSegment("127.0.0.1", p2,
      user = "repl", password = "sekrit", serverId = 7,
      binlogFile = "binlog.000001",
      executedGtids = Some(GtidSet.parse(s"${WireFixtures.GtidSidA}:1-42")))
    srv2.join(10000)
    assert(s2.authOk)
    val (rows2, _) = MySqlBinlog.segmentRowsGtid(seg2,
      Map("testdb.bl_items" -> Seq("id", "qty", "label")))
    assert(rows2.map(r => (r._1.payloadJson.contains("z2"), r._2)) ==
      Seq((true, s"${WireFixtures.GtidSidB}:7")),
      s"compressed skip must not swallow the next group: $rows2")
  }

  test("transaction payload: zstd and raw compressed txs decode like plain") {
    import graft.sources.wire.MySqlBinlog
    import graft.sources.wire.MySqlBinlog._
    def row(i: Int): Row = Row(Seq(Some(i), Some(i * 2L), Some(s"tp$i")))
    val body = Seq(
      encodeTableMap(80, graft.tools.WireFixtures.BlMap),
      encodeRows(WRITE_ROWS_V2, 90, graft.tools.WireFixtures.BlMap,
        (0 until 5).map(row)),
      encodeXid(100, 3L))
    def rows(seg: Array[Byte]) = MySqlBinlog.segmentRows(seg,
      Map("testdb.bl_items" -> Seq("id", "qty", "label"))).toSeq
    val plain = rows(writeSegment(body))
    // zstd-compressed payload produces identical rows
    val zstd = rows(writeSegment(Seq(
      encodeTransactionPayload(120, body, compress = true))))
    assert(zstd == plain)
    // uncompressed (compression_type NONE, lenenc 255 > one byte) too
    val none = rows(writeSegment(Seq(
      encodeTransactionPayload(120, body, compress = false))))
    assert(none == plain)
    // the container never leaks: flattened stream has no payload event
    assert(readSegment(writeSegment(Seq(
      encodeTransactionPayload(120, body)))).toSeq
      .forall(!_.isInstanceOf[TransactionPayloadEvent]))
  }

  test("gtid set algebra holds under random sets (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.sources.wire.{GtidSet, MySqlBinlog}
    val sids = Seq(
      "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa",
      "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb",
      "cccccccc-cccc-cccc-cccc-cccccccccccc")
    val genSet: Gen[GtidSet] = for {
      n <- Gen.chooseNum(0, 3)
      entries <- Gen.listOfN(n, for {
        sid <- Gen.oneOf(sids)
        ivs <- Gen.nonEmptyListOf(for {
          a <- Gen.chooseNum(1L, 60L); w <- Gen.chooseNum(0L, 10L)
        } yield (a, a + w))
      } yield sid -> ivs)
    } yield entries.foldLeft(GtidSet.empty) { case (acc, (sid, ivs)) =>
      ivs.foldLeft(acc) { case (s, (a, b)) =>
        (a to b).foldLeft(s)((t, g) => t.add(sid, g))
      }
    }
    val gno = Gen.chooseNum(1L, 75L)
    val sid = Gen.oneOf(sids)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(genSet, genSet, sid, gno) { (x, y, s, g) =>
        // text form is a lossless canonical encoding
        (GtidSet.parse(x.text) == x) &&
          // wire body (end-exclusive intervals) round-trips
          (MySqlBinlog.decodeGtidSetBody(
            MySqlBinlog.encodeGtidSetBody(x)) == x) &&
          // subtract removes exactly y's members: membership algebra
          (x.subtract(y).contains(s, g) ==
            (x.contains(s, g) && !y.contains(s, g))) &&
          // subtraction result is always contained in the minuend
          x.subtract(y).isContainedWithin(x) &&
          // add then contains
          x.add(s, g).contains(s, g) &&
          // containment is consistent with emptiness of the difference
          (x.isContainedWithin(y) == x.subtract(y).isEmpty)
      })
    assert(res.passed, res.status.toString)
  }

  test("olr: continue path resumes by confirmed pair; wrong source rejected") {
    import graft.sources.net.OlrClient
    import graft.sources.wire.OlrDecoder
    import graft.tools.{OlrServer, WireFixtures}
    // an already-started source answers INFO with REPLICATE: the client
    // must resume with CONTINUE(c_scn, c_idx), never a bare scn (the
    // reference documents the restart-from-last-confirmed trap)
    val (port, session, server) = OlrServer.serve(
      WireFixtures.olrResponses.drop(1), "ORCLPDB1", alreadyStarted = true)
    val seg = OlrClient.fetchSegment("127.0.0.1", port, "ORCLPDB1",
      scn = 990L, cScn = 1000L, cIdx = 1L)
    server.join(10000)
    assert(session.continueCScn == 1000L && session.continueCIdx == 1L)
    assert(session.startScn == -1, "CONTINUE path must not send START")
    // resumed stream carries everything after the confirmed commit
    val rows = OlrDecoder.segmentRows(seg).toSeq
    assert(rows.map(_.op).groupBy(identity).view.mapValues(_.size).toMap ==
      Map("u" -> 3, "d" -> 3, "m" -> 1))
    // request codec: every field round-trips
    val req = OlrDecoder.decodeRequest(OlrDecoder.encodeRequest(
      OlrDecoder.ReqContinue, "SRC", scn = 7L, cScn = 9L, cIdx = 2L))
    assert(req == OlrDecoder.RedoRequest(OlrDecoder.ReqContinue, "SRC",
      7L, 9L, 2L))
    // float datums render at FLOAT precision, not double-widened noise
    val fseg = OlrDecoder.writeSegment(Seq(OlrDecoder.encodeResponse(
      OlrDecoder.RespPayload, scn = 1L,
      payloads = Seq(OlrDecoder.encodePayload(OlrDecoder.OpInsert,
        OlrDecoder.encodeSchema("S", "T", 1L), "r1",
        after = Seq(OlrDecoder.encodeValueLong("ID", 1L),
          OlrDecoder.encodeValueFloat("F", 0.1f)))),
      cScn = 10L, cIdx = 1L)))
    val frow = OlrDecoder.segmentRows(fseg).next()
    assert(frow.payloadJson.contains("\"F\":0.1"),
      s"float widened to double noise: ${frow.payloadJson}")
    // out-of-range confirm pairs fail fast instead of aliasing pos
    val badSeg = OlrDecoder.writeSegment(Seq(OlrDecoder.encodeResponse(
      OlrDecoder.RespPayload, scn = 1L,
      payloads = Seq(OlrDecoder.encodePayload(OlrDecoder.OpInsert,
        OlrDecoder.encodeSchema("S", "T", 1L), "r1",
        after = Seq(OlrDecoder.encodeValueLong("ID", 1L)))),
      cScn = 10L, cIdx = 70000L)))
    intercept[IllegalArgumentException] {
      OlrDecoder.segmentRows(badSeg).toSeq
    }
    // a wrong source name is rejected with INVALID_DATABASE
    val (port2, _, _) = OlrServer.serve(
      WireFixtures.olrResponses, "ORCLPDB1")
    val ex = intercept[java.io.IOException] {
      OlrClient.fetchSegment("127.0.0.1", port2, "WRONGDB", scn = 990L)
    }
    assert(ex.getMessage.contains("6"), ex.getMessage)
  }

  test("BSON bridge round-trips the change-stream corpus byte-identically") {
    import graft.serde.Bson
    val lines = graft.tools.WireFixtures.mongoChangeStreamJsonl
      .linesIterator.toSeq
    assert(lines.nonEmpty)
    lines.foreach { line =>
      val parsed = Bson.parseJson(line)
      // JSON → BSON tree → wire bytes → BSON tree → JSON is identity
      val (decoded, n) = Bson.decode(
        Bson.encode(parsed.asInstanceOf[Bson.BDoc]))
      assert(n == Bson.encode(parsed.asInstanceOf[Bson.BDoc]).length)
      assert(Bson.renderJson(decoded) == line, line)
    }
    // the codec survives the types the fixture happens not to cover
    val exotic = Bson.BDoc(Seq(
      "neg" -> Bson.BInt64(-42L), "i32" -> Bson.BInt32(7),
      "big" -> Bson.BInt64(Long.MaxValue), "d" -> Bson.BDouble(-0.5),
      "b" -> Bson.BBool(false), "z" -> Bson.BNull,
      "esc" -> Bson.BStr("a\"b\\c\nd"),
      "arr" -> Bson.BArr(Seq(Bson.BInt64(1), Bson.BStr("x")))))
    val (back, _) = Bson.decode(Bson.encode(exotic))
    assert(back == exotic)
    assert(Bson.parseJson(Bson.renderJson(exotic)) == Bson.BDoc(
      exotic.fields.map { // int32 widens to int64 across the JSON bridge
        case (k, Bson.BInt32(v)) => k -> Bson.BInt64(v.toLong)
        case kv => kv
      }))
  }

  test("BSON type gamut: ObjectId/datetime/binary/timestamp/decimal128/" +
      "regex round-trip wire bytes AND the Extended JSON bridge") {
    import graft.serde.Bson
    import graft.serde.Bson._
    val doc = BDoc(Seq(
      "_id" -> BObjectId("65e0a1b2c3d4e5f6a7b80001"),
      "created" -> BDateTime(1680000123456L),
      "neg_date" -> BDateTime(-473385600000L), // pre-epoch (signed int64)
      "bin" -> BBinary(0, Array[Byte](1, 2, 3, -1)),
      "uuid" -> BBinary(4, Array.tabulate[Byte](16)(_.toByte)),
      "ts" -> BTimestamp(1690000000L, 7L),
      "ts_max" -> BTimestamp(0xFFFFFFFFL, 0xFFFFFFFFL), // uint32 extremes
      "dec" -> BDecimal128(new java.math.BigDecimal("123.450")),
      "dec_neg" -> BDecimal128(new java.math.BigDecimal("-0.5")),
      "dec_big" -> BDecimal128(
        new java.math.BigDecimal("9999999999999999999999999999999999")),
      "re" -> BRegex("^doc_\\d+$", "i")))
    // wire: encode → decode is identity, including trailing-scale digits
    val (back, n) = Bson.decode(Bson.encode(doc))
    assert(n == Bson.encode(doc).length)
    assert(back == doc)
    assert(back.get("dec").get.asInstanceOf[BDecimal128]
      .value.toString == "123.450") // scale preserved through BID bits
    // Extended JSON: render → parse is identity for every wrapper
    assert(Bson.parseJson(Bson.renderJson(doc)) == doc)
    // canonical forms are the documented wrappers
    val json = Bson.renderJson(doc)
    assert(json.contains(""""_id":{"$oid":"65e0a1b2c3d4e5f6a7b80001"}"""))
    assert(json.contains(""""created":{"$date":{"$numberLong":"1680000123456"}}"""))
    assert(json.contains(""""bin":{"$binary":{"base64":"AQID/w==","subType":"00"}}"""))
    assert(json.contains(""""ts":{"$timestamp":{"t":1690000000,"i":7}}"""))
    assert(json.contains(""""dec":{"$numberDecimal":"123.450"}"""))
    assert(json.contains(
      """"re":{"$regularExpression":{"pattern":"^doc_\\d+$","options":"i"}}"""))
    // relaxed/legacy parse forms normalize into the same typed values
    assert(Bson.parseJson("""{"d":{"$date":1680000123456}}""") ==
      BDoc(Seq("d" -> BDateTime(1680000123456L))))
    assert(Bson.parseJson("""{"n":{"$numberLong":"42"}}""") ==
      BDoc(Seq("n" -> BInt64(42L))))
    assert(Bson.parseJson("""{"n":{"$numberInt":"7"}}""") ==
      BDoc(Seq("n" -> BInt32(7))))
    // a $-prefixed OPERATOR document is NOT a wrapper — stays a BDoc
    val op = Bson.parseJson("""{"$match":{"operationType":"insert"}}""")
    assert(op.isInstanceOf[BDoc] &&
      op.asInstanceOf[BDoc].get("$match").isDefined)
    // decimal128 BID bit patterns (published spec test vectors):
    // 1E0 → high 0x3040000000000000 low 1; -0.5 → 0xB03E... low 5
    assert(Bson.Decimal128.encode(new java.math.BigDecimal("1")) ==
      ((0x3040000000000000L, 1L)))
    assert(Bson.Decimal128.encode(new java.math.BigDecimal("-0.5")) ==
      ((0xB03E000000000000L, 5L)))
    assert(Bson.Decimal128.decode(0x3040000000000000L, 1L)
      .compareTo(java.math.BigDecimal.ONE) == 0)
    // >34-digit coefficient and NaN/Inf bit patterns fail loudly
    intercept[IllegalArgumentException] {
      Bson.Decimal128.encode(new java.math.BigDecimal("1" + "0" * 34))
    }
    intercept[IllegalArgumentException] {
      Bson.Decimal128.decode(0x7C00000000000000L, 0L) // NaN
    }
  }

  test("change stream over a real socket: OP_MSG cursor, server-side $match") {
    import graft.serde.Bson
    import graft.sources.net.MongoWireClient
    import graft.tools.{MongoWireServer, WireFixtures}
    val lines = WireFixtures.mongoChangeStreamJsonl.linesIterator.toSeq
    val docs = lines.map(l => Bson.parseJson(l).asInstanceOf[Bson.BDoc])
    val (port, session, server) = MongoWireServer.serve(docs, batchSize = 10)
    val jsonl = MongoWireClient.fetchJsonl("127.0.0.1", port,
      db = "shop", coll = "items", batchSize = 10)
    server.join(10000)
    // the client spoke the protocol: hello first, the reference's
    // pipeline stages on aggregate, getMore until the cursor closed
    assert(session.helloSeen, "no hello handshake")
    assert(session.sawChangeStreamStage, "$changeStream stage missing")
    assert(session.sawSplitStage, "$changeStreamSplitLargeEvent missing")
    assert(session.matchedOpTypes ==
      Seq("insert", "update", "replace", "delete"))
    assert(session.getMores.get > 0, "cursor drained in one batch")
    // the server-side $match removed exactly the collection-level drop
    // (split fragments carry no operationType and must pass)
    assert(session.filteredCount == 1)
    val fetched = jsonl.linesIterator.toSeq
    assert(fetched == lines.filterNot(_.contains("\"drop\"")))
    // and the fetched cursor decodes identically to the recording
    assert(graft.sources.wire.MongoChangeStream
      .segmentRows(fetched.iterator).size.toLong ==
      WireFixtures.mongoRowCount)
  }

  test("CDC table over a real socket: TDS login, LSN-window polls, round-trip rows") {
    import graft.serde.Bson
    import graft.sources.net.SqlServerTdsClient
    import graft.tools.MsSqlWireServer
    import graft.tools.MsSqlWireServer._
    import graft.tools.WireFixtures
    import graft.tools.WireFixtures.sqlServerLsn
    val lines = WireFixtures.sqlServerCtJsonl.linesIterator.toSeq
    val b64 = java.util.Base64.getDecoder
    val cols = Seq(Col("__$start_lsn", TVarBinary),
      Col("__$seqval", TVarBinary), Col("__$operation", TIntN),
      Col("__$update_mask", TVarBinary), Col("id", TIntN),
      Col("name", TVarChar), Col("price", TFltN), Col("notes", TVarChar))
    val rows: Seq[MsSqlWireServer.Row] = lines.map { line =>
      val doc = Bson.parseJson(line).asInstanceOf[Bson.BDoc]
      cols.map(c => doc.get(c.name).get match {
        case Bson.BNull => None
        case Bson.BStr(v) if c.tpe == TVarBinary => Some(b64.decode(v))
        case Bson.BStr(v) => Some(v)
        case Bson.BInt64(v) => Some(v.toInt)
        case Bson.BDouble(v) => Some(v)
        case other => fail(s"unexpected $other")
      })
    }
    val (port, session, _) = MsSqlWireServer.serve(cols, rows, "cdc-pass")
    val conn = SqlServerTdsClient.connect("127.0.0.1", port,
      "cdc_reader", "cdc-pass", "testdb")
    val jsonl = try {
      assert(session.authOk && session.user == "cdc_reader" &&
        session.database == "testdb")
      assert(session.tdsVersion == 0x74000004, "TDS 7.4 expected")
      val hi = SqlServerTdsClient.maxLsn(conn)
      assert(java.util.Arrays.equals(hi, sqlServerLsn(0x25, 0x327, 3)))
      // one full-range poll must round-trip every fixture row, in order,
      // byte-identically through COLMETADATA/ROW tokens and back to JSONL
      val (meta, fetched) = SqlServerTdsClient.pollChanges(conn,
        "dbo_products", sqlServerLsn(0, 0, 0), hi)
      assert(meta.map(_.name) == cols.map(_.name))
      SqlServerTdsClient.rowsToJsonl(meta, fetched)
    } finally conn.close()
    assert(jsonl.linesIterator.toSeq == lines)
    // the server evaluated the hex-literal window, reference query shape
    assert(session.queries.exists(q =>
      q.contains("fn_cdc_get_all_changes_dbo_products") &&
        q.contains("0x00000000000000000000") &&
        q.contains("all update old")))
    // a narrow window genuinely filters server-side
    val (port2, _, _) = MsSqlWireServer.serve(cols, rows, "cdc-pass")
    val conn2 = SqlServerTdsClient.connect("127.0.0.1", port2,
      "cdc_reader", "cdc-pass", "testdb")
    try {
      val (_, sub) = SqlServerTdsClient.pollChanges(conn2, "dbo_products",
        sqlServerLsn(0x25, 0x300, 0), sqlServerLsn(0x25, 0x3ff, 0xffff))
      assert(sub.size == 7) // exactly the deletes
      assert(sub.forall(_(2).contains(1)))
    } finally conn2.close()
    // wrong password is rejected server-side with ERROR 18456
    val (port3, session3, _) = MsSqlWireServer.serve(cols, rows, "cdc-pass")
    val ex = intercept[java.io.IOException] {
      SqlServerTdsClient.connect("127.0.0.1", port3,
        "cdc_reader", "wrong", "testdb")
    }
    assert(ex.getMessage.contains("18456") && !session3.authOk)
  }

  test("pgoutput segmentRows: ops, keys from REPLICA IDENTITY, toast sentinel") {
    val rows = PgOutput.segmentRows(WireFixtures.pgoutputSegment).toSeq
    assert(rows.size == WireFixtures.pgoutputRowCount)
    val byOp = rows.groupBy(_.op).view.mapValues(_.size).toMap
    assert(byOp == Map("c" -> 55, "u" -> 8, "d" -> 7, "t" -> 2, "m" -> 1))
    // truncate option bits surface in the payload
    val truncs = rows.filter(_.op == "t").sortBy(_.pos)
    assert(truncs.map(_.payloadJson) == Seq(
      """{"cascade":false,"restart_identity":false}""",
      """{"cascade":true,"restart_identity":true}"""))
    // array columns: pg text form → typed JSON arrays (quotes, escapes, NULL)
    val arr3 = rows.find(r => r.table == "public.cdc_arrays" &&
      r.keyJson == """{"id":3}""").get
    assert(arr3.payloadJson ==
      """{"id":3,"nums":[3,30,null],"tags":["a b","q\"3","plain3"]}""")
    val ins5 = rows.find(r => r.op == "c" && r.pos == 1005).get
    assert(ins5.table == "public.cdc_items")
    assert(ins5.keyJson == """{"id":5}""")
    assert(ins5.payloadJson == """{"id":5,"qty":35,"label":"item_5"}""")
    val upd5 = rows.find(r => r.op == "u" && r.pos == 2005).get
    assert(upd5.payloadJson ==
      s"""{"id":5,"qty":1035,"label":"${PgOutput.UnchangedToastSentinel}"}""")
    val del6 = rows.find(r => r.op == "d" && r.pos == 3006).get
    assert(del6.keyJson == """{"id":6}""" && del6.payloadJson == "null")
  }

  test("pgoutput v2 stream control messages round-trip") {
    import PgOutput._
    val msgs = Seq(StreamStart(601, firstSegment = true), StreamStop,
      StreamCommit(601, 0, 7000, 7001, 99L), StreamAbort(602, 602))
    msgs.foreach(m => assert(decode(encode(m)) == m))
    // in-stream data message: tag, then xid, then the regular body
    val streamed = Streamed(601L, Insert(5001, Seq(VText("1"))))
    assert(decode(encode(streamed), inStream = true) == streamed)
  }

  test("pgoutput streamed fixture: interleaved chunks attribute by xid; abort drops") {
    val events = PgOutput.segmentTxEvents(
      WireFixtures.pgoutputStreamedSegment).toSeq
    val byTx = events.groupBy(_._1)
    // tx601: 10 inserts + 1 commit marker; tx602: 8 inserts, NO marker
    assert(byTx("tx601").count(_._2.op == "c") == 10)
    assert(byTx("tx601").count(_._2.op == "m") == 1)
    assert(byTx("tx601").find(_._2.op == "m").get._2.pos == 7000)
    assert(byTx("tx602").count(_._2.op == "c") == 8)
    assert(!byTx("tx602").exists(_._2.op == "m"),
      "aborted tx must not produce a commit marker")
    // interleaving: a tx601 row decoded from the chunk AFTER tx602's
    // first chunk still lands on tx601
    val late601 = events.find { case (tx, r) =>
      tx == "tx601" && r.keyJson == """{"id":107}""" }
    assert(late601.isDefined)
  }

  test("pgoutput streamed fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/pgoutput_streamed.pgo")
    assert(in != null, "fixture missing from classpath")
    val committed = try in.readAllBytes() finally in.close()
    assert(committed.sameElements(WireFixtures.pgoutputStreamedSegment),
      "committed fixture drifted from WireFixtures builder")
  }

  // -------------------------------------------------------------- binlog

  test("binlog header and TABLE_MAP decode from hand-built LE bytes") {
    // hand-build: magic + TABLE_MAP(tableId=9, testdb.t2, [LONG, VARCHAR(20)])
    val body = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 6).foreach(i => body.put(((9L >> (8 * i)) & 0xff).toByte))
    body.putShort(1)                       // flags
    body.put(6.toByte); body.put("testdb".getBytes("UTF-8")); body.put(0.toByte)
    body.put(2.toByte); body.put("t2".getBytes("UTF-8")); body.put(0.toByte)
    body.put(2.toByte)                     // col count (lenenc < 0xfb)
    body.put(3.toByte); body.put(15.toByte) // LONG, VARCHAR
    body.put(2.toByte)                     // metadata len
    body.putShort(20)                      // VARCHAR max length
    body.put(3.toByte)                     // nullability bitmap (both nullable)
    val bodyBytes = new Array[Byte](body.position()); body.flip(); body.get(bodyBytes)
    val ev = ByteBuffer.allocate(19 + bodyBytes.length).order(ByteOrder.LITTLE_ENDIAN)
    ev.putInt(1700000000); ev.put(19.toByte); ev.putInt(1)
    ev.putInt(19 + bodyBytes.length); ev.putInt(4321); ev.putShort(0)
    ev.put(bodyBytes)
    val seg = MySqlBinlog.writeSegment(Seq(ev.array()))
    val events = MySqlBinlog.readSegment(seg).toSeq
    assert(events == Seq(MySqlBinlog.TableMapEvent(4321L,
      MySqlBinlog.TableMap(9L, "testdb", "t2", Seq(3, 15), Seq(0, 20)))))
  }

  test("binlog WRITE_ROWS decodes values, null bitmap, varchar prefix") {
    import MySqlBinlog._
    val map = TableMap(9L, "testdb", "t2", Seq(TYPE_LONG, TYPE_VARCHAR), Seq(0, 20))
    val seg = writeSegment(Seq(
      encodeTableMap(100, map),
      encodeRows(WRITE_ROWS_V2, 200, map, Seq(
        Row(Seq(Some(7), Some("abc"))),
        Row(Seq(Some(-1), None))))))    // null varchar exercises the bitmap
    val rows = readSegment(seg).collect {
      case RowsEvent(_, WRITE_ROWS_V2, _, rs, _) => rs
    }.flatten.toSeq
    assert(rows == Seq(
      Row(Seq(Some(7), Some("abc"))),
      Row(Seq(Some(-1), None))))
  }

  test("binlog UPDATE_ROWS carries before+after images in one event") {
    import MySqlBinlog._
    val map = WireFixtures.BlMap
    val seg = writeSegment(Seq(
      encodeTableMap(100, map),
      encodeRows(UPDATE_ROWS_V2, 200, map,
        Seq(Row(Seq(Some(1), Some(11L), Some("a")))),
        Seq(Row(Seq(Some(1), Some(18L), None))))))
    val ev = readSegment(seg).collectFirst {
      case e: RowsEvent if e.kind == UPDATE_ROWS_V2 => e
    }.get
    assert(ev.rows == Seq(Row(Seq(Some(1), Some(11L), Some("a")))))
    assert(ev.afterRows == Seq(Row(Seq(Some(1), Some(18L), None))))
  }

  test("binlog fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/binlog_segment.blog")
    assert(in != null, "fixture missing from classpath")
    val committed = try in.readAllBytes() finally in.close()
    assert(committed.sameElements(WireFixtures.binlogSegment),
      "committed fixture drifted from WireFixtures builder")
  }

  test("binlog segmentRows: positional images named via supplied schema") {
    val names = Map(
      "testdb.bl_items" -> Seq("id", "qty", "label"),
      "testdb.bl_types" -> Seq("id", "t", "s", "i3", "f", "d", "y", "dt",
        "ts", "dec", "b"),
      "testdb.bl_json" -> Seq("id", "j"),
      "testdb.bl_geo" -> Seq("id", "g"))
    val rows = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, names).toSeq
    assert(rows.size == WireFixtures.binlogRowCount)
    val byOp = rows.groupBy(_.op).view.mapValues(_.size).toMap
    assert(byOp == Map("c" -> 70, "u" -> 12, "d" -> 4))
    val w12 = rows.find(r => r.op == "c" && r.table == "testdb.bl_items" &&
      r.keyJson == """{"id":12}""").get
    assert(w12.pos == 501) // second WRITE event (rows 10..19)
    assert(w12.payloadJson == """{"id":12,"qty":132,"label":"bl_12"}""")
    val u4 = rows.find(r => r.op == "u" && r.keyJson == """{"id":4}""").get
    assert(u4.payloadJson == """{"id":4,"qty":51,"label":null}""")
  }

  test("binlog type gamut: TINY/SHORT/INT24/FLOAT/DOUBLE/YEAR/DATE/DATETIME2/NEWDECIMAL/BLOB") {
    val names = Map("testdb.bl_types" -> Seq("id", "t", "s", "i3", "f", "d",
      "y", "dt", "ts", "dec", "b"))
    val rows = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, names)
      .filter(_.table == "testdb.bl_types").toSeq
    assert(rows.size == 10)
    val r4 = rows.find(_.keyJson == """{"id":4}""").get
    assert(r4.payloadJson ==
      """{"id":4,"t":-1,"s":-100,"i3":-10000,"f":4.5,"d":9.0,"y":1994,""" +
        """"dt":"2020-01-05","ts":"2021-02-03 04:05:04.400000",""" +
        """"dec":49380.148,"b":"BQYd"}""")
    val r2 = rows.find(_.keyJson == """{"id":2}""").get // negative decimal
    assert(r2.payloadJson.contains(""""dec":-24690.074"""))
  }

  test("binlog QUERY events: in-stream ALTER evolves names, BEGIN is ignored") {
    val names = Map("testdb.bl_items" -> Seq("id", "qty", "label"))
    val rows = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, names)
      .filter(r => r.table == "testdb.bl_items" && r.pos == 993).toSeq
    assert(rows.size == 6)
    val r100 = rows.find(_.keyJson == """{"id":100}""").get
    assert(r100.payloadJson ==
      """{"id":100,"qty":1100,"label":"bl_100","note":"n_100"}""")
    val r101 = rows.find(_.keyJson == """{"id":101}""").get
    assert(r101.payloadJson.endsWith(""""note":null}"""))
    // pre-ALTER rows are untouched by the later DDL
    val r12 = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, names)
      .find(r => r.op == "c" && r.keyJson == """{"id":12}""").get
    assert(r12.payloadJson == """{"id":12,"qty":132,"label":"bl_12"}""")
  }

  test("a CTAS mid-poll marks the table STALE in the LogMiner SCN " +
      "timeline: later rows decode from their own statements, never the " +
      "pre-CTAS column list") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("rownum", LongType), StructField("scn", LongType),
      StructField("opcode", IntegerType), StructField("xid", StringType),
      StructField("csf", IntegerType), StructField("rbk", IntegerType),
      StructField("row_id", StringType), StructField("rs_id", StringType),
      StructField("seg_owner", StringType),
      StructField("table_name", StringType),
      StructField("sql_redo", StringType)))
    def line(rn: Long, scn: Long, opcode: Int, xid: String,
             sql: String): String =
      s"""{"rownum":$rn,"scn":$scn,"opcode":$opcode,"xid":"$xid",""" +
        s""""csf":0,"rbk":0,"row_id":"r$rn","rs_id":"R$scn",""" +
        s""""seg_owner":"ORA","table_name":"ITEMS",""" +
        s""""sql_redo":"${sql.replace("\"", "\\\"")}"}"""
    val lines = Seq(
      line(1, 10, 6, "T1", "start transaction"),
      line(2, 11, 1, "T1",
        "insert into \"ORA\".\"ITEMS\"(\"ID\",\"NAME\") values ('1','one');"),
      line(3, 12, 7, "T1", "commit;"),
      // out-of-subset DDL on the SAME table (the reference parses CTAS
      // with its full ANTLR grammar; the subset grammar skips + stales)
      line(4, 20, 5, "D1",
        "CREATE TABLE \"ORA\".\"ITEMS\" AS SELECT \"ID\", \"EXTRA\" " +
          "FROM \"ORA\".\"ITEMS_OLD\";"),
      line(5, 29, 6, "T2", "start transaction"),
      line(6, 30, 1, "T2",
        "insert into \"ORA\".\"ITEMS\"(\"ID\",\"EXTRA\") values ('2','42');"),
      line(7, 31, 7, "T2", "commit;"))
    import spark.implicits._
    val contents = spark.read.schema(schema).json(lines.toDS())
    val out = graft.sources.wire.LogMiner.decodeEvolving(contents,
      schemas = Map("ORA.ITEMS" -> Seq("ID" -> "long", "NAME" -> "string")),
      keys = Map("ORA.ITEMS" -> Seq("ID"))).collect()
    // pre-CTAS: the seeded typed schema
    val pre = out.find(_.getAs[Long]("scn") == 11L).get
    assert(pre.getAs[String]("after_json") == """{"ID":1,"NAME":"one"}""",
      pre.toString)
    // post-CTAS: the registry is STALE from scn 20 — the row decodes
    // from its OWN statement's columns (string-typed, whole-image key),
    // NOT the pre-CTAS (ID, NAME) list, which would silently drop EXTRA
    // and emit a phantom NAME:null
    val post = out.find(_.getAs[Long]("scn") == 30L).get
    val after = post.getAs[String]("after_json")
    assert(after.contains(""""EXTRA":"42"""") && !after.contains("NAME"),
      post.toString)
  }

  test("unparseable-DDL policy: skip mode warns and marks the table " +
      "stale; strict mode fails naming the config; non-DDL is filtered") {
    import graft.model.DdlParser
    import graft.model.Envelope.TableId
    // CTAS is out of the subset grammar (the reference parses it with
    // its full ANTLR grammar)
    val ctas = "CREATE TABLE bl_sel AS SELECT id, qty FROM bl_items"
    // skip mode: SkippedUnparseable carrying the referenced table
    assert(DdlParser.parseWithPolicy(ctas, skipUnparseable = true) ==
      DdlParser.SkippedUnparseable(Some(TableId.parse("bl_sel")),
        DdlParser.parseWithPolicy(ctas, true)
          .asInstanceOf[DdlParser.SkippedUnparseable].reason))
    // strict mode: fails fast, the message names the policy knob
    val e = intercept[IllegalArgumentException] {
      DdlParser.parseWithPolicy(ctas, skipUnparseable = false)
    }
    assert(e.getMessage.contains("skip.unparseable.ddl"))
    // non-DDL statements are NotDdl under BOTH modes — never an error
    assert(DdlParser.parseWithPolicy("BEGIN", false) == DdlParser.NotDdl)
    assert(DdlParser.parseWithPolicy(
      "INSERT INTO t VALUES (1)", false) == DdlParser.NotDdl)
    // parseable DDL is unaffected by the policy flag
    assert(DdlParser.parseWithPolicy(
      "ALTER TABLE t ADD COLUMN c INT", false)
      .isInstanceOf[DdlParser.Applied])
    // registry replay: the stale mark removes the table's entries, so
    // later rows fall back to wire metadata / positional names
    import scala.collection.mutable
    val names = mutable.Map("testdb.bl_sel" -> Seq("id", "qty"))
    val keys = mutable.Map("testdb.bl_sel" -> Seq(0))
    graft.sources.wire.MySqlBinlog.applyDdl("testdb", ctas, names, keys)
    assert(!names.contains("testdb.bl_sel") &&
      !keys.contains("testdb.bl_sel"))
    // and strict replay throws instead of silently diverging
    names("testdb.bl_sel") = Seq("id", "qty")
    intercept[IllegalArgumentException] {
      graft.sources.wire.MySqlBinlog.applyDdl("testdb", ctas, names, keys,
        skipUnparseableDdl = false)
    }
    // the committed fixture carries LIKE + partition ALTER (parse as of
    // r12) AND the CTAS; the schema-change feed under the default (skip)
    // policy emits exactly the parsed DDL
    val rows = graft.sources.wire.MySqlBinlog.schemaChangeRows(
      graft.tools.WireFixtures.binlogSegment)
    assert(rows.map(_._4) == Seq("CREATE", "ALTER", "CREATE", "ALTER"))
    // strict mode refuses the same segment (the CTAS)
    intercept[IllegalArgumentException] {
      graft.sources.wire.MySqlBinlog.schemaChangeRows(
        graft.tools.WireFixtures.binlogSegment, skipUnparseableDdl = false)
    }
  }

  test("DDL breadth: CREATE…LIKE (both dialect forms), partition " +
      "clauses, expression defaults, reordering CHANGE") {
    import graft.model.DdlParser
    import graft.model.Envelope.TableId
    import graft.operators.SchemaEvolution.{AddColumn, RenameColumn}
    // MySQL LIKE form
    assert(DdlParser.parse("CREATE TABLE a LIKE b") ==
      DdlParser.CreateTableLike(TableId.parse("a"), TableId.parse("b")))
    // Postgres parenthesized form with INCLUDING
    assert(DdlParser.parse(
      "CREATE TABLE s.a (LIKE s.b INCLUDING ALL)") ==
      DdlParser.CreateTableLike(TableId.parse("s.a"), TableId.parse("s.b")))
    // partitioned CREATE: the partition clause (with its own parens and
    // commas) is storage layout — columns parse, clause drops
    val part = DdlParser.parse(
      "CREATE TABLE m (id INT PRIMARY KEY, v TEXT) " +
        "PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (100), " +
        "PARTITION p1 VALUES LESS THAN MAXVALUE)")
    assert(part.asInstanceOf[DdlParser.CreateTable]
      .schema.fieldNames.toSeq == Seq("id", "v"))
    // partition management ALTERs parse to zero row-schema changes
    for (a <- Seq("ADD PARTITION (PARTITION p2 VALUES LESS THAN (200))",
                  "DROP PARTITION p0", "TRUNCATE PARTITION p1",
                  "REORGANIZE PARTITION p1 INTO (PARTITION p2 " +
                    "VALUES LESS THAN (300))",
                  "REMOVE PARTITIONING")) {
      assert(DdlParser.parse(s"ALTER TABLE m $a") ==
        DdlParser.AlterTable(TableId.parse("m"), Nil), a)
    }
    // expression default + reordering CHANGE in one multi-action ALTER
    assert(DdlParser.parse(
      "ALTER TABLE m ADD COLUMN u VARCHAR(36) DEFAULT (UUID()), " +
        "CHANGE COLUMN v vv TEXT AFTER u") ==
      DdlParser.AlterTable(TableId.parse("m"),
        Seq(AddColumn("u", org.apache.spark.sql.types.StringType),
            RenameColumn("v", "vv"))))
    // LIKE replay copies the source registry entry (binlog side)
    import scala.collection.mutable
    val names = mutable.Map("testdb.src" -> Seq("id", "x"))
    val keys = mutable.Map("testdb.src" -> Seq(1))
    graft.sources.wire.MySqlBinlog.applyDdl("testdb",
      "CREATE TABLE dst LIKE src", names, keys)
    assert(names("testdb.dst") == Seq("id", "x") &&
      keys("testdb.dst") == Seq(1))
    // schema-history DDL strings resolve LIKE in statement order and
    // apply the skip policy (an out-of-subset statement between them
    // must not throw out of the partition read)
    val (hn, hk) = graft.sources.wire.MySqlBinlog.schemasFromDdl(
      "CREATE TABLE db.a (id INT, v TEXT PRIMARY KEY); " +
        "CREATE TABLE db.weird AS SELECT 1; " +
        "CREATE TABLE db.b LIKE db.a")
    assert(hn("db.b") == Seq("id", "v") && hk("db.b") == Seq(1))
    assert(!hn.contains("db.weird"))
  }

  test("DDL robustness: skip policy survives non-IAE failures, quoted " +
      "defaults, and the wider table-option tail") {
    import graft.model.DdlParser
    // Oracle NUMBER(*,0) fails with NumberFormatException — the policy
    // must still classify it as unparseable, never crash
    assert(DdlParser.parseWithPolicy(
      "CREATE TABLE t (id NUMBER(*,0))", skipUnparseable = true)
      .isInstanceOf[DdlParser.SkippedUnparseable])
    // a quoted DEFAULT containing ',' and ')' must not steer the
    // column splitter
    val q = DdlParser.parse(
      "CREATE TABLE t (a INT, b VARCHAR(10) DEFAULT 'x,y)z', c INT)")
    assert(q.asInstanceOf[DdlParser.CreateTable]
      .schema.fieldNames.toSeq == Seq("a", "b", "c"))
    // MySQL table options beyond the common set still parse
    val opts = DdlParser.parse(
      "CREATE TABLE t (a INT) CHECKSUM=1 DELAY_KEY_WRITE=1")
    assert(opts.asInstanceOf[DdlParser.CreateTable]
      .schema.fieldNames.toSeq == Seq("a"))
    // a column body followed by AS SELECT is a CTAS: MySQL APPENDS the
    // query's columns, so the declared list is NOT the schema — must
    // follow the skip policy (never register a partial column registry),
    // even with table options between the body and the AS SELECT
    for (ctas <- Seq(
        "CREATE TABLE t (a INT) AS SELECT b FROM x",
        "CREATE TABLE t (a INT) ENGINE=InnoDB AS SELECT b FROM x"))
      assert(DdlParser.parseWithPolicy(ctas, skipUnparseable = true)
        .isInstanceOf[DdlParser.SkippedUnparseable], ctas)
    // ... but 'as select' INSIDE a quoted option value is not a CTAS
    val cmt = DdlParser.parse(
      "CREATE TABLE t (a INT) COMMENT='loaded as select batch'")
    assert(cmt.asInstanceOf[DdlParser.CreateTable]
      .schema.fieldNames.toSeq == Seq("a"))
    // backslash-escaped quote inside a DEFAULT (MySQL outside
    // NO_BACKSLASH_ESCAPES) must not desync the quote tracker, nor a
    // doubled '' (standard SQL escape)
    val esc = DdlParser.parse(
      """CREATE TABLE t (a VARCHAR(5) DEFAULT 'a\'b', b INT, """ +
        "c VARCHAR(5) DEFAULT 'x''y', d INT)")
    assert(esc.asInstanceOf[DdlParser.CreateTable]
      .schema.fieldNames.toSeq == Seq("a", "b", "c", "d"))
  }

  test("binlog QUERY DDL replay: CREATE seeds, DROP COLUMN shifts keys, RENAME moves") {
    import MySqlBinlog._
    def segment(ddl: (Long, String, String)*)(rows: (Long, TableMap, Seq[Row])*) = {
      val evs = ddl.map { case (p, db, sql) => encodeQuery(p, db, sql) } ++
        rows.flatMap { case (p, m, rs) =>
          Seq(encodeTableMap(p - 1, m), encodeRows(WRITE_ROWS_V2, p, m, rs)) }
      writeSegment(evs)
    }
    // CREATE names an unseeded table (db-qualified by the event schema);
    // pk rides the statement, landing on the SECOND column
    val m1 = TableMap(1L, "db1", "t", Seq(TYPE_LONG, TYPE_LONG), Seq(0, 0))
    val created = segmentRows(segment(
      (10L, "db1", "CREATE TABLE t (a INT, b INT PRIMARY KEY)"))(
      (20L, m1, Seq(Row(Seq(Some(1), Some(2)))))), Map.empty).toSeq
    assert(created.head.keyJson == """{"b":2}""" &&
      created.head.payloadJson == """{"a":1,"b":2}""")
    // DROP of a column BEFORE the key shifts the key index left
    val m2 = TableMap(2L, "db1", "t", Seq(TYPE_LONG), Seq(0))
    val dropped = segmentRows(segment(
      (10L, "db1", "CREATE TABLE t (a INT, b INT PRIMARY KEY)"),
      (11L, "db1", "ALTER TABLE t DROP COLUMN a"))(
      (20L, m2, Seq(Row(Seq(Some(7)))))), Map.empty).toSeq
    assert(dropped.head.keyJson == """{"b":7}""" &&
      dropped.head.payloadJson == """{"b":7}""")
    // RENAME TABLE carries the registry to the new name
    val m3 = TableMap(3L, "db1", "t2", Seq(TYPE_LONG, TYPE_LONG), Seq(0, 0))
    val renamed = segmentRows(segment(
      (10L, "db1", "CREATE TABLE t (a INT, b INT PRIMARY KEY)"),
      (11L, "db1", "RENAME TABLE t TO t2"))(
      (20L, m3, Seq(Row(Seq(Some(3), Some(4)))))), Map.empty).toSeq
    assert(renamed.head.table == "db1.t2" &&
      renamed.head.payloadJson == """{"a":3,"b":4}""")
  }

  test("binlog string/temporal tail: CHAR/ENUM/SET/BIT/TIME2/TIMESTAMP2 via wire metadata") {
    // no DDL entry for bl_more — names, pk, and ENUM/SET value lists all
    // ride the TABLE_MAP's WL#4618 optional metadata through the encoder
    // and back out of the decoder
    val rows = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, Map.empty)
      .filter(_.table == "testdb.bl_more").toSeq
    assert(rows.size == 6 && rows.forall(_.op == "c"))
    val r0 = rows.find(_.keyJson == """{"id":0}""").get
    assert(r0.payloadJson ==
      """{"id":0,"ch":"ch_0","color":"red","tags":"","bits":0,""" +
        """"dur":"10:00:00.000","at":"2023-11-14 22:13:20.000000"}""")
    val r3 = rows.find(_.keyJson == """{"id":3}""").get // multi-member SET
    assert(r3.payloadJson.contains(""""tags":"a,b"""") &&
      r3.payloadJson.contains(""""bits":771"""))
    val r5 = rows.find(_.keyJson == """{"id":5}""").get // negative TIME
    assert(r5.payloadJson.contains(""""dur":"-15:10:15.555"""") &&
      r5.payloadJson.contains(""""at":"2023-11-14 22:13:25.000035""""))
  }

  test("TIME2 packed binary round-trips the borrow at every fsp (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import MySqlBinlog._
    val genTm = for {
      neg <- Gen.oneOf(true, false)
      h <- Gen.chooseNum(0, 838); m <- Gen.chooseNum(0, 59)
      s <- Gen.chooseNum(0, 59); fsp <- Gen.chooseNum(0, 6)
      us0 <- Gen.chooseNum(0, 999999)
    } yield {
      val us = us0 / pow10(6 - fsp) * pow10(6 - fsp) // storable at this fsp
      Tm(neg && (h | m | s | us) != 0, h, m, s, us, fsp)
    }
    val prop = Prop.forAll(genTm) { t =>
      val b = java.nio.ByteBuffer.allocate(16)
      encodeTime2(b, t); b.flip()
      decodeTime2(b, t.fsp) == t
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300),
      prop).passed)
  }

  private def pow10(n: Int): Int = math.pow(10, n).toInt

  test("json_binary decodes from hand-built bytes (inline int16 + outlined string)") {
    // {"a":5,"st":"hi"} in the SMALL object layout, laid out by hand from
    // MySQL json_binary.h — not via our encoder
    val bytes = Array[Int](
      0x00,                   // type: small object
      0x02, 0x00,             // count = 2
      0x18, 0x00,             // size = 24
      0x12, 0x00, 0x01, 0x00, // key "a"  @18 len 1
      0x13, 0x00, 0x02, 0x00, // key "st" @19 len 2
      0x05, 0x05, 0x00,       // value: int16 inline = 5
      0x0c, 0x15, 0x00,       // value: string @21
      'a', 's', 't',
      0x02, 'h', 'i').map(_.toByte)
    assert(MySqlBinlog.decodeJsonBinary(bytes) == """{"a":5,"st":"hi"}""")
  }

  test("json_binary encode/decode round-trips nesting, literals, int widths") {
    import MySqlBinlog._
    val v = JObj(Seq(
      "n" -> JNull, "t" -> JBool(true), "f" -> JBool(false),
      "small" -> JInt(-7), "mid" -> JInt(1 << 20), "big" -> JInt(1L << 40),
      "s" -> JStr("""quote " and \ back"""),
      "arr" -> JArr(Seq(JInt(1), JStr("x"), JArr(Seq(JBool(false))))),
      "obj" -> JObj(Seq("k" -> JStr("v")))))
    val got = decodeJsonBinary(encodeJsonBinary(v))
    // keys come back in the server's (length, bytes) storage order
    assert(got == """{"f":false,"n":null,"s":"quote \" and \\ back",""" +
      """"t":true,"arr":[1,"x",[false]],"big":1099511627776,""" +
      """"mid":1048576,"obj":{"k":"v"},"small":-7}""")
  }

  test("json_binary property: decode(encode(tree)) equals an independent renderer") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import MySqlBinlog._
    val genScalar: Gen[JsonVal] = Gen.oneOf(
      Gen.const(JNull),
      Gen.oneOf(true, false).map(JBool),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(JInt(_)),
      Gen.chooseNum(-40000L, 40000L).map(JInt(_)), // exercise int16/int32
      Gen.chooseNum(-1e12, 1e12).map(JDouble(_)),
      Gen.alphaNumStr.map(s => JStr(s.take(8))),
      Gen.oneOf("q\"x", "b\\s", "ué中", "").map(JStr))
    def genTree(depth: Int): Gen[JsonVal] =
      if (depth == 0) genScalar
      else Gen.frequency(
        3 -> genScalar,
        1 -> Gen.listOfN(3, genTree(depth - 1)).map(JArr(_)),
        1 -> Gen.listOfN(3, Gen.zip(Gen.alphaLowerStr.map(_.take(5)),
          genTree(depth - 1))).map(JObj(_)))

    def esc(s: String): String = {
      val sb = new StringBuilder
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.result()
    }
    def render(v: JsonVal): String = v match {
      case JNull => "null"
      case JBool(b) => b.toString
      case JInt(l) => l.toString
      case JDouble(d) => d.toString
      case JStr(s) => "\"" + esc(s) + "\""
      case JArr(xs) => xs.map(render).mkString("[", ",", "]")
      case JObj(fs) =>
        // independently reproduce the server's (length, bytes) key order
        fs.sortBy { case (k, _) =>
          val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (kb.length, kb.map(b => (b & 0xff).toChar).mkString)
        }.map { case (k, x) => "\"" + esc(k) + "\":" + render(x) }
          .mkString("{", ",", "}")
    }

    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(genTree(3)) { v =>
        decodeJsonBinary(encodeJsonBinary(v)) == render(v)
      })
    assert(res.passed, res.status.toString)
  }

  test("binlog JSON column rows decode through segmentRows") {
    val names = Map("testdb.bl_json" -> Seq("id", "j"))
    val rows = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, names)
      .filter(r => r.table == "testdb.bl_json" && r.op == "c").toSeq
    assert(rows.size == 10)
    val r3 = rows.find(_.keyJson == """{"id":3}""").get
    assert(r3.payloadJson ==
      """{"id":3,"j":{"id":3,"huge":3000000003,"name":"js_3",""" +
        """"flags":[false,null,3000],"nested":{"big":100003,"depth":2}}}""")
  }

  test("json_binary tree parser is the encoder's inverse (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import MySqlBinlog._
    val genScalar: Gen[JsonVal] = Gen.oneOf(
      Gen.const(JNull), Gen.oneOf(true, false).map(JBool),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(JInt(_)),
      Gen.chooseNum(-1e12, 1e12).map(JDouble(_)),
      Gen.alphaNumStr.map(s => JStr(s.take(8))))
    def genTree(depth: Int): Gen[JsonVal] =
      if (depth == 0) genScalar
      else Gen.frequency(
        3 -> genScalar,
        1 -> Gen.listOfN(3, genTree(depth - 1)).map(JArr(_)),
        1 -> Gen.listOfN(3, Gen.zip(Gen.alphaLowerStr.map(_.take(5)),
          genTree(depth - 1))).map(JObj(_)))
    // parse(encode(v)) == v up to the encoder's canonical key order —
    // so compare through a second encode
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(genTree(3)) { v =>
        val bytes = encodeJsonBinary(v)
        encodeJsonBinary(parseJsonBinary(bytes)).sameElements(bytes)
      })
    assert(res.passed, res.status.toString)
  }

  test("json diffs: replace member + element, remove nested, insert key") {
    import MySqlBinlog._
    val doc = JObj(Seq("id" -> JInt(1), "name" -> JStr("a"),
      "flags" -> JArr(Seq(JBool(true), JNull, JInt(7))),
      "nested" -> JObj(Seq("depth" -> JInt(2), "big" -> JInt(9)))))
    val out = applyJsonDiffs(doc, Seq(
      JsonDiff(DIFF_REPLACE, "$.name", Some(JStr("b"))),
      JsonDiff(DIFF_REPLACE, "$.flags[2]", Some(JInt(8))),
      JsonDiff(DIFF_REMOVE, "$.nested.depth", None),
      JsonDiff(DIFF_INSERT, "$.extra", Some(JInt(5))),
      JsonDiff(DIFF_INSERT, "$.flags[1]", Some(JStr("mid"))),
      JsonDiff(DIFF_REMOVE, "$.flags[0]", None)))
    assert(decodeJsonBinary(encodeJsonBinary(out)) ==
      """{"id":1,"name":"b","extra":5,"flags":["mid",null,8],""" +
        """"nested":{"big":9}}""")
    // mysql semantics: INSERT never overwrites an existing member
    val keep = applyJsonDiffs(doc,
      Seq(JsonDiff(DIFF_INSERT, "$.name", Some(JStr("zz")))))
    assert(keep == doc)
  }

  test("PARTIAL_UPDATE_ROWS reconstructs post-images from diff cells") {
    val names = Map("testdb.bl_json" -> Seq("id", "j"))
    val rows = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, names)
      .filter(r => r.table == "testdb.bl_json" && r.op == "u").toSeq
    assert(rows.size == 4)
    val r3 = rows.find(_.keyJson == """{"id":3}""").get
    assert(r3.payloadJson ==
      """{"id":3,"j":{"id":3,"huge":3000000003,"name":"js_3_patched",""" +
        """"extra":15,"flags":[false,null,3001],"nested":{"big":100003}}}""")
  }

  test("GEOMETRY columns decode SRID + WKB through segmentRows") {
    val names = Map("testdb.bl_geo" -> Seq("id", "g"))
    val rows = MySqlBinlog.segmentRows(WireFixtures.binlogSegment, names)
      .filter(_.table == "testdb.bl_geo").toSeq
    assert(rows.size == 8)
    val r2 = rows.find(_.keyJson == """{"id":2}""").get
    // POINT(2 2.5), little-endian WKB, SRID 4326
    assert(r2.payloadJson ==
      """{"id":2,"g":{"srid":4326,"wkb":"AQEAAAAAAAAAAAAAQAAAAAAAAARA"}}""")
    // non-point geometries ride the same SRID+WKB channel and decode
    // through the full Wkb traverser
    def wkbOf(r: graft.sources.wire.PgOutput.WireRow): Array[Byte] = {
      val b64 = """"wkb":"([^"]+)"""".r
        .findFirstMatchIn(r.payloadJson).get.group(1)
      java.util.Base64.getDecoder.decode(b64)
    }
    val r6 = wkbOf(rows.find(_.keyJson == """{"id":6}""").get)
    assert(graft.functions.Wkb.geometryType(r6) == graft.functions.Wkb.LineString)
    assert(graft.functions.Wkb.ordinates(r6) == Seq(1.5, 2.5, 3.5, 4.5))
    val r7 = wkbOf(rows.find(_.keyJson == """{"id":7}""").get)
    assert(graft.functions.Wkb.geometryType(r7) == graft.functions.Wkb.Polygon)
    assert(graft.functions.Wkb.ordinates(
      graft.functions.Wkb.swapAxes(r7)) ==
      Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0))
  }

  test("NEWDECIMAL decodes from hand-built packed bytes (sign-bit + NOT)") {
    import MySqlBinlog._
    // DECIMAL(12,3) 1234.567: int group 1234 -> 4B big-endian 0x000004D2,
    // frac 567 -> 2B 0x0237; first byte sign-bit XOR -> 0x80 00 04 D2 02 37.
    // Negative: bitwise NOT of every byte.
    val pos = Array(0x80, 0x00, 0x04, 0xD2, 0x02, 0x37).map(_.toByte)
    val neg = pos.map(b => (~b).toByte)
    def rowsEvent(decBytes: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 6).foreach(i => b.put(((903L >> (8 * i)) & 0xff).toByte))
      b.putShort(0)            // flags
      b.putShort(2)            // extra len (self-inclusive)
      b.put(1.toByte)          // col count (lenenc)
      b.put(1.toByte)          // columns-present bitmap: col 0
      b.put(0.toByte)          // row null bitmap: not null
      b.put(decBytes)
      val body = new Array[Byte](b.position()); b.flip(); b.get(body)
      val ev = ByteBuffer.allocate(19 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      ev.putInt(0); ev.put(30.toByte); ev.putInt(1)
      ev.putInt(19 + body.length); ev.putInt(0); ev.putShort(0); ev.put(body)
      ev.array()
    }
    val map = TableMap(903L, "t", "d1", Seq(TYPE_NEWDECIMAL), Seq((12 << 8) | 3))
    val seg = writeSegment(Seq(encodeTableMap(10, map), rowsEvent(pos),
      rowsEvent(neg)))
    val vals = readSegment(seg).collect {
      case RowsEvent(_, WRITE_ROWS_V2, _, rs, _) => rs.head.cells.head.get
    }.toSeq
    assert(vals == Seq(Dec("1234.567"), Dec("-1234.567")))
  }

  // ------------------------------------------------------ DSv2 streaming

  test("pgoutput segment streams through the DSv2 source (decode in reader)") {
    val dir = java.nio.file.Files.createTempDirectory("wire-pgo").toString
    val n = WireFixtures.pgoutputRowCount
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, f"part-g${1L}%012d-b-p${0}%05d-n$n.pgo"),
      WireFixtures.pgoutputSegment)
    val got = spark.read
      .format(classOf[graft.sources.v2.ChangeLogSource].getName)
      .option("path", dir).load()
    assert(got.count() == n)
    assert(got.filter(org.apache.spark.sql.functions.col("op") === "d")
      .count() == 7)
  }

  // ------------------------------------------- SQL Server CDC change table

  import org.apache.spark.sql.functions._
  import graft.sources.wire.SqlServerCdc

  private def ctFixtureDf = {
    import org.apache.spark.sql.types._
    val path = java.nio.file.Files.createTempFile("ct", ".jsonl")
    java.nio.file.Files.write(path,
      WireFixtures.sqlServerCtJsonl.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("__$start_lsn", StringType),
      StructField("__$seqval", StringType),
      StructField("__$operation", IntegerType),
      StructField("__$update_mask", StringType),
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("price", DoubleType), StructField("notes", StringType)))
    spark.read.schema(schema).json(path.toString)
      .select(
        unbase64(col("`__$start_lsn`")).as("__$start_lsn"),
        unbase64(col("`__$seqval`")).as("__$seqval"),
        col("`__$operation`").as("__$operation"),
        unbase64(col("`__$update_mask`")).as("__$update_mask"),
        col("id"), col("name"), col("price"), col("notes"))
  }

  test("sqlserver CT: update pair folds to one event; mask drives changed cols") {
    val out = SqlServerCdc.decode(ctFixtureDf, "dbo.products", Seq("id"),
      maxTypeCols = Seq("notes")).cache()
    assert(out.count() == 57) // 40 c + 10 u + 7 d
    val u0 = out.filter(col("op") === "u" && col("key_json") === """{"id":0}""")
      .head()
    // i=0: only price changed; max-type notes NULL + bit clear → placeholder
    assert(u0.getAs[scala.collection.Seq[String]]("changed_cols").toList ==
      List("price"))
    assert(u0.getAs[String]("after_json").contains("\"notes\":\"__unavailable\""))
    assert(u0.getAs[String]("before_json").contains("\"notes\":\"__unavailable\""))
    val u4 = out.filter(col("op") === "u" && col("key_json") === """{"id":4}""")
      .head()
    // i=4: name explicitly NULLed (bit set) → JSON null, not placeholder
    assert(u4.getAs[scala.collection.Seq[String]]("changed_cols").toList ==
      List("name", "price", "notes"))
    assert(u4.getAs[String]("after_json").contains("\"name\":null"))
    out.unpersist(); ()
  }

  test("sqlserver CT: LSN-window poll is exclusive-low, inclusive-high") {
    val ct = ctFixtureDf
    // window covering exactly insert transactions block 0x100..0x102
    val from = WireFixtures.sqlServerLsn(0x25, 0x100, 3) // exclusive → skips tx 0x100
    val to = WireFixtures.sqlServerLsn(0x25, 0x102, 3)
    val polled = SqlServerCdc.pollWindow(ct, from, to)
    assert(polled.count() == 8) // txs 0x101, 0x102 × 4 inserts each
    // pushdown: binary comparisons reach the scan as data filters
    val plan = polled.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"))
  }

  test("sqlserver CT: short or null masks count every column as changed") {
    // ref SqlServerChangeTablePointer.java:199-217 — absent/short mask ⇒ true
    val df = ctFixtureDf.limit(1)
      .select(SqlServerCdc.maskBitSet(lit(null).cast("binary"), 5).as("nullMask"),
        SqlServerCdc.maskBitSet(lit(Array[Byte](0x01)), 9).as("shortMask"),
        SqlServerCdc.maskBitSet(lit(Array[Byte](0x01)), 1).as("clearBit"),
        SqlServerCdc.maskBitSet(lit(Array[Byte](0x02)), 1).as("setBit"))
    val r = df.head()
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2) && r.getBoolean(3))
  }

  test("sqlserver CT: multi-byte masks are right-aligned (ordinal 0 = last byte)") {
    // server mask 0x0001 over >8 columns: only ordinal 0 changed —
    // ref SqlServerChangeTablePointer reads byte length - i/8 - 1
    val mask = Array[Byte](0x00, 0x01)
    val df = ctFixtureDf.limit(1).select(
      SqlServerCdc.maskBitSet(lit(mask), 0).as("b0"),
      SqlServerCdc.maskBitSet(lit(mask), 1).as("b1"),
      SqlServerCdc.maskBitSet(lit(mask), 8).as("b8"),
      SqlServerCdc.maskBitSet(lit(Array[Byte](0x01, 0x00)), 8).as("hi8"),
      SqlServerCdc.maskBitSet(lit(Array[Byte](0x01, 0x00)), 0).as("hi0"))
    val r = df.head()
    assert(r.getBoolean(0), "ordinal 0 lives in the LAST byte")
    assert(!r.getBoolean(1) && !r.getBoolean(2),
      "no other ordinal may read as changed")
    assert(r.getBoolean(3) && !r.getBoolean(4),
      "ordinal 8 lives in the second byte from the end")
  }

  // ---------------------------------------------------- Oracle LogMiner

  import graft.sources.wire.LogMiner

  test("logminer parser: insert with functions, NULL and Unsupported Type") {
    // shape from ref LogMinerDmlParserTest.java:65-82
    val e = LogMiner.parseDml(
      """insert into "DBZ"."T"("ID","NAME","TS","UT","C1") values """ +
        "('1','Acme',TO_TIMESTAMP('2020-02-01 00:00:00.'),Unsupported Type,NULL);")
    assert(e.op == "c" && e.owner == "DBZ" && e.table == "T")
    assert(e.after("ID").contains("1") && e.after("NAME").contains("Acme"))
    assert(e.after("TS").contains("TO_TIMESTAMP('2020-02-01 00:00:00.')"))
    assert(e.after("UT").contains(LogMiner.UnavailableValue))
    assert(e.after("C1").isEmpty)
  }

  test("logminer parser: update reconciles SET over WHERE; '' unescapes") {
    val e = LogMiner.parseDml(
      """update "DBZ"."T" set "COL1" = 'I love ''Oracle''', "COL2" = NULL """ +
        """where "COL1" = 'old' and "COL2" = '2' and "COL3" IS NULL;""")
    assert(e.op == "u")
    assert(e.after("COL1").contains("I love 'Oracle'"))
    assert(e.after("COL2").isEmpty)           // explicitly cleared
    assert(e.after("COL3").isEmpty)           // copied from before (null)
    assert(e.before("COL1").contains("old") && e.before("COL2").contains("2"))
  }

  test("logminer parser: delete where-clause becomes the before image") {
    val e = LogMiner.parseDml(
      """delete from "DBZ"."T" where "ID" = '5' and "D" = """ +
        "TO_DATE('2020-02-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS');")
    assert(e.op == "d" && e.after.isEmpty)
    assert(e.before("ID").contains("5"))
    assert(e.before("D").contains(
      "TO_DATE('2020-02-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS')"))
  }

  test("logminer decode: CSF chunks, partial rollback, uncommitted tx") {
    import org.apache.spark.sql.types._
    val path = java.nio.file.Files.createTempFile("lm", ".jsonl")
    java.nio.file.Files.write(path,
      WireFixtures.logMinerContentsJsonl.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("rownum", LongType), StructField("scn", LongType),
      StructField("opcode", IntegerType), StructField("xid", StringType),
      StructField("csf", IntegerType), StructField("rbk", IntegerType),
      StructField("row_id", StringType), StructField("rs_id", StringType),
      StructField("seg_owner", StringType),
      StructField("table_name", StringType),
      StructField("sql_redo", StringType)))
    // include-list poll: only PRODUCTS rows (the LOB tables have their
    // own chain-focused test below)
    val out = LogMiner.decode(
      spark.read.schema(schema).json(path.toString)
        .filter(col("table_name") === "PRODUCTS"),
      schemas = Map("ORA.PRODUCTS" -> Seq("ID" -> "long", "NAME" -> "string",
        "PRICE" -> "double", "CREATED" -> "timestamp")),
      keys = Map("ORA.PRODUCTS" -> Seq("ID"))).cache()
    assert(out.count() == 40) // 30 c + 5 u (1 rolled back) + 5 d
    // the CSF-split insert (i=7) reassembled and parsed
    val i7 = out.filter(col("op") === "c" && col("key_json") === """{"ID":7}""")
    assert(i7.head().getAs[String]("after_json").contains("it's_7"))
    // the partially-rolled-back update (i=15) never emits
    assert(out.filter(col("op") === "u" &&
      col("key_json") === """{"ID":15}""").isEmpty)
    // tx4 (ids 100+) ended in ROLLBACK(36): no commit row, no events
    assert(out.filter(col("scn") >= 5600).isEmpty)
    // commit SCN attached from the commit record
    assert(out.filter(col("op") === "u").head()
      .getAs[Long]("commit_scn") == 5300L)
    out.unpersist(); ()
  }

  test("logminer LOB parsers: locator select, write chunks, trim") {
    import graft.sources.wire.LogMiner
    val loc = LogMiner.parseSelectLob(
      """declare  loc_c clob;begin  select "BODY" into loc_c from """ +
        """"ORA"."NOTES" where "ID" = '7' and "T" IS NULL for update;end;""")
    assert(loc == LogMiner.LobLocator("ORA", "NOTES", "BODY",
      Map("ID" -> Some("7"), "T" -> None)))
    val w = LogMiner.parseLobWrite(
      "declare  loc_c clob;  buf_c varchar2(9);begin  " +
        "buf_c := 'it''s ok, x';  dbms_lob.write(loc_c, 9, 4, buf_c);end;")
    assert(w == LogMiner.LobWrite(4, "it's ok, x", isHex = false))
    val wh = LogMiner.parseLobWrite(
      "declare  loc_b blob;  buf_b raw(2);begin  " +
        "buf_b := HEXTORAW('CAFE');  dbms_lob.write(loc_b, 2, 5, buf_b);end;")
    assert(wh == LogMiner.LobWrite(5, "CAFE", isHex = true))
    assert(LogMiner.parseLobTrim(
      "declare  loc_c clob;begin  dbms_lob.trim(loc_c, 42);end;") == 42)
  }

  test("logminer LOB chains: merge into DML, synthetic update, rollback drop") {
    import graft.sources.wire.LogMiner
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("rownum", LongType), StructField("scn", LongType),
      StructField("opcode", IntegerType), StructField("xid", StringType),
      StructField("csf", IntegerType), StructField("rbk", IntegerType),
      StructField("row_id", StringType), StructField("rs_id", StringType),
      StructField("seg_owner", StringType),
      StructField("table_name", StringType),
      StructField("sql_redo", StringType)))
    val path = java.nio.file.Files.createTempFile("lm-lob", ".jsonl")
    java.nio.file.Files.write(path,
      WireFixtures.logMinerContentsJsonl.getBytes("UTF-8"))
    val out = LogMiner.decode(spark.read.schema(schema).json(path.toString),
      schemas = Map(
        "ORA.PRODUCTS" -> Seq("ID" -> "long", "NAME" -> "string",
          "PRICE" -> "double", "CREATED" -> "timestamp"),
        "ORA.NOTES" -> Seq("ID" -> "long", "TITLE" -> "string",
          "BODY" -> "string"),
        "ORA.FILES" -> Seq("ID" -> "long", "DATA" -> "string"),
        "ORA.PAGES" -> Seq("ID" -> "long", "XDOC" -> "string"),
        "ORA.MEMOS" -> Seq("ID" -> "long", "BODY" -> "string")),
      keys = Map("ORA.PRODUCTS" -> Seq("ID"), "ORA.NOTES" -> Seq("ID"),
        "ORA.FILES" -> Seq("ID"), "ORA.PAGES" -> Seq("ID"),
        "ORA.MEMOS" -> Seq("ID")),
      lobEnabled = true).cache()
    // chunks at offsets 1 and 7 assemble into the insert's after image
    val n1 = out.filter(col("table") === "ORA.NOTES" && col("op") === "c")
      .head()
    assert(n1.getAs[String]("after_json") ==
      """{"ID":1,"TITLE":"n1","BODY":"hello world"}""")
    // direct dbms_lob mutation: synthetic update, write 8 then trim 5,
    // non-key non-LOB columns unavailable
    val n2 = out.filter(col("table") === "ORA.NOTES" && col("op") === "u")
      .head()
    assert(n2.getAs[String]("key_json") == """{"ID":2}""")
    assert(n2.getAs[String]("after_json") ==
      """{"ID":2,"TITLE":"__unavailable","BODY":"abcde"}""")
    assert(n2.getAs[Long]("commit_scn") == 5830L)
    // BLOB hex chunks land at byte offsets
    val f3 = out.filter(col("table") === "ORA.FILES").head()
    assert(f3.getAs[String]("after_json") ==
      """{"ID":3,"DATA":"DEADBEEF"}""")
    // tx8's chain ended in ROLLBACK: NOTES row 9 never appears
    assert(out.filter(col("table") === "ORA.NOTES" &&
      col("key_json") === """{"ID":9}""").count() == 0)
    // XML chain fragments concatenate into the insert's after image
    val x1 = out.filter(col("table") === "ORA.PAGES" && col("op") === "c")
      .head()
    assert(x1.getAs[String]("after_json") ==
      """{"ID":1,"XDOC":"<page>hello</page>"}""")
    // direct XML mutation (binary begin + HEXTORAW with the
    // missing-end-quote bug) → synthetic update
    val x2 = out.filter(col("table") === "ORA.PAGES" &&
      col("key_json") === """{"ID":2}""").head()
    assert(x2.getAs[String]("op") == "u")
    assert(x2.getAs[String]("after_json") == """{"ID":2,"XDOC":"<p>ab</p>"}""")
    assert(x2.getAs[Long]("commit_scn") == 5905L)
    // XML_REDO := NULL nulls the column
    val x4 = out.filter(col("table") === "ORA.PAGES" &&
      col("key_json") === """{"ID":4}""").head()
    assert(x4.getAs[String]("after_json") == """{"ID":4,"XDOC":null}""")
    // tx11's chain ended in ROLLBACK: PAGES row 3 never appears
    assert(out.filter(col("table") === "ORA.PAGES" &&
      col("key_json") === """{"ID":3}""").count() == 0)
    // 32K extended-string fragments concatenate into the insert
    val m1 = out.filter(col("table") === "ORA.MEMOS").head()
    assert(m1.getAs[String]("op") == "c")
    assert(m1.getAs[String]("after_json") ==
      """{"ID":1,"BODY":"long text part one and part two"}""")
    // tx14's 32K chain ended in ROLLBACK: MEMOS row 2 never appears
    assert(out.filter(col("table") === "ORA.MEMOS").count() == 1)
    // LOB_ERASE discards tx15's chain: NOTES row 5 never appears even
    // though the tx committed after a write
    assert(out.filter(col("table") === "ORA.NOTES" &&
      col("key_json") === """{"ID":5}""").count() == 0)
    // re-begin on the same (row, column): only the second document
    // survives — the first chain's fragments must not leak
    val x6 = out.filter(col("table") === "ORA.PAGES" &&
      col("key_json") === """{"ID":6}""").head()
    assert(x6.getAs[String]("after_json") == """{"ID":6,"XDOC":"<b/>"}""")
    out.unpersist(); ()
  }

  test("sqlserver CT fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/sqlserver_ct.jsonl")
    assert(in != null, "fixture missing from resources")
    val committed = try in.readAllBytes() finally in.close()
    assert(java.util.Arrays.equals(committed,
      WireFixtures.sqlServerCtJsonl.getBytes("UTF-8")))
  }

  test("logminer fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/logminer_contents.jsonl")
    assert(in != null, "fixture missing from resources")
    val committed = try in.readAllBytes() finally in.close()
    assert(java.util.Arrays.equals(committed,
      WireFixtures.logMinerContentsJsonl.getBytes("UTF-8")))
  }

  // ------------------------------------------- MongoDB change stream

  import graft.sources.wire.MongoChangeStream

  private def mongoFixtureDf = {
    val path = java.nio.file.Files.createTempFile("mongo", ".jsonl")
    java.nio.file.Files.write(path,
      WireFixtures.mongoChangeStreamJsonl.getBytes("UTF-8"))
    spark.read.text(path.toString)
  }

  test("mongo change stream: op mapping, patch fields, drop filtered") {
    val out = MongoChangeStream.decode(mongoFixtureDf).cache()
    // 40 inserts + 1 split insert, 8 updates + 4 replaces, 7 deletes; drop gone
    val byOp = out.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp == Map("c" -> 41L, "u" -> 12L, "d" -> 7L))
    val u5 = out.filter(col("op") === "u" && col("key_json") === """{"_id":5}""")
      .head()
    assert(u5.getAs[String]("updated_json") == """{"qty":1035}""")
    assert(u5.getAs[String]("removed_fields") == "price")
    assert(!u5.getAs[String]("after_json").contains("price"),
      "removed field must be absent from the post-image")
    val d0 = out.filter(col("op") === "d" && col("key_json") === """{"_id":0}""")
      .head()
    assert(d0.getAs[String]("after_json") == null)
    out.unpersist(); ()
  }

  test("mongo change stream: split-event fragments reassemble on token prefix") {
    val out = MongoChangeStream.decode(mongoFixtureDf)
    val big = out.filter(col("key_json") === """{"_id":999}""").head()
    assert(big.getAs[String]("op") == "c")
    assert(big.getAs[String]("table") == "shop.items")
    // resume token = LAST fragment's token (what a client resumes from)
    assert(big.getAs[String]("resume_token") ==
      WireFixtures.mongoToken(WireFixtures.mongoOrd(1680000500L), 3))
    assert(big.getAs[String]("after_json").contains("sku_big"))
    assert(big.getAs[Long]("ord") == WireFixtures.mongoOrd(1680000500L))
  }

  test("mongo decode: distinct unsplit events in one second never merge") {
    // Real v1 `_data` tokens: '82' header + 8-byte BsonTimestamp. Two
    // events in the same second (i=1 vs i=2) share their first 16 hex
    // chars — only rows carrying a splitEvent marker may be grouped, so
    // these must decode as two events, not one field-wise merge.
    def ev(i: Int): String =
      s"""{"_id":{"_data":"825a5a5a5a0000000${i}29295a1004"},""" +
        s""""operationType":"insert","clusterTime":{"t":1516000000,"i":$i},""" +
        s""""ns":{"db":"d","coll":"c"},"documentKey":{"_id":$i},""" +
        s""""fullDocument":{"_id":$i}}"""
    val path = java.nio.file.Files.createTempFile("mongo2", ".jsonl")
    java.nio.file.Files.write(path, s"${ev(1)}\n${ev(2)}\n".getBytes("UTF-8"))
    val out = MongoChangeStream.decode(spark.read.text(path.toString)).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("key_json")).toSet ==
      Set("""{"_id":1}""", """{"_id":2}"""))
  }

  test("json_binary encode fails fast past SMALL-container 16-bit offsets") {
    import MySqlBinlog._
    assertThrows[IllegalArgumentException] {
      encodeJsonBinary(JObj(Seq("k" -> JStr("x" * 40000))))
    }
    assertThrows[IllegalArgumentException] {
      encodeJsonBinary(JArr(Seq(JStr("x" * 40000))))
    }
  }

  test("mongo cursor-order segmentRows: fragment buffering, op filter, payloads") {
    val rows = MongoChangeStream.segmentRows(
      WireFixtures.mongoChangeStreamJsonl.linesIterator).toSeq
    assert(rows.size == WireFixtures.mongoRowCount)
    val byOp = rows.groupBy(_.op).view.mapValues(_.size).toMap
    assert(byOp == Map("c" -> 41, "u" -> 12, "d" -> 7)) // drop filtered out
    val big = rows.find(_.keyJson == """{"_id":999}""").get
    assert(big.op == "c" && big.payloadJson.contains("sku_big"))
    assert(big.pos == WireFixtures.mongoOrd(1680000500L))
    val d0 = rows.find(r => r.op == "d" && r.keyJson == """{"_id":0}""").get
    assert(d0.payloadJson == "null")
    // a lone fragment followed by a plain event is a protocol error
    assertThrows[IllegalStateException] {
      MongoChangeStream.segmentRows(Iterator(
        """{"_id":{"_data":"aa"},"splitEvent":{"fragment":1,"of":2}}""",
        """{"_id":{"_data":"bb"},"operationType":"insert","ns":{"db":"d","coll":"c"},"clusterTime":{"t":1,"i":1},"documentKey":{"_id":1},"fullDocument":{}}"""))
        .toSeq
    }
    // ... and so is a segment that ENDS inside a split event — silently
    // dropping the buffered fragments would lose the event
    assertThrows[IllegalStateException] {
      MongoChangeStream.segmentRows(Iterator(
        """{"_id":{"_data":"aa"},"splitEvent":{"fragment":1,"of":2}}"""))
        .toSeq
    }
  }

  test("mongo fixture: committed bytes equal the builder's output") {
    val in = getClass.getResourceAsStream("/graft/fixtures/mongo_changestream.jsonl")
    assert(in != null, "fixture missing from resources")
    val committed = try in.readAllBytes() finally in.close()
    assert(java.util.Arrays.equals(committed,
      WireFixtures.mongoChangeStreamJsonl.getBytes("UTF-8")))
  }

  test("mariadb: gtid groups, annotation scoping, standalone flag, gtid list") {
    import graft.sources.wire.MySqlBinlog
    import graft.sources.wire.MySqlBinlog._
    def row(i: Int): Row = Row(Seq(Some(i), Some(i * 2L), Some(s"x$i")))
    val seg = writeSegment(Seq(
      encodeMariaGtidList(50, Seq((5L, 9L, 100L))),
      encodeMariaGtid(60, domain = 5, seqNo = 101, standalone = true),
      encodeAnnotateRows(70, "stmt-A"),
      encodeTableMap(80, graft.tools.WireFixtures.BlMap),
      encodeRows(WRITE_ROWS_V2, 90, graft.tools.WireFixtures.BlMap,
        Seq(row(1))),
      // a second GTID group WITHOUT an annotation: its rows must NOT
      // inherit stmt-A (group start resets the statement text)
      encodeMariaGtid(100, domain = 5, seqNo = 102),
      encodeRows(WRITE_ROWS_V2, 110, graft.tools.WireFixtures.BlMap,
        Seq(row(2))),
      encodeXid(120, 1L)))
    // raw event parse: flags round-trip
    val events = readSegment(seg).toSeq
    val gtids = events.collect { case g: MariaGtidEvent => g }
    assert(gtids.map(_.gtid) == Seq("5-1-101", "5-1-102"))
    assert(gtids.map(_.standalone) == Seq(true, false))
    val (rows, gtidList) = MySqlBinlog.segmentRowsMaria(seg,
      Map("testdb.bl_items" -> Seq("id", "qty", "label")))
    assert(gtidList == "[\"5-9-100\"]")
    assert(rows.map(_._2) == Seq("5-1-101", "5-1-102"))
    assert(rows.map(_._3) == Seq("stmt-A", ""),
      "second group must not inherit the first group's annotation")
  }

  test("gtid set: parse/format, contains, containment, subtract, filter") {
    import graft.sources.wire.GtidSet
    val a = GtidSet.parse(
      "AAAAAAAA-aaaa-aaaa-aaaa-aaaaaaaaaaaa:1-5:7-9,\n" +
        "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb:1-3")
    // canonical: lowercase sids, sorted, single points without dash
    assert(a.text == "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa:1-5:7-9," +
      "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb:1-3")
    assert(GtidSet.parse(a.text) == a, "text form round-trips")
    assert(a.contains("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa", 8))
    assert(!a.contains("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa", 6))
    // adjacent add coalesces: 6 bridges 1-5 and 7-9
    assert(a.add("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa", 6).text
      .startsWith("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa:1-9"))
    // containment (the resume-position validity check)
    val sub = GtidSet.parse("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa:2-4")
    assert(sub.isContainedWithin(a) && !a.isContainedWithin(sub))
    // subtract carves their intervals out of ours
    val diff = a.subtract(GtidSet.parse(
      "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa:3-7," +
        "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb:1-3"))
    assert(diff.text == "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa:1-2:8-9")
    // gtid.source.includes / excludes projections
    val inc = GtidSet.sourceFilter(Some("a.*"), None)
    assert(a.retainAll(inc).sets.keySet ==
      Set("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"))
    val exc = GtidSet.sourceFilter(None, Some("a.*"))
    assert(a.retainAll(exc).sets.keySet ==
      Set("bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb"))
    // the direct constructor normalizes too: an uppercase-keyed set (as
    // pasted from SHOW MASTER STATUS) equals its lowercase twin and
    // answers membership — a verbatim map would silently fail both
    val up = GtidSet(Map(
      "AAAAAAAA-AAAA-AAAA-AAAA-AAAAAAAAAAAA" -> Seq((7L, 9L), (1L, 5L))))
    assert(up.contains("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa", 3))
    assert(up == GtidSet.parse("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa:1-5:7-9"))
  }

  test("mysql gtid: event framing, previous-gtids roundtrip, source filter") {
    import graft.sources.wire.{GtidSet, MySqlBinlog}
    import graft.sources.wire.MySqlBinlog._
    val seg = graft.tools.WireFixtures.mysqlGtidSegment
    // raw parse: logical clock carried; previous-gtids wire form
    // (end-exclusive) decodes to the inclusive canonical set
    val events = readSegment(seg).toSeq
    val g = events.collect { case e: MySqlGtidEvent => e }
    assert(g.map(_.gtid) == Seq(
      s"${graft.tools.WireFixtures.GtidSidA}:42",
      s"${graft.tools.WireFixtures.GtidSidB}:7", ""))
    assert(g.head.lastCommitted == 41 && g.head.seqNo == 42)
    val prev = events.collect { case PreviousGtidsEvent(_, s) => s }.head
    assert(prev == GtidSet(Map(
      graft.tools.WireFixtures.GtidSidA -> Seq((1L, 41L)),
      graft.tools.WireFixtures.GtidSidB -> Seq((1L, 6L)))))
    // unfiltered projection: every tx's rows, attributed
    val (all, _) = MySqlBinlog.segmentRowsGtid(seg,
      Map("testdb.bl_items" -> Seq("id", "qty", "label")))
    assert(all.count(_._2 == s"${graft.tools.WireFixtures.GtidSidA}:42") == 12)
    assert(all.count(_._2 == s"${graft.tools.WireFixtures.GtidSidB}:7") == 4)
    assert(all.count(_._2 == "") == 2, "anonymous group rows carry ''")
    // includes filter drops the sid-B transaction WHOLESALE
    val (kept, _) = MySqlBinlog.segmentRowsGtid(seg,
      Map("testdb.bl_items" -> Seq("id", "qty", "label")),
      sourceFilter = GtidSet.sourceFilter(Some("a.*"), None))
    assert(kept.size == 14 && !kept.exists(_._2.contains("bbbb")))
  }

  test("checksummed dump over a socket: refused until the client confirms" +
      " support, then byte-identical") {
    import graft.sources.net.MySqlBinlogClient
    val recorded = graft.tools.WireFixtures.binlogMetadataSegment
    val events = graft.tools.MySqlWireServer.segmentEvents(recorded)
    // no SET @master_binlog_checksum → ER 1236, like a real server
    val (port1, _, t1) = graft.tools.MySqlWireServer.serve(
      events, "dbz", checksummed = true)
    val ex = intercept[java.io.IOException](
      MySqlBinlogClient.fetchSegment("127.0.0.1", port1, "repl", "dbz",
        serverId = 7, binlogFile = "binlog.000001"))
    t1.join(10000)
    assert(ex.getMessage.contains("1236"))
    // with confirmation the stream arrives intact, CRCs and all
    val (port2, session, t2) = graft.tools.MySqlWireServer.serve(
      events, "dbz", checksummed = true)
    val seg = MySqlBinlogClient.fetchSegment("127.0.0.1", port2, "repl",
      "dbz", serverId = 7, binlogFile = "binlog.000001",
      confirmChecksum = true)
    t2.join(10000)
    assert(session.checksumAcknowledged)
    assert(java.util.Arrays.equals(seg, recorded),
      "socket stream drifted from the recorded checksummed binlog")
    val rows = graft.sources.wire.MySqlBinlog.segmentRows(seg, Map.empty).toSeq
    assert(rows.size == 11 && rows.head.keyJson == """{"id":0}""")
  }

  test("binlog CRC32 checksums: verified and stripped; corruption detected") {
    import graft.sources.wire.MySqlBinlog._
    val events = Seq(
      encodeTableMap(100, graft.tools.WireFixtures.BlMap),
      encodeRows(WRITE_ROWS_V2, 200, graft.tools.WireFixtures.BlMap,
        (0 until 5).map(i =>
          Row(Seq(Some(i), Some(i * 5L), Some(s"ck_$i"))))),
      encodeXid(300, 77L))
    val plain = writeSegment(events)
    val crc = writeSegmentCrc(events)
    // identical decode either way (the FDE itself surfaces as skipped)
    val rowsOf = (seg: Array[Byte]) => segmentRows(seg,
      Map("testdb.bl_items" -> Seq("id", "qty", "label"))).toSeq
    assert(rowsOf(crc) == rowsOf(plain))
    // an FDE declaring NONE adds no checksum framing
    val none = writeSegment(encodeFormatDescription(ChecksumNone) +: events)
    assert(rowsOf(none) == rowsOf(plain))
    // flip one payload byte: the event's CRC check must fail loudly
    // (offset inside the WRITE_ROWS body, past the FDE)
    val corrupted = crc.clone()
    corrupted(crc.length - 30) = (corrupted(crc.length - 30) ^ 0x40).toByte
    val ex = intercept[IllegalArgumentException](rowsOf(corrupted))
    assert(ex.getMessage.contains("CRC32"))
  }

  test("table-map optional metadata: signedness skips non-numeric columns," +
      " wire names/pk are fallbacks, explicit DDL still wins") {
    import graft.sources.wire.MySqlBinlog._
    val seg = graft.tools.WireFixtures.binlogMetadataSegment
    val maps = readSegment(seg).collect { case TableMapEvent(_, m) => m }.toSeq
    assert(maps.head.names ==
      Seq("id", "name", "u8", "u16", "u24", "u32", "u64", "s64", "ratio"))
    // the VARCHAR at index 1 takes no signedness bit: 8 numeric columns,
    // bits (id,u8,u16,u24,u32,u64,s64,ratio) = 0,1,1,1,1,1,0,0
    assert(maps.head.unsigned ==
      Seq(false, false, true, true, true, true, true, false, false))
    assert(maps.head.primaryKey == Seq(0))
    // metadata-driven projection: names and key come from the wire
    val rows = segmentRows(seg, Map.empty).toSeq
    assert(rows.head.keyJson == """{"id":0}""")
    assert(rows.head.payloadJson.contains(""""u8":200"""))
    assert(rows.head.payloadJson.contains(""""u64":9223372036854775808"""))
    assert(rows.head.payloadJson.contains(""""u32":4000000000"""))
    // explicit schema-history names take precedence over wire metadata
    val renamed = segmentRows(seg, Map("testdb.bl_unsigned" ->
      Seq("k", "n", "a", "b", "c", "d", "e", "f", "g"))).toSeq
    assert(renamed.head.payloadJson.startsWith("""{"k":0,"n":"ux_0""""))
    // a map WITHOUT optional metadata still falls back to c<i>/col-0
    val plainRows = segmentRows(writeSegment(Seq(
      encodeTableMap(10, graft.tools.WireFixtures.BlMap),
      encodeRows(WRITE_ROWS_V2, 20, graft.tools.WireFixtures.BlMap,
        Seq(Row(Seq(Some(1), Some(2L), Some("x"))))),
      encodeXid(30, 1L))), Map.empty).toSeq
    assert(plainRows.head.keyJson == """{"c0":1}""")
  }

  test("bsonSortKey orders mixed-type _ids by BSON type rank, then value") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // JSON renderings as get_json_object would surface them: numbers
    // numeric, strings unquoted, bool/object/array literal
    val ids = Seq("10", "2", "apple", "Banana", "true", "false",
      """{"a":1}""", "[1,2]", "null", "-3.5")
    val got = ids.toDF("idj")
      .orderBy(graft.sources.wire.MongoChangeStream.bsonSortKey(col("idj")))
      .collect().map(_.getString(0)).toSeq
    // null < numbers (numeric order) < strings (lexical) < object <
    // array < booleans — the BSON comparison ladder
    assert(got == Seq("null", "-3.5", "2", "10", "Banana", "apple",
      """{"a":1}""", "[1,2]", "false", "true"))
  }
}
