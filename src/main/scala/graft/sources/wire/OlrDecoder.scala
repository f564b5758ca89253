package graft.sources.wire

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.serde.Protobuf

/** OpenLogReplicator network-protocol decoder — the reference's THIRD
  * Oracle adapter next to LogMiner and the proprietary XStream (ref
  * `debezium-connector-oracle/src/main/java/io/debezium/connector/oracle/olr/
  * client/OlrNetworkClient.java`, protocol schema
  * `debezium-connector-oracle/src/main/proto/OraProtoBuf.proto` — a
  * PUBLISHED protocol, unlike Oracle's own TNS/TTC). The wire is
  * 4-byte LE length-prefixed protobuf frames:
  *
  * {{{
  * RedoRequest  { code=1 database_name=2 oneof{scn=3 tms=4 tm_rel=5}
  *                seq=6 schema=7(rep) c_scn=8 c_idx=9 }
  * RedoResponse { code=1 oneof{scn=2 scns=3} oneof{tm=4 tms=5}
  *                oneof{xid=6 xidn=7} payload=8(rep) c_scn=10 c_idx=11 }
  * Payload      { op=1 schema=2 rid=3 before=4(rep) after=5(rep)
  *                ddl=6 seq=7 offset=8 redo=9 num=10 }
  * Schema       { owner=1 name=2 obj=3 oneof{tm=4 tms=5} column=6(rep) }
  * Value        { name=1 oneof{int64=2 float=3 double=4 string=5 bytes=6} }
  * Op { BEGIN=0 COMMIT=1 INSERT=2 UPDATE=3 DELETE=4 DDL=5 CHKPT=6 }
  * RequestCode  { INFO=0 START=1 CONTINUE=2 CONFIRM=3 }
  * ResponseCode { READY=0 FAILED_START=1 STARTING=2 ALREADY_STARTED=3
  *                REPLICATE=4 PAYLOAD=5 INVALID_DATABASE=6
  *                INVALID_COMMAND=7 }
  * }}}
  *
  * A recorded `.olr` segment IS the raw network stream (the same
  * length-prefixed frames the server sends), so the socket path and the
  * decode path share bytes exactly. Events project to the shared
  * envelope wire rows with `pos = c_scn·2¹⁶ + c_idx` — the commit
  * ordinal pair the protocol itself confirms by (`CONFIRM` carries the
  * same two fields), giving a total order that survives restarts.
  * BEGIN/COMMIT/CHKPT frames carry no row; DDL surfaces as an `op="m"`
  * marker row with the statement text (the reference routes it to its
  * schema-history topic).
  *
  * Scale shape: like decoderbufs, every payload is self-describing
  * (schema rides on each one) — segments decode independently inside
  * Spark tasks with no cross-frame state.
  */
object OlrDecoder {

  val OpBegin = 0; val OpCommit = 1; val OpInsert = 2
  val OpUpdate = 3; val OpDelete = 4; val OpDdl = 5; val OpChkpt = 6

  val ReqInfo = 0; val ReqStart = 1; val ReqContinue = 2; val ReqConfirm = 3

  val RespReady = 0; val RespReplicate = 4; val RespPayload = 5
  val RespInvalidDatabase = 6

  final case class OlrValue(name: String, json: String)
  final case class OlrSchema(owner: String, name: String, obj: Long)
  final case class OlrPayload(op: Int, schema: OlrSchema, rid: String,
                              before: Seq[OlrValue], after: Seq[OlrValue],
                              ddl: String)
  final case class RedoResponse(code: Int, scn: Long, xid: String,
                                payloads: Seq[OlrPayload],
                                cScn: Long, cIdx: Long)
  final case class RedoRequest(code: Int, databaseName: String, scn: Long,
                               cScn: Long, cIdx: Long)

  // ---------------------------------------------------------------- json

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').result()
  }

  private def floatJson(d: Double): String =
    if (d.isNaN) "\"NaN\""
    else if (d.isPosInfinity) "\"Infinity\""
    else if (d.isNegInfinity) "\"-Infinity\""
    else if (d == d.toLong.toDouble && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  // -------------------------------------------------------------- decode

  /** float datums render at FLOAT precision (Java's shortest-round-trip
    * float text) — widening to double first would print noise digits
    * (0.1f → 0.10000000149011612), the trap `PgOutput.pgFloatText`
    * exists to avoid.
    */
  private def float32Json(f: Float): String =
    if (f.isNaN) "\"NaN\""
    else if (f.isPosInfinity) "\"Infinity\""
    else if (f.isNegInfinity) "\"-Infinity\""
    else f.toString

  private def decodeValue(m: Protobuf.Msg): OlrValue = {
    val json = m.fields.collectFirst {
      case (2, Protobuf.VarInt(v)) => v.toString
      case (3, Protobuf.Fixed32(v)) =>
        float32Json(java.lang.Float.intBitsToFloat(v))
      case (4, Protobuf.Fixed64(v)) =>
        floatJson(java.lang.Double.longBitsToDouble(v))
      case (5, Protobuf.Bytes(b)) =>
        jsonString(new String(b, StandardCharsets.UTF_8))
      case (6, Protobuf.Bytes(b)) =>
        jsonString(b.map("%02x".format(_)).mkString.toUpperCase) // RAW hex
    }.getOrElse("null")
    OlrValue(m.string(1).getOrElse(""), json)
  }

  private def decodeSchema(m: Protobuf.Msg): OlrSchema =
    OlrSchema(m.string(1).getOrElse(""), m.string(2).getOrElse(""),
      m.varint(3).getOrElse(0L))

  private def decodePayload(m: Protobuf.Msg): OlrPayload =
    OlrPayload(
      op = m.varint(1).map(_.toInt).getOrElse(OpBegin),
      schema = m.msg(2).map(decodeSchema)
        .getOrElse(OlrSchema("", "", 0L)),
      rid = m.string(3).getOrElse(""),
      before = m.msgs(4).map(decodeValue),
      after = m.msgs(5).map(decodeValue),
      ddl = m.string(6).getOrElse(""))

  def decodeResponse(bytes: Array[Byte]): RedoResponse = {
    val m = Protobuf.decode(bytes)
    RedoResponse(
      code = m.varint(1).map(_.toInt).getOrElse(RespReady),
      scn = m.varint(2).getOrElse(0L),
      xid = m.string(6).getOrElse(m.varint(7).map(_.toString).getOrElse("")),
      payloads = m.msgs(8).map(decodePayload),
      cScn = m.varint(10).getOrElse(0L),
      cIdx = m.varint(11).getOrElse(0L))
  }

  def decodeRequest(bytes: Array[Byte]): RedoRequest = {
    val m = Protobuf.decode(bytes)
    RedoRequest(
      code = m.varint(1).map(_.toInt).getOrElse(ReqInfo),
      databaseName = m.string(2).getOrElse(""),
      scn = m.varint(3).getOrElse(0L),
      cScn = m.varint(8).getOrElse(0L),
      cIdx = m.varint(9).getOrElse(0L))
  }

  // -------------------------------------------------------------- encode

  def encodeValueLong(name: String, v: Long): Array[Byte] =
    new Protobuf.Writer().string(1, name).varint(2, v).result()
  def encodeValueString(name: String, v: String): Array[Byte] =
    new Protobuf.Writer().string(1, name).string(5, v).result()
  def encodeValueDouble(name: String, v: Double): Array[Byte] =
    new Protobuf.Writer().string(1, name)
      .fixed64(4, java.lang.Double.doubleToLongBits(v)).result()
  def encodeValueFloat(name: String, v: Float): Array[Byte] =
    new Protobuf.Writer().string(1, name)
      .fixed32(3, java.lang.Float.floatToIntBits(v)).result()

  def encodeSchema(owner: String, name: String, obj: Long): Array[Byte] =
    new Protobuf.Writer().string(1, owner).string(2, name)
      .varint(3, obj).result()

  def encodePayload(op: Int, schema: Array[Byte], rid: String,
                    before: Seq[Array[Byte]] = Nil,
                    after: Seq[Array[Byte]] = Nil,
                    ddl: String = ""): Array[Byte] = {
    val w = new Protobuf.Writer().varint(1, op.toLong).bytes(2, schema)
    if (rid.nonEmpty) w.string(3, rid)
    before.foreach(w.bytes(4, _))
    after.foreach(w.bytes(5, _))
    if (ddl.nonEmpty) w.string(6, ddl)
    w.result()
  }

  def encodeResponse(code: Int, scn: Long = 0L, xid: String = "",
                     payloads: Seq[Array[Byte]] = Nil,
                     cScn: Long = 0L, cIdx: Long = 0L): Array[Byte] = {
    val w = new Protobuf.Writer().varint(1, code.toLong)
    if (scn != 0L) w.varint(2, scn)
    if (xid.nonEmpty) w.string(6, xid)
    payloads.foreach(w.bytes(8, _))
    if (cScn != 0L) w.varint(10, cScn)
    if (cIdx != 0L) w.varint(11, cIdx)
    w.result()
  }

  def encodeRequest(code: Int, databaseName: String, scn: Long = 0L,
                    cScn: Long = 0L, cIdx: Long = 0L): Array[Byte] = {
    val w = new Protobuf.Writer().varint(1, code.toLong)
      .string(2, databaseName)
    if (scn != 0L) w.varint(3, scn)
    if (cScn != 0L) w.varint(8, cScn)
    if (cIdx != 0L) w.varint(9, cIdx)
    w.result()
  }

  /** One wire frame: size(4 LE) + body (OlrNetworkClient.MESSAGE_SIZE_LENGTH). */
  def frame(body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(body.length); b.put(body)
    b.array()
  }

  /** Read one frame from a blocking stream: None on clean EOF before a
    * size prefix, EOFException mid-frame. THE shared read side of the
    * framing — the client and the fixture server both delegate here so
    * the codec cannot diverge between them.
    */
  def readFrame(in: java.io.DataInputStream): Option[Array[Byte]] = {
    val sz = new Array[Byte](4)
    var got = 0
    while (got < 4) {
      val n = in.read(sz, got, 4 - got)
      if (n < 0) {
        if (got == 0) return None
        throw new java.io.EOFException("mid-frame EOF in size prefix")
      }
      got += n
    }
    val len = ByteBuffer.wrap(sz).order(ByteOrder.LITTLE_ENDIAN).getInt()
    val body = new Array[Byte](len)
    in.readFully(body)
    Some(body)
  }

  /** Split a recorded stream back into frame bodies. */
  def frames(bytes: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def hasNext: Boolean = b.remaining() >= 4
      def next(): Array[Byte] = {
        val n = b.getInt()
        val body = new Array[Byte](n); b.get(body)
        body
      }
    }

  def writeSegment(responses: Seq[Array[Byte]]): Array[Byte] =
    responses.flatMap(frame).toArray

  // ---------------------------------------------------- row projection

  private def jsonObject(vs: Seq[OlrValue]): String =
    vs.map(v => s"${jsonString(v.name)}:${v.json}").mkString("{", ",", "}")

  /** Project a recorded `.olr` stream to envelope wire rows. The key is
    * the before image when present (Oracle supplemental logging puts the
    * identifying columns there), else the first after column — the same
    * positional convention as the decoderbufs path. `pos` is the
    * confirmable (c_scn, c_idx) pair packed into one orderable long —
    * and because no lossless packing of two arbitrary 64-bit values
    * exists, out-of-range pairs FAIL FAST instead of silently aliasing
    * (c_idx ≥ 2¹⁶ or c_scn ≥ 2⁴⁷ would collide or go negative; Oracle
    * SCNs are 48-bit, so the guard trips before the sign bit does).
    */
  def segmentRows(bytes: Array[Byte]): Iterator[PgOutput.WireRow] =
    frames(bytes).map(decodeResponse)
      .filter(_.code == RespPayload)
      .flatMap { r =>
        require(r.cIdx >= 0 && r.cIdx < (1L << 16) &&
          r.cScn >= 0 && r.cScn < (1L << 47),
          s"(c_scn=${r.cScn}, c_idx=${r.cIdx}) outside the packable " +
            "range — widen the pos scheme before ingesting this source")
        val pos = (r.cScn << 16) | r.cIdx
        r.payloads.flatMap { p =>
          val table = s"${p.schema.owner}.${p.schema.name}"
          p.op match {
            case OpInsert => Seq(PgOutput.WireRow(table, "c", pos,
              jsonObject(p.after.take(1)), jsonObject(p.after)))
            case OpUpdate =>
              val key = if (p.before.nonEmpty) p.before else p.after.take(1)
              Seq(PgOutput.WireRow(table, "u", pos,
                jsonObject(key), jsonObject(p.after)))
            case OpDelete => Seq(PgOutput.WireRow(table, "d", pos,
              jsonObject(p.before), "null"))
            case OpDdl => Seq(PgOutput.WireRow(table, "m", pos, "null",
              s"""{"ddl":${jsonString(p.ddl)}}"""))
            case _ => Nil // BEGIN/COMMIT/CHKPT carry no row
          }
        }
      }
}
