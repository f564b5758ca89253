package graft.sources.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.serde.Bson
import graft.serde.Bson.{BDoc, BDouble, BInt64, BNull, BStr, BVal}

/** Real SQL Server CDC polling client over TCP — the live half of the
  * S11 connector (reference `debezium-connector-sqlserver/.../
  * SqlServerConnection.java` GET_ALL_CHANGES_FOR_TABLE /
  * `SqlServerStreamingChangeEventSource.java` poll loop), speaking
  * TDS 7.4 from the published [MS-TDS] spec: PRELOGIN negotiation
  * (encryption declined), LOGIN7 with the spec's nibble-swap/XOR-0xA5
  * password obfuscation, SQLBatch with ALL_HEADERS, and tabular-result
  * parsing (COLMETADATA / ROW / ERROR / DONE tokens) over EOM-assembled
  * multi-packet messages.
  *
  * Zero egress in this environment, so the client is exercised against
  * the in-process `graft.tools.MsSqlWireServer` — the bytes on the
  * socket are the real protocol either way. Fetched change-table rows
  * render to the same JSONL shape as the recorded fixtures (binary
  * columns base64), dropping straight into `SqlServerCdc.decode`.
  */
object SqlServerTdsClient {

  final case class ColMeta(name: String, tpe: Int)

  final case class Conn(socket: Socket, in: DataInputStream,
                        out: DataOutputStream) {
    def close(): Unit = socket.close()
  }

  private def ucs2(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_16LE)

  /** LOGIN7 password obfuscation per [MS-TDS]: swap nibbles, XOR 0xA5. */
  def obfuscatePassword(password: String): Array[Byte] =
    ucs2(password).map { b =>
      ((((b & 0x0f) << 4) | ((b & 0xf0) >> 4)) ^ 0xA5).toByte
    }

  // ------------------------------------------------------------ framing

  private def readMessage(in: DataInputStream): (Int, Array[Byte]) =
    graft.tools.MsSqlWireServer.readMessage(in)

  private def writeMessage(out: DataOutputStream, tpe: Int,
                           payload: Array[Byte]): Unit =
    graft.tools.MsSqlWireServer.writeMessage(out, tpe, payload)

  // ---------------------------------------------------------- handshake

  private def prelogin(conn: Conn): Unit = {
    val tokens = 2 * 5 + 1
    val bb = ByteBuffer.allocate(tokens + 7)
    bb.put(0.toByte); bb.putShort(tokens.toShort); bb.putShort(6.toShort)
    bb.put(1.toByte); bb.putShort((tokens + 6).toShort); bb.putShort(1.toShort)
    bb.put(0xFF.toByte)
    bb.put(Array[Byte](0, 0, 0, 0, 0, 0))
    bb.put(2.toByte) // ENCRYPT_NOT_SUP: decline TLS
    writeMessage(conn.out, 0x12, bb.array())
    val (tpe, resp) = readMessage(conn.in)
    require(tpe == 0x04, s"unexpected prelogin reply type $tpe")
    // walk the option list for the server's ENCRYPTION verdict
    var i = 0
    var enc = -1
    while ((resp(i) & 0xff) != 0xFF) {
      val tok = resp(i) & 0xff
      val off = ((resp(i + 1) & 0xff) << 8) | (resp(i + 2) & 0xff)
      if (tok == 1) enc = resp(off) & 0xff
      i += 5
    }
    require(enc == 0 || enc == 2, s"server demands encryption (mode $enc)")
  }

  private def login7(conn: Conn, user: String, password: String,
                     database: String): Unit = {
    val host = "graft"; val app = "graft-cdc"; val server = "loopback"
    val cltInt = "graft"; val lang = ""
    val pass = obfuscatePassword(password)
    val strings = Seq(
      ucs2(host) -> host.length, ucs2(user) -> user.length,
      pass -> password.length, ucs2(app) -> app.length,
      ucs2(server) -> server.length, Array[Byte]() -> 0,
      ucs2(cltInt) -> cltInt.length, ucs2(lang) -> lang.length,
      ucs2(database) -> database.length)
    val fixedLen = 36 + strings.size * 4 + 6 + 4 * 3 + 4
    val total = fixedLen + strings.map(_._1.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(total)
    bb.putInt(0x74000004) // TDS 7.4
    bb.putInt(4096)       // requested packet size
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte)
    bb.putInt(0); bb.putInt(0x0409)
    var off = fixedLen
    strings.foreach { case (bytes, chars) =>
      bb.putShort(off.toShort); bb.putShort(chars.toShort)
      off += bytes.length
    }
    bb.put(Array[Byte](0, 1, 2, 3, 4, 5)) // ClientID (MAC)
    bb.putShort(0.toShort); bb.putShort(0.toShort) // SSPI
    bb.putShort(0.toShort); bb.putShort(0.toShort) // AtchDBFile
    bb.putShort(0.toShort); bb.putShort(0.toShort) // ChangePassword
    bb.putInt(0) // cbSSPILong
    strings.foreach { case (bytes, _) => bb.put(bytes) }
    writeMessage(conn.out, 0x10, bb.array())

    val (tpe, resp) = readMessage(conn.in)
    require(tpe == 0x04, s"unexpected login reply type $tpe")
    val tokens = parseTokens(resp, Nil)
    if (!tokens.loginAck)
      throw new java.io.IOException(
        s"login rejected: ${tokens.errors.mkString("; ")}")
  }

  /** Connect and authenticate; the returned Conn carries the session. */
  def connect(host: String, port: Int, user: String, password: String,
              database: String): Conn = {
    val socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    val conn = Conn(socket, new DataInputStream(socket.getInputStream),
      new DataOutputStream(socket.getOutputStream))
    try {
      prelogin(conn)
      login7(conn, user, password, database)
      conn
    } catch { case e: Throwable => socket.close(); throw e }
  }

  // ------------------------------------------------------ result parse

  private final class TokenResult {
    var loginAck = false
    var cols: Seq[ColMeta] = Nil
    val rows = Seq.newBuilder[Seq[Option[Any]]]
    var errors: List[String] = Nil
  }

  private def parseTokens(payload: Array[Byte],
                          expectCols: Seq[ColMeta]): TokenResult = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val res = new TokenResult
    res.cols = expectCols
    var done = false
    while (!done && bb.hasRemaining) {
      (bb.get() & 0xff) match {
        case 0xAD => // LOGINACK
          val len = bb.getShort() & 0xffff
          bb.position(bb.position() + len)
          res.loginAck = true
        case 0xE3 | 0xAB => // ENVCHANGE / INFO: length-prefixed, skip
          val len = bb.getShort() & 0xffff
          bb.position(bb.position() + len)
        case 0xAA => // ERROR
          val len = bb.getShort() & 0xffff
          val end = bb.position() + len
          val number = bb.getInt()
          bb.get(); bb.get() // state, class
          val msgLen = bb.getShort() & 0xffff
          val msg = new String(payload, bb.position(), msgLen * 2,
            StandardCharsets.UTF_16LE)
          res.errors ::= s"$number: $msg"
          bb.position(end)
        case 0x81 => // COLMETADATA
          val count = bb.getShort() & 0xffff
          res.cols = (0 until count).map { _ =>
            bb.getInt() // UserType
            bb.getShort() // flags
            val tpe = bb.get() & 0xff
            tpe match {
              case 0x26 | 0x6D => bb.get() // BYTELEN size
              case 0xA5 => bb.getShort()   // maxlen
              case 0xA7 =>
                bb.getShort()
                bb.position(bb.position() + 5) // collation
              case other => throw new java.io.IOException(
                f"unsupported column type 0x$other%02x")
            }
            val nameLen = bb.get() & 0xff
            val name = new String(payload, bb.position(), nameLen * 2,
              StandardCharsets.UTF_16LE)
            bb.position(bb.position() + nameLen * 2)
            ColMeta(name, tpe)
          }
        case 0xD1 => // ROW
          res.rows += res.cols.map { c =>
            c.tpe match {
              case 0x26 =>
                (bb.get() & 0xff) match {
                  case 0 => None
                  case 4 => Some(bb.getInt())
                  case n => throw new java.io.IOException(s"intN len $n")
                }
              case 0x6D =>
                (bb.get() & 0xff) match {
                  case 0 => None
                  case 8 => Some(java.lang.Double.longBitsToDouble(bb.getLong()))
                  case n => throw new java.io.IOException(s"fltN len $n")
                }
              case 0xA5 =>
                val len = bb.getShort() & 0xffff
                if (len == 0xFFFF) None
                else {
                  val b = new Array[Byte](len); bb.get(b); Some(b)
                }
              case 0xA7 =>
                val len = bb.getShort() & 0xffff
                if (len == 0xFFFF) None
                else {
                  val b = new Array[Byte](len); bb.get(b)
                  Some(new String(b, StandardCharsets.US_ASCII))
                }
            }
          }
        case 0xFD | 0xFE | 0xFF => // DONE / DONEPROC / DONEINPROC
          val status = bb.getShort() & 0xffff
          bb.getShort() // curcmd
          bb.getLong()  // row count
          if ((status & 0x0001) == 0) done = true // no MORE bit: final
          if ((status & 0x0002) != 0 && res.errors.nonEmpty)
            throw new java.io.IOException(
              s"batch failed: ${res.errors.mkString("; ")}")
        case other =>
          throw new java.io.IOException(f"unexpected token 0x$other%02x")
      }
    }
    res
  }

  /** Run one SQL batch, return (columns, rows). */
  def query(conn: Conn, sql: String)
      : (Seq[ColMeta], Seq[Seq[Option[Any]]]) = {
    val text = ucs2(sql)
    // ALL_HEADERS with the mandatory transaction-descriptor header
    val bb = ByteBuffer.allocate(22 + text.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22); bb.putInt(18); bb.putShort(2.toShort)
    bb.putLong(0L); bb.putInt(1)
    bb.put(text)
    writeMessage(conn.out, 0x01, bb.array())
    val (tpe, resp) = readMessage(conn.in)
    require(tpe == 0x04, s"unexpected batch reply type $tpe")
    val res = parseTokens(resp, Nil)
    if (res.errors.nonEmpty)
      throw new java.io.IOException(res.errors.mkString("; "))
    (res.cols, res.rows.result())
  }

  // ----------------------------------------------------- CDC poll shape

  private def lsnHex(lsn: Array[Byte]): String =
    "0x" + lsn.map(b => f"${b & 0xff}%02x").mkString

  /** `sys.fn_cdc_get_max_lsn()` — the poll loop's high-watermark. */
  def maxLsn(conn: Conn): Array[Byte] = {
    val (_, rows) = query(conn, "SELECT sys.fn_cdc_get_max_lsn()")
    rows.head.head.get.asInstanceOf[Array[Byte]]
  }

  /** One reference-shaped change-table poll: all changes for `capture`
    * in [from, to], 'all update old' row images.
    */
  def pollChanges(conn: Conn, capture: String, from: Array[Byte],
                  to: Array[Byte])
      : (Seq[ColMeta], Seq[Seq[Option[Any]]]) =
    query(conn,
      s"SELECT * FROM cdc.fn_cdc_get_all_changes_$capture(" +
        s"${lsnHex(from)}, ${lsnHex(to)}, N'all update old') " +
        "ORDER BY [__$start_lsn] ASC, [__$seqval] ASC, [__$operation] ASC")

  /** Render fetched rows as the recorded-fixture JSONL shape (binary
    * columns base64, column order = result order) — the decoder input.
    */
  def rowsToJsonl(cols: Seq[ColMeta], rows: Seq[Seq[Option[Any]]]): String = {
    val b64 = java.util.Base64.getEncoder
    rows.map { row =>
      val fields: Seq[(String, BVal)] = cols.zip(row).map {
        case (c, None) => c.name -> BNull
        case (c, Some(v)) => c.name -> (v match {
          case b: Array[Byte] => BStr(b64.encodeToString(b))
          case i: Int => BInt64(i.toLong)
          case d: Double => BDouble(d)
          case s: String => BStr(s)
          case other => throw new IllegalArgumentException(
            s"unexpected value $other for ${c.name}")
        })
      }
      Bson.renderJson(BDoc(fields))
    }.mkString("", "\n", "\n")
  }
}
