package graft.tools

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Protocol-faithful SQL Server FIXTURE SERVER (loopback only — zero
  * egress, so this stands in for a real SQL Server the way the recorded
  * JSONL stands in for a live change table): TDS 7.4 framing per the
  * published [MS-TDS] spec — PRELOGIN option lists, LOGIN7 with the
  * nibble-swap/XOR-0xA5 password obfuscation VERIFIED server-side,
  * LOGINACK/ERROR token responses, SQLBatch with ALL_HEADERS, and
  * tabular results (COLMETADATA / ROW / DONE tokens) for the CDC
  * polling functions the reference issues (`sys.fn_cdc_get_max_lsn()`,
  * `cdc.fn_cdc_get_all_changes_<capture>` between LSN literals —
  * reference `SqlServerConnection.java` GET_ALL_CHANGES_FOR_TABLE).
  * The bytes on the socket are the real protocol; only the rows behind
  * them are synthetic.
  */
object MsSqlWireServer {

  sealed trait ColType
  case object TVarBinary extends ColType
  case object TIntN extends ColType
  case object TFltN extends ColType
  case object TVarChar extends ColType

  final case class Col(name: String, tpe: ColType)

  /** A served row: one Option per column (None = SQL NULL), values are
    * Array[Byte] / Int / Double / String per the column type.
    */
  type Row = Seq[Option[Any]]

  /** Per-connection observations the spec asserts on. */
  final class Session {
    @volatile var user: String = _
    @volatile var database: String = _
    @volatile var authOk = false
    @volatile var tdsVersion = 0
    @volatile var queries: List[String] = Nil
  }

  private val PacketSize = 4096

  // ------------------------------------------------------- TDS framing

  /** Read one complete TDS message (assembling multi-packet EOM). */
  def readMessage(in: DataInputStream): (Int, Array[Byte]) = {
    val out = new java.io.ByteArrayOutputStream()
    var tpe = -1
    var eom = false
    while (!eom) {
      val header = new Array[Byte](8)
      in.readFully(header)
      if (tpe < 0) tpe = header(0) & 0xff
      val status = header(1) & 0xff
      val len = ((header(2) & 0xff) << 8) | (header(3) & 0xff)
      val body = new Array[Byte](len - 8)
      in.readFully(body)
      out.write(body)
      eom = (status & 0x01) != 0
    }
    (tpe, out.toByteArray)
  }

  /** Write one TDS message, splitting into PacketSize frames. */
  def writeMessage(out: DataOutputStream, tpe: Int,
                   payload: Array[Byte]): Unit = {
    val chunk = PacketSize - 8
    var off = 0
    var packetId = 1
    do {
      val n = math.min(chunk, payload.length - off)
      val last = off + n >= payload.length
      out.writeByte(tpe)
      out.writeByte(if (last) 0x01 else 0x00)
      out.writeShort(n + 8) // big-endian length incl header
      out.writeShort(0)     // SPID
      out.writeByte(packetId & 0xff)
      out.writeByte(0)      // window
      out.write(payload, off, n)
      off += n
      packetId += 1
    } while (off < payload.length)
    out.flush()
  }

  // --------------------------------------------------------- responses

  private def ucs2(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_16LE)

  private def le: ByteBuffer => ByteBuffer = _.order(ByteOrder.LITTLE_ENDIAN)

  private def preloginResponse(): Array[Byte] = {
    // VERSION(0) 6 bytes + ENCRYPTION(1) 1 byte, offsets follow the
    // 2-option token list + terminator
    val tokens = 2 * 5 + 1
    val bb = le(ByteBuffer.allocate(tokens + 7))
    bb.put(0.toByte); bb.putShort(java.lang.Short.reverseBytes(tokens.toShort))
    bb.putShort(java.lang.Short.reverseBytes(6.toShort))
    bb.put(1.toByte)
    bb.putShort(java.lang.Short.reverseBytes((tokens + 6).toShort))
    bb.putShort(java.lang.Short.reverseBytes(1.toShort))
    bb.put(0xFF.toByte)
    bb.put(Array[Byte](16, 0, 0, 0, 0, 0)) // version 16.0
    bb.put(2.toByte) // ENCRYPT_NOT_SUP
    bb.array()
  }

  /** De-obfuscate a LOGIN7 password: XOR 0xA5 then swap nibbles. */
  def decodePassword(bytes: Array[Byte]): String = {
    val plain = bytes.map { b =>
      val x = (b & 0xff) ^ 0xA5
      (((x & 0x0f) << 4) | ((x & 0xf0) >> 4)).toByte
    }
    new String(plain, StandardCharsets.UTF_16LE)
  }

  private def bVarchar(s: String): Array[Byte] =
    Array(s.length.toByte) ++ ucs2(s)

  private def usVarchar(s: String): Array[Byte] = {
    val bb = le(ByteBuffer.allocate(2 + s.length * 2))
    bb.putShort(s.length.toShort); bb.put(ucs2(s)); bb.array()
  }

  private def doneToken(status: Int, rowCount: Long): Array[Byte] = {
    val bb = le(ByteBuffer.allocate(1 + 2 + 2 + 8))
    bb.put(0xFD.toByte); bb.putShort(status.toShort); bb.putShort(0xC1.toShort)
    bb.putLong(rowCount); bb.array()
  }

  private def loginAck(): Array[Byte] = {
    val prog = bVarchar("graft-mssql-fixture")
    val body = le(ByteBuffer.allocate(1 + 4 + prog.length + 4))
    body.put(1.toByte)              // interface: SQL_TSQL
    body.putInt(0x74000004)         // TDS 7.4
    body.put(prog)
    body.put(Array[Byte](16, 0, 0, 0)) // server version
    val bb = le(ByteBuffer.allocate(3 + body.capacity()))
    bb.put(0xAD.toByte); bb.putShort(body.capacity().toShort)
    bb.put(body.array()); bb.array()
  }

  private def errorToken(number: Int, msg: String): Array[Byte] = {
    val m = usVarchar(msg)
    val srv = bVarchar("loopback"); val proc = bVarchar("")
    val body = le(ByteBuffer.allocate(4 + 1 + 1 + m.length + srv.length +
      proc.length + 4))
    body.putInt(number); body.put(1.toByte); body.put(14.toByte)
    body.put(m); body.put(srv); body.put(proc); body.putInt(0)
    val bb = le(ByteBuffer.allocate(3 + body.capacity()))
    bb.put(0xAA.toByte); bb.putShort(body.capacity().toShort)
    bb.put(body.array()); bb.array()
  }

  private def colMetadata(cols: Seq[Col]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write(0x81)
    w16(cols.size)
    cols.foreach { c =>
      w32(0)          // UserType
      w16(0x0001)     // flags: nullable
      c.tpe match {
        case TIntN => out.write(0x26); out.write(4)
        case TFltN => out.write(0x6D); out.write(8)
        case TVarBinary => out.write(0xA5); w16(100)
        case TVarChar =>
          out.write(0xA7); w16(400)
          // collation: LCID 0x0409, no flags, charset id 52 (cp1252)
          out.write(Array[Byte](0x09, 0x04, 0x00, 0x00, 52))
      }
      out.write(bVarchar(c.name))
    }
    out.toByteArray
  }

  private def rowToken(cols: Seq[Col], row: Row): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write(0xD1)
    cols.zip(row).foreach {
      case (c, None) => c.tpe match {
        case TIntN | TFltN => out.write(0)       // BYTELEN null
        case TVarBinary | TVarChar => w16(0xFFFF) // CHARBIN_NULL
      }
      case (c, Some(v)) => c.tpe match {
        case TIntN =>
          out.write(4)
          val i = v.asInstanceOf[Int]
          out.write(i & 0xff); out.write((i >> 8) & 0xff)
          out.write((i >> 16) & 0xff); out.write((i >> 24) & 0xff)
        case TFltN =>
          out.write(8)
          val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
          var k = 0
          while (k < 8) { out.write(((bits >> (8 * k)) & 0xff).toInt); k += 1 }
        case TVarBinary =>
          val b = v.asInstanceOf[Array[Byte]]
          w16(b.length); out.write(b)
        case TVarChar =>
          val b = v.asInstanceOf[String].getBytes(StandardCharsets.US_ASCII)
          w16(b.length); out.write(b)
      }
    }
    out.toByteArray
  }

  // ----------------------------------------------------- query serving

  /** Unsigned lexicographic compare for binary LSNs. */
  def lsnCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private val HexLit = "0[xX]([0-9a-fA-F]+)".r

  private def hexLiterals(sql: String): Seq[Array[Byte]] =
    HexLit.findAllMatchIn(sql).map { m =>
      m.group(1).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }.toSeq

  /** Serve one TDS session on an ephemeral port. `cols`/`rows` back the
    * `fn_cdc_get_all_changes` capture function; the LSN-window
    * predicate parses from the query's hex literals exactly as a real
    * server would evaluate `@from_lsn`/`@to_lsn`. Returns
    * (port, session, thread).
    */
  def serve(cols: Seq[Col], rows: Seq[Row], password: String)
      : (Int, Session, Thread) = {
    require(cols.head.tpe == TVarBinary,
      "first column must be __$start_lsn for window filtering")
    val server = new ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val session = new Session
    val t = new Thread(() => {
      val socket: Socket = server.accept()
      try {
        socket.setTcpNoDelay(true)
        val in = new DataInputStream(socket.getInputStream)
        val out = new DataOutputStream(socket.getOutputStream)
        var open = true
        while (open) {
          val (tpe, payload) =
            try readMessage(in)
            catch { case _: EOFException => open = false; (-1, Array[Byte]()) }
          tpe match {
            case 0x12 => // PRELOGIN
              writeMessage(out, 0x04, preloginResponse())
            case 0x10 => // LOGIN7
              val bb = le(ByteBuffer.wrap(payload))
              bb.getInt() // length
              session.tdsVersion = bb.getInt()
              bb.position(36) // offset table starts after the fixed part
              def field(): (Int, Int) =
                (bb.getShort() & 0xffff, bb.getShort() & 0xffff)
              val _host = field(); val userF = field(); val passF = field()
              val _app = field(); val _srv = field(); val _ext = field()
              val _clt = field(); val _lang = field(); val dbF = field()
              def str(f: (Int, Int)): String = new String(
                payload, f._1, f._2 * 2, StandardCharsets.UTF_16LE)
              session.user = str(userF)
              session.database = str(dbF)
              val sent = decodePassword(
                java.util.Arrays.copyOfRange(payload, passF._1,
                  passF._1 + passF._2 * 2))
              if (sent == password) {
                session.authOk = true
                writeMessage(out, 0x04, loginAck() ++ doneToken(0x0000, 0))
              } else {
                writeMessage(out, 0x04,
                  errorToken(18456,
                    s"Login failed for user '${session.user}'.") ++
                    doneToken(0x0002, 0))
                open = false
              }
            case 0x01 => // SQLBatch
              val bb = le(ByteBuffer.wrap(payload))
              val headersLen = bb.getInt()
              val sql = new String(payload, headersLen,
                payload.length - headersLen, StandardCharsets.UTF_16LE)
              session.queries = session.queries :+ sql
              if (sql.contains("fn_cdc_get_max_lsn")) {
                val maxLsn = rows.flatMap(_.head).map(_.asInstanceOf[Array[Byte]])
                  .reduceLeft((a, b) => if (lsnCompare(a, b) >= 0) a else b)
                val meta = colMetadata(Seq(Col("max_lsn", TVarBinary)))
                val row = rowToken(Seq(Col("max_lsn", TVarBinary)),
                  Seq(Some(maxLsn)))
                writeMessage(out, 0x04, meta ++ row ++ doneToken(0x0010, 1))
              } else if (sql.contains("fn_cdc_get_all_changes_")) {
                val lits = hexLiterals(sql)
                require(lits.size == 2,
                  s"expected @from_lsn/@to_lsn hex literals in: $sql")
                val (from, to) = (lits(0), lits(1))
                val served = rows.filter { r =>
                  val lsn = r.head.get.asInstanceOf[Array[Byte]]
                  lsnCompare(lsn, from) >= 0 && lsnCompare(lsn, to) <= 0
                }
                val body = new java.io.ByteArrayOutputStream()
                body.write(colMetadata(cols))
                served.foreach(r => body.write(rowToken(cols, r)))
                body.write(doneToken(0x0010, served.size.toLong))
                writeMessage(out, 0x04, body.toByteArray)
              } else {
                writeMessage(out, 0x04,
                  errorToken(102, s"Incorrect syntax near: $sql") ++
                    doneToken(0x0002, 0))
              }
            case -1 => // EOF — client closed cleanly
            case other =>
              throw new IllegalStateException(f"unexpected TDS type 0x$other%02x")
          }
        }
      } finally {
        socket.close(); server.close()
      }
    }, "mssql-wire-server")
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, session, t)
  }
}
