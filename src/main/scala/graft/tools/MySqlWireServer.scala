package graft.tools

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Protocol-faithful MySQL FIXTURE SERVER for the binlog-dump path
  * (loopback only — zero-egress stand-in for a real mysqld, like
  * [[PgWireServer]] for a postmaster): v10 initial handshake with a
  * deterministic 20-byte scramble, `mysql_native_password`
  * VERIFICATION against the configured password, OK/ERR, then the
  * binlog network stream (one packet per event, OK-byte prefixed) for
  * a COM_BINLOG_DUMP, ended by EOF.
  */
object MySqlWireServer {

  final class Session {
    @volatile var user: String = _
    @volatile var authOk = false
    @volatile var requestedFile: String = _
    @volatile var requestedPos: Long = -1
    @volatile var requestedServerId: Int = -1
    /** Canonical text of the COM_BINLOG_DUMP_GTID executed set (null for
      * a plain position dump).
      */
    @volatile var requestedGtids: String = _
    /** True once the client has sent `SET @master_binlog_checksum=…`
      * (the checksum-support confirmation a real server requires before
      * it will stream CRC32-checksummed events).
      */
    @volatile var checksumAcknowledged = false
  }

  /** Deterministic scramble (a real server randomizes; determinism
    * keeps the fixture reproducible — the TOKEN still exercises the
    * full double-SHA1 mix).
    */
  val Nonce: Array[Byte] = (1 to 20).map(i => (i * 7 + 3).toByte).toArray

  private def writePacket(out: DataOutputStream, seq: Int,
                          payload: Array[Byte]): Unit = {
    out.write(payload.length & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(payload)
    out.flush()
  }

  private def readPacket(in: DataInputStream): (Int, Array[Byte]) = {
    val h = new Array[Byte](4)
    in.readFully(h)
    val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (h(3) & 0xff, payload)
  }

  /** Split a binlog segment (magic + events) into its self-framed
    * events via the header's event-size field (offset 9, LE).
    */
  def segmentEvents(segment: Array[Byte]): Seq[Array[Byte]] = {
    val events = Seq.newBuilder[Array[Byte]]
    var p = 4 // skip 0xfe 'b' 'i' 'n'
    while (p + 19 <= segment.length) {
      val size = (segment(p + 9) & 0xff) | ((segment(p + 10) & 0xff) << 8) |
        ((segment(p + 11) & 0xff) << 16) | ((segment(p + 12) & 0xff) << 24)
      events += java.util.Arrays.copyOfRange(segment, p, p + size)
      p += size
    }
    events.result()
  }

  /** Transaction-granular GTID skip (what a real mysqld does for
    * COM_BINLOG_DUMP_GTID): a GTID_LOG_EVENT whose sid:gno the client
    * has already executed suppresses every event through its XID; an
    * ANONYMOUS group always replays; head events outside any group
    * (FORMAT, PREVIOUS_GTIDS, ROTATE) always replay.
    */
  private def filterExecuted(events: Seq[Array[Byte]],
                             executed: graft.sources.wire.GtidSet)
  : Seq[Array[Byte]] = {
    var skip = false
    events.flatMap { ev =>
      val kind = ev(4) & 0xff
      kind match {
        case 33 => // GTID_LOG_EVENT: flags(1) sid(16) gno(8 LE) at body
          val b = ByteBuffer.wrap(ev, 19, ev.length - 19)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.get()
          val raw = new Array[Byte](16); b.get(raw)
          val hex = raw.map(x => f"${x & 0xff}%02x").mkString
          val sid = s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
            s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
            hex.substring(20)
          val gno = b.getLong()
          skip = executed.contains(sid, gno)
          if (skip) Nil else Seq(ev)
        case 34 => skip = false; Seq(ev) // anonymous group
        case 16 => // XID closes the group
          val r = if (skip) Nil else Seq(ev)
          skip = false
          r
        case 40 =>
          // TRANSACTION_PAYLOAD carries the WHOLE transaction body
          // (including its XID) inside the container: dropping or
          // sending it ENDS the group either way — without this reset a
          // skipped compressed tx would suppress every event until the
          // next GTID (rotates, heartbeats, segment tails)
          val r = if (skip) Nil else Seq(ev)
          skip = false
          r
        case _ => if (skip) Nil else Seq(ev)
      }
    }
  }

  /** Serve ONE binlog-dump session on an ephemeral port.
    *
    * `checksummed` marks the stored binlog as `binlog_checksum=CRC32`
    * (pass events already in checksummed framing): like a real mysqld,
    * the dump is then REFUSED with ER_MASTER_FATAL_ERROR_READING_BINLOG
    * unless the client first confirmed checksum support via
    * `SET @master_binlog_checksum=…` (ref the connector's
    * `BinaryLogClient.fetchBinlogChecksum/confirmSupportOfChecksum`).
    */
  def serve(events: Seq[Array[Byte]], password: String,
            checksummed: Boolean = false)
      : (Int, Session, Thread) = {
    val server = new ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val session = new Session
    val t = new Thread(() => {
      val socket: Socket = server.accept()
      try {
        val in = new DataInputStream(socket.getInputStream)
        val out = new DataOutputStream(socket.getOutputStream)

        // Initial Handshake v10
        val hs = ByteBuffer.allocate(128)
        hs.put(10.toByte)
        hs.put("8.0.0-graft".getBytes(StandardCharsets.US_ASCII))
        hs.put(0.toByte)
        hs.putInt(java.lang.Integer.reverseBytes(42)) // thread id, LE
        hs.put(Nonce, 0, 8); hs.put(0.toByte)
        hs.put(0xff.toByte); hs.put(0xf7.toByte) // caps low
        hs.put(33.toByte)                        // charset
        hs.put(2.toByte); hs.put(0.toByte)       // status
        hs.put(0x81.toByte); hs.put(0x08.toByte) // caps high (PLUGIN_AUTH)
        hs.put(21.toByte)                        // auth data len
        hs.put(new Array[Byte](10))
        hs.put(Nonce, 8, 12); hs.put(0.toByte)
        hs.put("mysql_native_password".getBytes(StandardCharsets.US_ASCII))
        hs.put(0.toByte)
        writePacket(out, 0, java.util.Arrays.copyOf(hs.array(), hs.position()))

        // HandshakeResponse41: caps(4) max(4) charset(1) zero(23)
        // user(cstr) authLen(1) auth token [plugin(cstr)]
        val (_, resp) = readPacket(in)
        var p = 4 + 4 + 1 + 23
        var e = p
        while (resp(e) != 0) e += 1
        session.user = new String(resp, p, e - p, StandardCharsets.UTF_8)
        p = e + 1
        val tokenLen = resp(p) & 0xff
        val token = java.util.Arrays.copyOfRange(resp, p + 1, p + 1 + tokenLen)
        val expected = graft.sources.net.MySqlBinlogClient
          .nativePasswordToken(password, Nonce)
        session.authOk = java.util.Arrays.equals(token, expected)
        if (!session.authOk) {
          // ERR 1045 Access denied
          val msg = "Access denied".getBytes(StandardCharsets.UTF_8)
          val err = ByteBuffer.allocate(3 + msg.length)
          err.put(0xff.toByte)
          err.put((1045 & 0xff).toByte); err.put(((1045 >> 8) & 0xff).toByte)
          err.put(msg)
          writePacket(out, 2, err.array())
        } else {
          writePacket(out, 2, Array[Byte](0, 0, 0, 2, 0, 0, 0)) // OK

          // session commands before the dump: COM_QUERY SET statements
          // (checksum confirmation) get an OK; then the dump command
          var cmd: Array[Byte] = readPacket(in)._2
          while ((cmd(0) & 0xff) == 0x03) {
            val sql = new String(cmd, 1, cmd.length - 1,
              StandardCharsets.UTF_8)
            if (sql.toLowerCase.replace(" ", "")
                .contains("set@master_binlog_checksum"))
              session.checksumAcknowledged = true
            writePacket(out, 1, Array[Byte](0, 0, 0, 2, 0, 0, 0)) // OK
            cmd = readPacket(in)._2
          }
          if (checksummed && !session.checksumAcknowledged) {
            // ER_MASTER_FATAL_ERROR_READING_BINLOG (1236): what a real
            // server replies when the binlog carries checksums the
            // client never confirmed it can handle
            val msg = ("Replica can not handle replication events with" +
              " the checksum that source is configured to log")
              .getBytes(StandardCharsets.UTF_8)
            val err = ByteBuffer.allocate(3 + msg.length)
            err.put(0xff.toByte)
            err.put((1236 & 0xff).toByte); err.put(((1236 >> 8) & 0xff).toByte)
            err.put(msg)
            writePacket(out, 1, err.array())
          } else {
          val toSend = (cmd(0) & 0xff) match {
            case 0x12 =>
              val cb = ByteBuffer.wrap(cmd)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              cb.get()
              session.requestedPos = cb.getInt().toLong & 0xffffffffL
              cb.getShort()
              session.requestedServerId = cb.getInt()
              session.requestedFile = new String(cmd, 11, cmd.length - 11,
                StandardCharsets.UTF_8)
              events
            case 0x1e =>
              // cmd(1) flags(2) server-id(4) name-len(4) name(n) pos(8)
              // data-size(4) gtid-set(body) — the server replays only
              // transactions NOT contained in the client's executed set
              val cb = ByteBuffer.wrap(cmd)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              cb.get(); cb.getShort()
              session.requestedServerId = cb.getInt()
              val nameLen = cb.getInt()
              val nameB = new Array[Byte](nameLen); cb.get(nameB)
              session.requestedFile = new String(nameB, StandardCharsets.UTF_8)
              session.requestedPos = cb.getLong()
              val dataSize = cb.getInt()
              val body = new Array[Byte](dataSize); cb.get(body)
              val executed =
                graft.sources.wire.MySqlBinlog.decodeGtidSetBody(body)
              session.requestedGtids = executed.text
              filterExecuted(events, executed)
            case other => throw new IllegalStateException(
              f"expected COM_BINLOG_DUMP(_GTID), got 0x$other%02x")
          }

          // the stream: one packet per event, OK-byte prefixed; then EOF
          var seq = 1
          toSend.foreach { ev =>
            writePacket(out, seq, 0.toByte +: ev)
            seq += 1
          }
          writePacket(out, seq, Array[Byte](0xfe.toByte, 0, 0, 2, 0))
          }
        }
      } finally {
        socket.close()
        server.close()
      }
    })
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, session, t)
  }
}
