package graft.sources.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Real MySQL binlog-dump client over TCP — the live half of the S8
  * connector (reference wires `com.github.shyiko` BinaryLogClient),
  * speaking the published client/server protocol (MySQL docs: Connection
  * Phase packets, `mysql_native_password` auth, COM_BINLOG_DUMP): v10
  * initial handshake, HandshakeResponse41 with the SHA1 scramble,
  * OK/ERR handling, then the binlog network stream — each packet is an
  * OK byte followed by one binlog v4 event, exactly the bytes the
  * on-disk binlog (and our `MySqlBinlog` decoder) uses.
  *
  * Zero-egress environment: exercised against the in-process
  * protocol-faithful server (`graft.tools.MySqlWireServer`) on
  * loopback; the bytes on the wire are the real protocol either way.
  */
object MySqlBinlogClient {

  val ComBinlogDump = 0x12
  val ComBinlogDumpGtid = 0x1e

  // capability bits (public protocol constants)
  val ClientLongPassword = 0x00000001
  val ClientProtocol41 = 0x00000200
  val ClientSecureConnection = 0x00008000
  val ClientPluginAuth = 0x00080000

  /** `mysql_native_password` token:
    * SHA1(pw) XOR SHA1(nonce ++ SHA1(SHA1(pw))).
    */
  def nativePasswordToken(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha1 = MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes(StandardCharsets.UTF_8))
    sha1.reset()
    val p2 = sha1.digest(p1)
    sha1.reset()
    sha1.update(nonce); sha1.update(p2)
    val mix = sha1.digest()
    p1.indices.map(i => (p1(i) ^ mix(i)).toByte).toArray
  }

  private final class PacketIo(socket: Socket) {
    val in = new DataInputStream(socket.getInputStream)
    val out = new DataOutputStream(socket.getOutputStream)
    var seq = 0

    def read(): Array[Byte] = {
      val h = new Array[Byte](4)
      in.readFully(h)
      val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
      seq = (h(3) & 0xff) + 1
      val payload = new Array[Byte](len)
      in.readFully(payload)
      payload
    }

    def write(payload: Array[Byte]): Unit = {
      out.write(payload.length & 0xff)
      out.write((payload.length >> 8) & 0xff)
      out.write((payload.length >> 16) & 0xff)
      out.write(seq & 0xff)
      seq += 1
      out.write(payload)
      out.flush()
    }
  }

  private def cstrAt(b: Array[Byte], at: Int): (String, Int) = {
    var i = at
    while (b(i) != 0) i += 1
    (new String(b, at, i - at, StandardCharsets.UTF_8), i + 1)
  }

  private def err(payload: Array[Byte]): Nothing = {
    val code = ((payload(1) & 0xff) | ((payload(2) & 0xff) << 8))
    throw new java.io.IOException(s"server ERR $code: " +
      new String(payload.drop(3), StandardCharsets.UTF_8))
  }

  /** Connect, authenticate, COM_BINLOG_DUMP (or, when `executedGtids`
    * is set, COM_BINLOG_DUMP_GTID — the GTID-based resume: the server
    * replays only transactions NOT contained in the client's executed
    * set), and collect every binlog event (network OK byte stripped)
    * until the server's EOF.
    */
  def fetchEvents(host: String, port: Int, user: String, password: String,
                  serverId: Int, binlogFile: String,
                  binlogPos: Long,
                  executedGtids: Option[graft.sources.wire.GtidSet] = None,
                  confirmChecksum: Boolean = false)
  : Seq[Array[Byte]] = {
    val socket = new Socket(host, port)
    try {
      val io = new PacketIo(socket)

      // Initial Handshake v10: proto(1) version(cstr) thread(4)
      // auth1(8) 0 caps_lo(2) charset(1) status(2) caps_hi(2)
      // authLen(1) reserved(10) auth2(max(13, authLen-8)) plugin(cstr)
      val hs = io.read()
      if ((hs(0) & 0xff) == 0xff) err(hs)
      require((hs(0) & 0xff) == 10, s"unsupported handshake v${hs(0)}")
      val (_, afterVersion) = cstrAt(hs, 1)
      var p = afterVersion + 4
      val auth1 = java.util.Arrays.copyOfRange(hs, p, p + 8)
      p += 8 + 1 + 2 + 1 + 2 + 2
      val authLen = hs(p) & 0xff
      p += 1 + 10
      val auth2n = math.max(13, authLen - 8)
      val auth2 = java.util.Arrays.copyOfRange(hs, p, p + auth2n - 1)
      val nonce = auth1 ++ auth2 // 20 bytes, trailing NUL excluded

      // HandshakeResponse41
      val caps = ClientLongPassword | ClientProtocol41 |
        ClientSecureConnection | ClientPluginAuth
      val token = nativePasswordToken(password, nonce)
      val resp = ByteBuffer.allocate(4 + 4 + 1 + 23 +
        user.getBytes(StandardCharsets.UTF_8).length + 1 +
        1 + token.length + "mysql_native_password".length + 1)
        .order(ByteOrder.LITTLE_ENDIAN)
      resp.putInt(caps)
      resp.putInt(1 << 24) // max packet
      resp.put(33.toByte)  // utf8_general_ci
      resp.put(new Array[Byte](23))
      resp.put(user.getBytes(StandardCharsets.UTF_8)); resp.put(0.toByte)
      resp.put(token.length.toByte); resp.put(token)
      resp.put("mysql_native_password".getBytes(StandardCharsets.US_ASCII))
      resp.put(0.toByte)
      io.write(java.util.Arrays.copyOf(resp.array(), resp.position()))

      val authResult = io.read()
      if ((authResult(0) & 0xff) == 0xff) err(authResult)
      require((authResult(0) & 0xff) == 0x00,
        f"expected OK after auth, got 0x${authResult(0)}%02x")

      if (confirmChecksum) {
        // confirm checksum support before the dump (the server refuses
        // to stream a CRC32-checksummed binlog otherwise — ref the
        // connector's BinaryLogClient.confirmSupportOfChecksum)
        io.seq = 0
        io.write(0x03.toByte +: // COM_QUERY
          "SET @master_binlog_checksum= @@global.binlog_checksum"
            .getBytes(StandardCharsets.UTF_8))
        val ok = io.read()
        if ((ok(0) & 0xff) == 0xff) err(ok)
      }

      io.seq = 0 // each command restarts the sequence
      val fileB = binlogFile.getBytes(StandardCharsets.UTF_8)
      executedGtids match {
        case None =>
          // COM_BINLOG_DUMP: cmd(1) pos(4) flags(2) server-id(4) file(EOF)
          val dump = ByteBuffer.allocate(1 + 4 + 2 + 4 + fileB.length)
            .order(ByteOrder.LITTLE_ENDIAN)
          dump.put(ComBinlogDump.toByte)
          dump.putInt(binlogPos.toInt)
          dump.putShort(0)
          dump.putInt(serverId)
          dump.put(fileB)
          io.write(dump.array())
        case Some(set) =>
          // COM_BINLOG_DUMP_GTID: cmd(1) flags(2) server-id(4)
          // name-len(4) name(n) pos(8) data-size(4) gtid-set(body)
          val body = graft.sources.wire.MySqlBinlog.encodeGtidSetBody(set)
          val dump = ByteBuffer.allocate(1 + 2 + 4 + 4 + fileB.length +
            8 + 4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
          dump.put(ComBinlogDumpGtid.toByte)
          dump.putShort(0)
          dump.putInt(serverId)
          dump.putInt(fileB.length)
          dump.put(fileB)
          dump.putLong(binlogPos)
          dump.putInt(body.length)
          dump.put(body)
          io.write(dump.array())
      }

      val events = Seq.newBuilder[Array[Byte]]
      var done = false
      while (!done) {
        val pk = io.read()
        (pk(0) & 0xff) match {
          case 0x00 => events += pk.drop(1) // one binlog v4 event
          case 0xfe if pk.length < 9 => done = true // EOF
          case 0xff => err(pk)
          case other =>
            throw new java.io.IOException(
              f"unexpected binlog stream packet 0x$other%02x")
        }
      }
      events.result()
    } finally socket.close()
  }

  /** Dump the stream into the standard binlog segment (magic + events)
    * — byte-identical to the on-disk binlog the decoder reads.
    */
  def fetchSegment(host: String, port: Int, user: String, password: String,
                   serverId: Int, binlogFile: String,
                   binlogPos: Long = 4L,
                   executedGtids: Option[graft.sources.wire.GtidSet] = None,
                   confirmChecksum: Boolean = false)
  : Array[Byte] =
    graft.sources.wire.MySqlBinlog.writeSegment(
      fetchEvents(host, port, user, password, serverId, binlogFile,
        binlogPos, executedGtids, confirmChecksum))
}
