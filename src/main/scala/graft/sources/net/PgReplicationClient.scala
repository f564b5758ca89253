package graft.sources.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Real PostgreSQL streaming-replication client over TCP — the live
  * half of the S9 connector (reference
  * `debezium-connector-postgres/.../connection/PostgresReplicationConnection.java`),
  * speaking the v3 frontend/backend protocol from the published spec
  * (PostgreSQL docs §55.2 message flow, §55.7 streaming-replication
  * protocol): StartupMessage with `replication=database`, trust auth,
  * `START_REPLICATION SLOT … LOGICAL … (proto_version '1',
  * publication_names '…')`, CopyBoth streaming of XLogData ('w') and
  * keepalive ('k') frames with standby status updates ('r') on demand.
  *
  * The environment has zero egress, so the client is exercised against
  * an in-process protocol-faithful server on loopback
  * (`graft.tools.PgWireServer`) — the byte stream on the wire is the
  * real protocol either way. Collected XLogData frames pack into the
  * standard PGOSEG01 segment container, dropping straight into the
  * DSv2 `ChangeLogSource` transport.
  */
object PgReplicationClient {

  /** One streamed XLogData frame: WAL start position + pgoutput bytes. */
  final case class XLogData(walStart: Long, payload: Array[Byte])

  private def cstr(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  private def sendStartup(out: DataOutputStream, user: String,
                          database: String): Unit = {
    val params = Seq("user" -> user, "database" -> database,
      "replication" -> "database")
    val body = params.flatMap { case (k, v) =>
      cstr(k).toSeq ++ cstr(v).toSeq
    }.toArray :+ 0.toByte
    out.writeInt(8 + body.length)
    out.writeInt(196608) // protocol 3.0
    out.write(body)
    out.flush()
  }

  private def sendMessage(out: DataOutputStream, tpe: Char,
                          body: Array[Byte]): Unit = {
    out.writeByte(tpe)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  /** Read one backend message: (type, body). */
  private def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tpe, body)
  }

  /** Standby status update ('r' inside CopyData): all three positions
    * at `lsn`, no reply requested — the client's keepalive answer.
    */
  private def sendStatusUpdate(out: DataOutputStream, lsn: Long): Unit = {
    val bb = ByteBuffer.allocate(1 + 8 * 4 + 1)
    bb.put('r'.toByte)
    bb.putLong(lsn); bb.putLong(lsn); bb.putLong(lsn)
    bb.putLong(0L) // clock: µs since PG epoch; 0 = unknown, valid
    bb.put(0.toByte)
    sendMessage(out, 'd', bb.array())
  }

  /** Connect, handshake, stream the slot until the server ends the copy
    * (CopyDone), and return every XLogData frame in arrival order.
    */
  def fetchAll(host: String, port: Int, user: String, database: String,
               slot: String, publication: String,
               startLsn: Long = 0L): Seq[XLogData] = {
    val socket = new Socket(host, port)
    try {
      val in = new DataInputStream(socket.getInputStream)
      val out = new DataOutputStream(socket.getOutputStream)
      sendStartup(out, user, database)

      // AuthenticationOk, then parameter/backend-key chatter until
      // ReadyForQuery
      val (authT, authB) = readMessage(in)
      require(authT == 'R' && ByteBuffer.wrap(authB).getInt == 0,
        s"expected AuthenticationOk, got '$authT'")
      var ready = false
      while (!ready) readMessage(in) match {
        case ('Z', _) => ready = true
        case ('S', _) | ('K', _) | ('N', _) => () // status / key / notice
        case ('E', body) =>
          throw new java.io.IOException("server error: " +
            new String(body, StandardCharsets.UTF_8))
        case (other, _) =>
          throw new java.io.IOException(s"unexpected pre-ready message '$other'")
      }

      val lsnText = f"${(startLsn >>> 32).toInt}%X/${startLsn.toInt}%X"
      sendMessage(out, 'Q', cstr(
        s"""START_REPLICATION SLOT "$slot" LOGICAL $lsnText """ +
          s"""(proto_version '1', publication_names '$publication')"""))
      val (copyT, _) = readMessage(in)
      require(copyT == 'W', s"expected CopyBothResponse, got '$copyT'")

      val frames = Seq.newBuilder[XLogData]
      var done = false
      while (!done) readMessage(in) match {
        case ('d', body) =>
          val bb = ByteBuffer.wrap(body)
          bb.get().toChar match {
            case 'w' => // XLogData: start, end, clock, payload
              val start = bb.getLong; bb.getLong; bb.getLong
              val payload = new Array[Byte](bb.remaining())
              bb.get(payload)
              frames += XLogData(start, payload)
            case 'k' => // keepalive: end lsn, clock, replyRequested
              val end = bb.getLong; bb.getLong
              if (bb.get() != 0) sendStatusUpdate(out, end)
            case other =>
              throw new java.io.IOException(s"unexpected copy frame '$other'")
          }
        case ('c', _) => // CopyDone: acknowledge, then drain to ready
          sendMessage(out, 'c', Array.emptyByteArray)
          done = true
        case ('E', body) =>
          throw new java.io.IOException("server error mid-stream: " +
            new String(body, StandardCharsets.UTF_8))
        case (other, _) =>
          throw new java.io.IOException(s"unexpected stream message '$other'")
      }
      var finished = false
      while (!finished) readMessage(in) match {
        case ('Z', _) => finished = true
        case ('C', _) => () // CommandComplete
        case (other, _) =>
          throw new java.io.IOException(s"unexpected post-copy message '$other'")
      }
      frames.result()
    } finally socket.close()
  }

  /** Stream a slot and pack the frames into a PGOSEG01 segment — the
    * ChangeLogSource transport unit.
    */
  def fetchSegment(host: String, port: Int, user: String, database: String,
                   slot: String, publication: String,
                   startLsn: Long = 0L): Array[Byte] = {
    val frames = fetchAll(host, port, user, database, slot, publication,
      startLsn)
    graft.sources.wire.PgOutput.writeSegment(
      frames.map(f => (f.walStart, f.payload)))
  }
}
