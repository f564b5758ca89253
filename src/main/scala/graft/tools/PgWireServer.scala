package graft.tools

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Protocol-faithful PostgreSQL replication FIXTURE SERVER (loopback
  * only — the environment has zero egress, so this stands in for a real
  * postmaster the way WireFixtures' recorded segments stand in for a
  * real WAL): v3 startup with trust auth, `START_REPLICATION` over
  * CopyBoth, XLogData/keepalive frames per the published streaming-
  * replication protocol (PostgreSQL docs §55.7). The bytes on the
  * socket are the real protocol; only the data behind them is
  * synthetic.
  */
object PgWireServer {

  /** Per-connection observations the spec asserts on. */
  final class Session {
    @volatile var sawReplicationParam = false
    @volatile var replicationQuery: String = _
    val statusUpdates = new AtomicInteger(0)
    @volatile var copyDoneAcked = false
  }

  private def cstr(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  private def send(out: DataOutputStream, tpe: Char, body: Array[Byte]): Unit = {
    out.writeByte(tpe)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  private def readFrontend(in: DataInputStream): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tpe, body)
  }

  /** Serve exactly ONE replication session on an ephemeral port:
    * handshake, one keepalive demanding a reply (exercises the client's
    * standby-status path), the XLogData frames, CopyDone, clean finish.
    * Returns (port, session, thread); the thread ends with the session.
    */
  def serve(frames: Seq[(Long, Array[Byte])]): (Int, Session, Thread) = {
    val server = new ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val session = new Session
    val t = new Thread(() => {
      val socket: Socket = server.accept()
      try {
        val in = new DataInputStream(socket.getInputStream)
        val out = new DataOutputStream(socket.getOutputStream)

        // StartupMessage: len, protocol, (key \0 value \0)* \0
        val len = in.readInt()
        val proto = in.readInt()
        require(proto == 196608, s"unsupported protocol $proto")
        val body = new Array[Byte](len - 8)
        in.readFully(body)
        val params = new String(body, StandardCharsets.UTF_8)
          .split("\u0000").filter(_.nonEmpty).grouped(2)
          .collect { case Array(k, v) => k -> v }.toMap
        session.sawReplicationParam =
          params.get("replication").contains("database")

        // trust auth: AuthenticationOk, one ParameterStatus, ReadyForQuery
        send(out, 'R', ByteBuffer.allocate(4).putInt(0).array())
        send(out, 'S', cstr("server_version") ++ cstr("16.0"))
        send(out, 'Z', Array('I'.toByte))

        // Query: START_REPLICATION …
        val (qt, qb) = readFrontend(in)
        require(qt == 'Q', s"expected Query, got '$qt'")
        session.replicationQuery =
          new String(qb.dropRight(1), StandardCharsets.UTF_8)
        require(session.replicationQuery.startsWith("START_REPLICATION"),
          s"not a replication command: ${session.replicationQuery}")

        // CopyBothResponse: overall format 0, zero columns
        send(out, 'W', Array[Byte](0, 0, 0))

        // keepalive demanding a standby status update
        val ka = ByteBuffer.allocate(1 + 8 + 8 + 1)
        ka.put('k'.toByte); ka.putLong(0L); ka.putLong(0L); ka.put(1.toByte)
        send(out, 'd', ka.array())
        val (rt, rb) = readFrontend(in)
        require(rt == 'd' && rb(0) == 'r'.toByte,
          "expected a standby status update")
        session.statusUpdates.incrementAndGet()

        // the WAL: one XLogData frame per recorded message
        frames.foreach { case (wal, payload) =>
          val bb = ByteBuffer.allocate(1 + 8 * 3 + payload.length)
          bb.put('w'.toByte)
          bb.putLong(wal); bb.putLong(wal + payload.length); bb.putLong(0L)
          bb.put(payload)
          send(out, 'd', bb.array())
        }

        // end the copy; expect the client's CopyDone ack
        send(out, 'c', Array.emptyByteArray)
        val (ct, _) = readFrontend(in)
        session.copyDoneAcked = ct == 'c'
        send(out, 'C', cstr("COPY 0"))
        send(out, 'Z', Array('I'.toByte))
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
