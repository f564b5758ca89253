package graft.tools

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.wire.OlrDecoder

/** Protocol-faithful OpenLogReplicator FIXTURE SERVER (loopback only —
  * the zero-egress stand-in for a real OpenLogReplicator process, like
  * [[MySqlWireServer]] for mysqld): 4-byte LE length-prefixed protobuf
  * frames, the INFO → READY/REPLICATE handshake with database-name
  * VALIDATION, START/CONTINUE admission, then the payload stream with
  * per-response CONFIRM collection. `alreadyStarted = true` makes the
  * server answer INFO with REPLICATE so the client must take the
  * CONTINUE path (and the session records the resume pair it sent).
  */
object OlrServer {

  final class Session {
    @volatile var databaseName: String = _
    @volatile var startScn: Long = -1
    @volatile var continueCScn: Long = -1
    @volatile var continueCIdx: Long = -1
    /** (c_scn, c_idx) pairs confirmed by the client, in order. */
    val confirms = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
  }

  // framing delegates to the SHARED codec (OlrDecoder.frame/readFrame)
  private def writeFrame(out: DataOutputStream, body: Array[Byte]): Unit = {
    out.write(OlrDecoder.frame(body)); out.flush()
  }

  private def readFrame(in: DataInputStream): Array[Byte] =
    OlrDecoder.readFrame(in).getOrElse(
      throw new java.io.EOFException("client closed mid-handshake"))

  /** Serve ONE streaming session on an ephemeral port. `responses` are
    * pre-encoded RedoResponse bodies (typically PAYLOAD frames).
    */
  def serve(responses: Seq[Array[Byte]], sourceName: String,
            alreadyStarted: Boolean = false): (Int, Session, Thread) = {
    val server = new ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val session = new Session
    val t = new Thread(() => {
      val socket: Socket = server.accept()
      try {
        val in = new DataInputStream(socket.getInputStream)
        val out = new DataOutputStream(socket.getOutputStream)

        val info = OlrDecoder.decodeRequest(readFrame(in))
        session.databaseName = info.databaseName
        if (info.code != OlrDecoder.ReqInfo ||
          info.databaseName != sourceName) {
          writeFrame(out,
            OlrDecoder.encodeResponse(OlrDecoder.RespInvalidDatabase))
        } else {
          writeFrame(out, OlrDecoder.encodeResponse(
            if (alreadyStarted) OlrDecoder.RespReplicate
            else OlrDecoder.RespReady))

          val start = OlrDecoder.decodeRequest(readFrame(in))
          if (alreadyStarted) {
            require(start.code == OlrDecoder.ReqContinue,
              s"expected CONTINUE, got code ${start.code}")
            session.continueCScn = start.cScn
            session.continueCIdx = start.cIdx
          } else {
            require(start.code == OlrDecoder.ReqStart,
              s"expected START, got code ${start.code}")
            session.startScn = start.scn
          }
          writeFrame(out, OlrDecoder.encodeResponse(OlrDecoder.RespReplicate))

          responses.foreach { body =>
            writeFrame(out, body)
            val r = OlrDecoder.decodeResponse(body)
            if (r.code == OlrDecoder.RespPayload) {
              val confirm = OlrDecoder.decodeRequest(readFrame(in))
              require(confirm.code == OlrDecoder.ReqConfirm,
                s"expected CONFIRM, got code ${confirm.code}")
              session.confirms.add((confirm.cScn, confirm.cIdx)): Unit
            }
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
