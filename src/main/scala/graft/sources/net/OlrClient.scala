package graft.sources.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.wire.OlrDecoder

/** LIVE OpenLogReplicator network client (reference
  * `debezium-connector-oracle/.../olr/client/OlrNetworkClient.java`):
  * 4-byte LE length-prefixed protobuf frames over TCP, the INFO →
  * START/CONTINUE → REPLICATE handshake, then streamed PAYLOAD
  * responses, each acknowledged with a CONFIRM carrying the response's
  * (c_scn, c_idx) — the server-side resume fence (the reference sends
  * the same confirm after dispatching each event batch).
  *
  * A fresh source answers INFO with READY and is started with
  * START(scn); an already-running source answers REPLICATE and is
  * resumed with CONTINUE(c_scn, c_idx) — sending a bare scn there would
  * make the server restart from whatever it last confirmed (the exact
  * trap the reference documents in `OlrNetworkClient.startFrom`).
  * External OpenLogReplicator servers are env-blocked; the loopback
  * fixture (`graft.tools.OlrServer`) speaks the same frames.
  */
object OlrClient {

  /** Thin socket wrapper over the SHARED framing codec
    * (`OlrDecoder.frame`/`readFrame`) — one implementation for client,
    * server, and segment files.
    */
  private final class FrameIo(socket: Socket) {
    private val in = new DataInputStream(socket.getInputStream)
    private val out = new DataOutputStream(socket.getOutputStream)
    def write(body: Array[Byte]): Unit = {
      out.write(OlrDecoder.frame(body)); out.flush()
    }
    def read(): Option[Array[Byte]] = OlrDecoder.readFrame(in)
  }

  /** Connect, handshake, stream every PAYLOAD frame until the server
    * closes, confirming each. Returns the raw response bodies in arrival
    * order (`OlrDecoder.writeSegment` turns them back into the
    * byte-identical `.olr` stream).
    */
  def fetchResponses(host: String, port: Int, sourceName: String,
                     scn: Long, cScn: Long = 0L, cIdx: Long = 0L)
  : Seq[Array[Byte]] = {
    val socket = new Socket(host, port)
    try {
      val io = new FrameIo(socket)
      io.write(OlrDecoder.encodeRequest(OlrDecoder.ReqInfo, sourceName))
      val info = OlrDecoder.decodeResponse(io.read().getOrElse(
        throw new java.io.IOException("no INFO response")))
      info.code match {
        case OlrDecoder.RespReady =>
          io.write(OlrDecoder.encodeRequest(OlrDecoder.ReqStart,
            sourceName, scn = scn))
        case OlrDecoder.RespReplicate =>
          // already started: resume by confirmed (c_scn, c_idx), NOT scn
          io.write(OlrDecoder.encodeRequest(OlrDecoder.ReqContinue,
            sourceName, cScn = cScn, cIdx = cIdx))
        case other => throw new java.io.IOException(
          s"unexpected INFO response code $other")
      }
      val started = OlrDecoder.decodeResponse(io.read().getOrElse(
        throw new java.io.IOException("no start response")))
      // the reference is equally strict here: anything but REPLICATE
      // after START/CONTINUE shuts the client down
      // (OlrNetworkClient.startFrom:284-291)
      require(started.code == OlrDecoder.RespReplicate,
        s"source did not enter replicate mode: code ${started.code}")

      val frames = Seq.newBuilder[Array[Byte]]
      var open = true
      while (open) {
        io.read() match {
          case Some(body) =>
            frames += body
            val r = OlrDecoder.decodeResponse(body)
            if (r.code == OlrDecoder.RespPayload)
              io.write(OlrDecoder.encodeRequest(OlrDecoder.ReqConfirm,
                sourceName, cScn = r.cScn, cIdx = r.cIdx))
          case None => open = false
        }
      }
      frames.result()
    } finally socket.close()
  }

  def fetchSegment(host: String, port: Int, sourceName: String,
                   scn: Long, cScn: Long = 0L, cIdx: Long = 0L)
  : Array[Byte] =
    OlrDecoder.writeSegment(
      fetchResponses(host, port, sourceName, scn, cScn, cIdx))
}
