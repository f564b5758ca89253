package graft.tools

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.atomic.AtomicInteger

import graft.serde.Bson
import graft.serde.Bson.{BArr, BDoc, BDouble, BInt32, BInt64, BStr, BVal}

/** Protocol-faithful MongoDB FIXTURE SERVER (loopback only — zero
  * egress, so this stands in for a mongod the way the recorded JSONL
  * stands in for a live cursor): OP_MSG framing (MongoDB wire protocol
  * spec, opcode 2013: int32 flagBits + kind-0 body section), `hello`,
  * `aggregate` opening a change-stream cursor, `getMore` batches, and
  * server-side `$match` filtering exactly where a real mongod applies
  * it — BEFORE `$changeStreamSplitLargeEvent`, so collection-level
  * events are filtered but split fragments (which carry no
  * `operationType` of their own) pass through. The bytes on the socket
  * are the real protocol; only the events behind them are synthetic.
  */
object MongoWireServer {

  /** Per-connection observations the spec asserts on. */
  final class Session {
    @volatile var helloSeen = false
    @volatile var sawChangeStreamStage = false
    @volatile var sawSplitStage = false
    @volatile var matchedOpTypes: Seq[String] = Nil
    val getMores = new AtomicInteger(0)
    @volatile var filteredCount = 0
  }

  private val OpMsg = 2013

  private def readOpMsg(in: DataInputStream): (Int, BDoc) = {
    val header = new Array[Byte](16)
    in.readFully(header)
    val hb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
    val len = hb.getInt(); val requestId = hb.getInt()
    hb.getInt() // responseTo
    val opCode = hb.getInt()
    require(opCode == OpMsg, s"expected OP_MSG(2013), got $opCode")
    val body = new Array[Byte](len - 16)
    in.readFully(body)
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    bb.getInt() // flagBits — checksum/moreToCome unused here
    val kind = bb.get()
    require(kind == 0, s"expected kind-0 body section, got $kind")
    val (doc, _) = Bson.decode(body, bb.position())
    (requestId, doc)
  }

  private def writeOpMsg(out: DataOutputStream, responseTo: Int,
                         requestId: Int, doc: BDoc): Unit = {
    val body = Bson.encode(doc)
    val bb = ByteBuffer.allocate(16 + 4 + 1 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(bb.capacity()); bb.putInt(requestId); bb.putInt(responseTo)
    bb.putInt(OpMsg)
    bb.putInt(0) // flagBits
    bb.put(0.toByte) // kind-0 section
    bb.put(body)
    out.write(bb.array()); out.flush()
  }

  private def ok(fields: (String, BVal)*): BDoc =
    BDoc(fields.toSeq :+ ("ok" -> BDouble(1.0)))

  private def cursorReply(batchField: String, batch: Seq[BDoc], id: Long,
                          ns: String): BDoc =
    ok("cursor" -> BDoc(Seq(
      "id" -> BInt64(id),
      "ns" -> BStr(ns),
      batchField -> BArr(batch))))

  /** Serve one change-stream session on an ephemeral port: hello,
    * aggregate returning the first batch, getMore for the rest, cursor
    * id 0 on the final batch. Returns (port, session, thread).
    */
  def serve(events: Seq[BDoc], batchSize: Int = 16): (Int, Session, Thread) = {
    val server = new ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val session = new Session
    val cursorId = 8675309L
    val t = new Thread(() => {
      val socket: Socket = server.accept()
      try {
        socket.setTcpNoDelay(true)
        val in = new DataInputStream(socket.getInputStream)
        val out = new DataOutputStream(socket.getOutputStream)
        var remaining: Seq[BDoc] = Nil
        var ns = "db.coll"
        var open = true
        while (open) {
          val (reqId, cmd) = readOpMsg(in)
          cmd.fields.headOption match {
            case Some(("hello", _)) | Some(("isMaster", _)) =>
              session.helloSeen = true
              writeOpMsg(out, reqId, reqId + 1000, ok(
                "helloOk" -> Bson.BBool(true),
                "maxWireVersion" -> BInt32(17),
                "minWireVersion" -> BInt32(0)))
            case Some(("aggregate", BStr(coll))) =>
              val db = cmd.get("$db") match {
                case Some(BStr(d)) => d; case _ => "test"
              }
              ns = s"$db.$coll"
              val stages = cmd.get("pipeline") match {
                case Some(BArr(items)) => items.collect { case d: BDoc => d }
                case _ => Nil
              }
              session.sawChangeStreamStage =
                stages.exists(_.get("$changeStream").isDefined)
              session.sawSplitStage =
                stages.exists(_.get("$changeStreamSplitLargeEvent").isDefined)
              // Apply $match where mongod does: before the split stage.
              // Only events carrying an operationType are candidates —
              // fragments have none and always pass.
              val opTypes = (for {
                m <- stages.flatMap(_.get("$match")).headOption
                ot <- m.asInstanceOf[BDoc].get("operationType")
                in <- ot.asInstanceOf[BDoc].get("$in")
              } yield in.asInstanceOf[BArr].items.collect {
                case BStr(s) => s
              }).getOrElse(Nil)
              session.matchedOpTypes = opTypes
              val served =
                if (opTypes.isEmpty) events
                else events.filter(_.get("operationType") match {
                  case Some(BStr(op)) => opTypes.contains(op)
                  case _ => true // split fragments: no operationType
                })
              session.filteredCount = events.size - served.size
              val (first, rest) = served.splitAt(batchSize)
              remaining = rest
              writeOpMsg(out, reqId, reqId + 1000,
                cursorReply("firstBatch", first,
                  if (rest.isEmpty) 0L else cursorId, ns))
            case Some(("getMore", BInt64(id))) =>
              require(id == cursorId, s"unknown cursor $id")
              session.getMores.incrementAndGet()
              val (batch, rest) = remaining.splitAt(batchSize)
              remaining = rest
              writeOpMsg(out, reqId, reqId + 1000,
                cursorReply("nextBatch", batch,
                  if (rest.isEmpty) 0L else cursorId, ns))
            case Some(("endSessions", _)) =>
              writeOpMsg(out, reqId, reqId + 1000, ok())
              open = false
            case other =>
              throw new IllegalStateException(s"unexpected command: $other")
          }
        }
      } finally {
        socket.close(); server.close()
      }
    }, "mongo-wire-server")
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, session, t)
  }
}
