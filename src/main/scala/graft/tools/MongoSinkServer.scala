package graft.tools

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.serde.Bson
import graft.serde.Bson.{BArr, BBool, BDoc, BDouble, BInt32, BInt64, BStr, BVal}

/** Protocol-faithful MongoDB WRITE fixture server (loopback, zero
  * egress) for the sink side: OP_MSG framing, `hello`, bulk `update`
  * (replaceOne upsert semantics — the reference sink's
  * `ReplaceDefaultStrategy`), bulk `delete` (`DeleteDefaultStrategy`),
  * and `find` for read-back. Accepts MANY concurrent connections (one
  * per executor partition) against one shared store, genuinely
  * validating each command's shape and `_id` before applying it — a
  * malformed write model fails the command like a real mongod.
  */
object MongoSinkServer {

  final class Stats {
    val connections = new AtomicInteger(0)
    val updates = new AtomicInteger(0)
    val upserts = new AtomicInteger(0)
    val deletes = new AtomicInteger(0)
  }

  private val OpMsg = 2013

  private def readOpMsg(in: DataInputStream): (Int, BDoc) = {
    val header = new Array[Byte](16)
    in.readFully(header)
    val hb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
    val len = hb.getInt(); val requestId = hb.getInt()
    hb.getInt()
    require(hb.getInt() == OpMsg, "expected OP_MSG")
    val body = new Array[Byte](len - 16)
    in.readFully(body)
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    bb.getInt()
    require(bb.get() == 0, "expected kind-0 section")
    val (doc, _) = Bson.decode(body, bb.position())
    (requestId, doc)
  }

  private def writeOpMsg(out: DataOutputStream, responseTo: Int, doc: BDoc): Unit = {
    val body = Bson.encode(doc)
    val bb = ByteBuffer.allocate(16 + 4 + 1 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(bb.capacity()); bb.putInt(responseTo + 1000); bb.putInt(responseTo)
    bb.putInt(OpMsg); bb.putInt(0); bb.put(0.toByte); bb.put(body)
    out.write(bb.array()); out.flush()
  }

  private def ok(fields: (String, BVal)*): BDoc =
    BDoc(fields.toSeq :+ ("ok" -> BDouble(1.0)))

  private def idOf(q: BDoc): BVal = q.get("_id").getOrElse(
    throw new IllegalStateException(s"filter without _id: ${Bson.renderJson(q)}"))

  /** Start the server; returns (port, store, stats, serverSocket). The
    * store maps `_id` → document per collection.
    */
  def serve(): (Int, ConcurrentHashMap[String, ConcurrentHashMap[BVal, BDoc]],
                Stats, ServerSocket) = {
    val server = new ServerSocket(0, 64,
      java.net.InetAddress.getLoopbackAddress)
    val store = new ConcurrentHashMap[String, ConcurrentHashMap[BVal, BDoc]]()
    val stats = new Stats

    def coll(name: String) =
      store.computeIfAbsent(name, _ => new ConcurrentHashMap[BVal, BDoc]())

    def handle(socket: Socket): Unit = {
      stats.connections.incrementAndGet()
      // per-connection cursors (real cursors are session-bound)
      val openCursors =
        scala.collection.mutable.Map.empty[Long, (String, Seq[BDoc])]
      val nextCursorId = new java.util.concurrent.atomic.AtomicLong(7000L)
      try {
        socket.setTcpNoDelay(true)
        val in = new DataInputStream(socket.getInputStream)
        val out = new DataOutputStream(socket.getOutputStream)
        var open = true
        while (open) {
          val (reqId, cmd) = readOpMsg(in)
          cmd.fields.headOption match {
            case Some(("hello", _)) | Some(("isMaster", _)) =>
              writeOpMsg(out, reqId, ok(
                "helloOk" -> BBool(true),
                "maxWireVersion" -> BInt32(17),
                "minWireVersion" -> BInt32(0)))

            case Some(("update", BStr(c))) =>
              val updates = cmd.get("updates") match {
                case Some(BArr(items)) => items.collect { case d: BDoc => d }
                case _ => throw new IllegalStateException("update without updates[]")
              }
              var matched = 0; var upserted = 0
              updates.foreach { u =>
                val q = u.get("q") match {
                  case Some(d: BDoc) => d
                  case _ => throw new IllegalStateException("update item without q")
                }
                val repl = u.get("u") match {
                  case Some(d: BDoc) => d
                  case _ => throw new IllegalStateException("update item without u")
                }
                require(u.get("upsert").contains(BBool(true)),
                  "sink write models are upsert replacements")
                require(!u.get("multi").contains(BBool(true)),
                  "replaceOne is single-document")
                // a real mongod rejects a replacement whose _id differs
                // from the matched document's
                val id = idOf(q)
                require(repl.get("_id").forall(_ == id),
                  "replacement _id must equal the filter _id")
                val prev = coll(c).put(id, repl)
                if (prev == null) { upserted += 1; stats.upserts.incrementAndGet() }
                else { matched += 1; stats.updates.incrementAndGet() }
              }
              writeOpMsg(out, reqId, ok(
                "n" -> BInt32(matched + upserted),
                "nModified" -> BInt32(matched)))

            case Some(("delete", BStr(c))) =>
              val deletes = cmd.get("deletes") match {
                case Some(BArr(items)) => items.collect { case d: BDoc => d }
                case _ => throw new IllegalStateException("delete without deletes[]")
              }
              var n = 0
              deletes.foreach { d =>
                val q = d.get("q") match {
                  case Some(doc: BDoc) => doc
                  case _ => throw new IllegalStateException("delete item without q")
                }
                require(d.get("limit").contains(BInt32(1)),
                  "deleteOne carries limit:1")
                if (coll(c).remove(idOf(q)) != null) {
                  n += 1; stats.deletes.incrementAndGet()
                }
              }
              writeOpMsg(out, reqId, ok("n" -> BInt32(n)))

            case Some(("find", BStr(c))) =>
              import scala.jdk.CollectionConverters._
              // real mongod caps the first batch at 101 documents and
              // opens a cursor for the rest — a read-back that ignores
              // getMore must SEE the truncation, not be saved by the
              // fixture
              val docs = coll(c).values().asScala.toSeq
              val (first, rest) = docs.splitAt(101)
              val cid =
                if (rest.isEmpty) 0L
                else {
                  val id = nextCursorId.incrementAndGet()
                  openCursors(id) = (c, rest)
                  id
                }
              writeOpMsg(out, reqId, ok(
                "cursor" -> BDoc(Seq(
                  "id" -> BInt64(cid),
                  "ns" -> BStr(s"db.$c"),
                  "firstBatch" -> BArr(first)))))

            case Some(("getMore", BInt64(cid))) =>
              val (c, rest) = openCursors.getOrElse(cid,
                throw new IllegalStateException(s"unknown cursor $cid"))
              val (batch, more) = rest.splitAt(1000)
              val nid =
                if (more.isEmpty) { openCursors.remove(cid); 0L }
                else { openCursors(cid) = (c, more); cid }
              writeOpMsg(out, reqId, ok(
                "cursor" -> BDoc(Seq(
                  "id" -> BInt64(nid),
                  "ns" -> BStr(s"db.$c"),
                  "nextBatch" -> BArr(batch)))))

            case Some(("endSessions", _)) =>
              writeOpMsg(out, reqId, ok())
              open = false

            case other =>
              throw new IllegalStateException(s"unexpected command: $other")
          }
        }
      } finally socket.close()
    }

    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val socket = server.accept()
          val t = new Thread(() => handle(socket), "mongo-sink-conn")
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: java.net.SocketException => () /* closed */ }
    }, "mongo-sink-server")
    acceptor.setDaemon(true)
    acceptor.start()
    (server.getLocalPort, store, stats, server)
  }
}
