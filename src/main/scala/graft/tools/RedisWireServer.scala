package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Protocol-faithful Redis FIXTURE SERVER (RESP2, loopback only — the
  * Jedis client jars used by the reference are env-blocked). Implements
  * the command subset the reference's Redis storage backends touch
  * (`debezium-storage-redis/src/main/java/io/debezium/storage/redis/
  * offset/RedisOffsetBackingStore.java` — offsets in a hash via
  * HSET/HGETALL/HDEL — and `.../history/RedisSchemaHistory.java` —
  * history in a stream via XADD/XRANGE/XLEN), plus AUTH/PING/ECHO for
  * the connection handshake. Requests are RESP arrays of bulk strings;
  * replies use the genuine RESP2 types (simple string, integer, bulk,
  * array, error), so a client against this server parses the same bytes
  * a real redis-server would send.
  */
object RedisWireServer {

  final class State {
    private[RedisWireServer] val hashes =
      TrieMap.empty[String, TrieMap[String, String]]
    private[RedisWireServer] val streams =
      TrieMap.empty[String, ArrayBuffer[(String, Seq[(String, String)])]]
    private[RedisWireServer] val streamSeq = new AtomicLong(0L)
    val commands = new AtomicInteger(0)
    @volatile var authSeen = false

    def hash(key: String): Map[String, String] =
      hashes.get(key).map(_.toMap).getOrElse(Map.empty)
    def streamLen(key: String): Int =
      streams.get(key).map(_.size).getOrElse(0)
  }

  def serve(password: String): (Int, State, Thread) = {
    val state = new State
    val server = new ServerSocket(0, 16,
      java.net.InetAddress.getLoopbackAddress)
    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val t = new Thread(() => handle(sock, state, password))
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: java.io.IOException => () }
    }, "redis-fixture-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    (server.getLocalPort, state, acceptor)
  }

  // ---- RESP2 framing ----

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      require(c >= 0, "EOF mid-line")
      sb.append(c.toChar)
      c = in.read()
    }
    require(in.read() == '\n', "CR without LF")
    sb.toString()
  }

  /** Read one client command: an array of bulk strings. */
  private def readCommand(in: InputStream): Option[Seq[String]] = {
    val first = in.read()
    if (first < 0) None
    else {
      require(first == '*', s"expected RESP array, got '${first.toChar}'")
      val n = readLine(in).toInt
      Some((0 until n).map { _ =>
        require(in.read() == '$', "expected bulk string")
        val len = readLine(in).toInt
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = in.read(buf, off, len - off)
          require(r >= 0, "EOF mid-bulk")
          off += r
        }
        require(in.read() == '\r' && in.read() == '\n', "bulk not CRLF-terminated")
        new String(buf, StandardCharsets.UTF_8)
      })
    }
  }

  private def simple(out: OutputStream, s: String): Unit =
    out.write(s"+$s\r\n".getBytes(StandardCharsets.UTF_8))
  private def err(out: OutputStream, s: String): Unit =
    out.write(s"-ERR $s\r\n".getBytes(StandardCharsets.UTF_8))
  private def integer(out: OutputStream, v: Long): Unit =
    out.write(s":$v\r\n".getBytes(StandardCharsets.UTF_8))
  private def bulk(out: OutputStream, s: String): Unit =
    if (s == null) out.write("$-1\r\n".getBytes(StandardCharsets.UTF_8))
    else {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(StandardCharsets.UTF_8))
      out.write(b); out.write("\r\n".getBytes(StandardCharsets.UTF_8))
    }
  private def arrayHeader(out: OutputStream, n: Int): Unit =
    out.write(s"*$n\r\n".getBytes(StandardCharsets.UTF_8))

  private def handle(sock: Socket, state: State, password: String): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      var authed = password == null
      var open = true
      while (open) {
        readCommand(in) match {
          case None => open = false
          case Some(cmd) =>
            state.commands.incrementAndGet()
            val name = cmd.head.toUpperCase
            if (!authed && name != "AUTH") err(out, "NOAUTH Authentication required.")
            else name match {
              case "AUTH" =>
                if (cmd.last == password) {
                  authed = true; state.authSeen = true; simple(out, "OK")
                } else err(out, "WRONGPASS invalid username-password pair")
              case "PING" => simple(out, "PONG")
              case "HSET" =>
                val h = state.hashes.getOrElseUpdate(cmd(1), TrieMap.empty)
                var added = 0
                cmd.drop(2).grouped(2).foreach { case Seq(f, v) =>
                  if (!h.contains(f)) added += 1
                  h.put(f, v)
                }
                integer(out, added.toLong)
              case "HGETALL" =>
                val h = state.hash(cmd(1)).toSeq.sortBy(_._1)
                arrayHeader(out, h.size * 2)
                h.foreach { case (f, v) => bulk(out, f); bulk(out, v) }
              case "HGET" =>
                bulk(out, state.hash(cmd(1)).getOrElse(cmd(2), null))
              case "HDEL" =>
                val h = state.hashes.get(cmd(1))
                val removed = cmd.drop(2).count(f => h.exists(_.remove(f).isDefined))
                integer(out, removed.toLong)
              case "XADD" =>
                // XADD key <*|ms[-seq]> field value [field value ...]
                val key = cmd(1)
                val fields = cmd.drop(3).grouped(2).map { case Seq(f, v) => (f, v) }.toSeq
                val s = state.streams.getOrElseUpdate(key, ArrayBuffer.empty)
                def parse(id: String): (Long, Long) = id.split("-") match {
                  case Array(ms)      => (ms.toLong, 0L)
                  case Array(ms, seq) => (ms.toLong, seq.toLong)
                }
                s.synchronized {
                  val id =
                    if (cmd(2) == "*") {
                      // real redis: an auto id is ALWAYS greater than the
                      // stream's top item, even after explicit-id appends
                      val floor = if (s.isEmpty) 0L else parse(s.last._1)._1
                      val ms = state.streamSeq
                        .updateAndGet(cur => math.max(cur + 1, floor + 1))
                      s"$ms-0"
                    }
                    else if (cmd(2).contains("-")) cmd(2)
                    else s"${cmd(2)}-0"
                  // real redis: explicit IDs must be strictly greater than
                  // the stream's top item
                  val ok = s.isEmpty || {
                    import scala.math.Ordering.Implicits._
                    parse(id) > parse(s.last._1)
                  }
                  if (!ok)
                    err(out, "The ID specified in XADD is equal or smaller " +
                      "than the target stream top item")
                  else {
                    s += ((id, fields))
                    bulk(out, id)
                  }
                }
              case "XLEN" => integer(out, state.streamLen(cmd(1)).toLong)
              case "TYPE" =>
                simple(out,
                  if (state.streams.contains(cmd(1))) "stream"
                  else if (state.hashes.contains(cmd(1))) "hash"
                  else "none")
              case "KEYS" =>
                // '*' pattern only (all the verification read uses)
                require(cmd(1) == "*", s"KEYS pattern '${cmd(1)}' unsupported")
                val ks = (state.hashes.keySet ++ state.streams.keySet).toSeq.sorted
                arrayHeader(out, ks.size)
                ks.foreach(bulk(out, _))
              case "XRANGE" =>
                // XRANGE key - +  (full range is all the backends use)
                val entries = state.streams.get(cmd(1))
                  .map(s => s.synchronized(s.toSeq)).getOrElse(Nil)
                arrayHeader(out, entries.size)
                entries.foreach { case (id, fields) =>
                  arrayHeader(out, 2)
                  bulk(out, id)
                  arrayHeader(out, fields.size * 2)
                  fields.foreach { case (f, v) => bulk(out, f); bulk(out, v) }
                }
              case other => err(out, s"unknown command '$other'")
            }
            out.flush()
        }
      }
    } catch {
      case _: java.io.IOException => ()
    } finally sock.close()
  }
}
