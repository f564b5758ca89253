package graft.sources.net

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Minimal RESP2 Redis client over TCP — the live transport behind the
  * Redis-backed K7 stores (the reference reaches Redis through Jedis:
  * `debezium-storage-redis/.../RedisOffsetBackingStore.java`,
  * `RedisSchemaHistory.java`; the client jars are env-blocked, so the
  * published RESP protocol is spoken directly). Commands go out as RESP
  * arrays of bulk strings; every RESP2 reply type is parsed (simple,
  * error, integer, bulk, array). Exercised against
  * `graft.tools.RedisWireServer` — zero egress.
  */
final class RedisClient(host: String, port: Int, password: String = null) {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)

  if (password != null) {
    command("AUTH", password) match {
      case RedisClient.Simple("OK") => ()
      case other => throw new IllegalStateException(s"AUTH failed: $other")
    }
  }

  def command(args: String*): RedisClient.Reply = {
    writeCommand(args)
    out.flush()
    readReply(in)
  }

  private def writeCommand(args: Seq[String]): Unit = {
    val sb = new StringBuilder
    sb.append('*').append(args.size).append("\r\n")
    args.foreach { a =>
      val b = a.getBytes(StandardCharsets.UTF_8)
      sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
    }
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** RESP pipelining: send every command, THEN read every reply — one
    * network round trip per batch instead of per command (the transport
    * shape the reference's Redis sink gets from Jedis `Pipeline`).
    */
  def pipeline(cmds: Seq[Seq[String]]): Seq[RedisClient.Reply] = {
    cmds.foreach(writeCommand)
    out.flush()
    cmds.map(_ => readReply(in))
  }

  private def readLine(s: InputStream): String = {
    val sb = new StringBuilder
    var c = s.read()
    while (c != '\r') {
      require(c >= 0, "EOF mid-line")
      sb.append(c.toChar); c = s.read()
    }
    require(s.read() == '\n', "CR without LF")
    sb.toString()
  }

  private def readReply(s: InputStream): RedisClient.Reply = s.read() match {
    case '+' => RedisClient.Simple(readLine(s))
    case '-' => RedisClient.Err(readLine(s))
    case ':' => RedisClient.Num(readLine(s).toLong)
    case '$' =>
      val n = readLine(s).toInt
      if (n < 0) RedisClient.Bulk(null)
      else {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = s.read(buf, off, n - off); require(r >= 0, "EOF mid-bulk"); off += r
        }
        require(s.read() == '\r' && s.read() == '\n', "bulk not CRLF-terminated")
        RedisClient.Bulk(new String(buf, StandardCharsets.UTF_8))
      }
    case '*' =>
      val n = readLine(s).toInt
      RedisClient.Arr((0 until n).map(_ => readReply(s)))
    case other =>
      throw new IllegalStateException(s"unknown RESP type byte $other")
  }

  // ---- typed helpers for the storage backends ----

  private def expectNum(r: RedisClient.Reply): Long = r match {
    case RedisClient.Num(v) => v
    case other => throw new IllegalStateException(s"expected integer, got $other")
  }

  def hset(key: String, field: String, value: String): Long =
    expectNum(command("HSET", key, field, value))

  def hdel(key: String, field: String): Long =
    expectNum(command("HDEL", key, field))

  def hgetAll(key: String): Map[String, String] = command("HGETALL", key) match {
    case RedisClient.Arr(items) =>
      items.grouped(2).map {
        case Seq(RedisClient.Bulk(f), RedisClient.Bulk(v)) => f -> v
        case other => throw new IllegalStateException(s"bad HGETALL pair $other")
      }.toMap
    case other => throw new IllegalStateException(s"expected array, got $other")
  }

  def xadd(key: String, fields: (String, String)*): String =
    command(Seq("XADD", key, "*") ++ fields.flatMap(f => Seq(f._1, f._2)): _*) match {
      case RedisClient.Bulk(id) => id
      case other => throw new IllegalStateException(s"XADD failed: $other")
    }

  def xrangeAll(key: String): Seq[(String, Map[String, String])] =
    command("XRANGE", key, "-", "+") match {
      case RedisClient.Arr(entries) => entries.map {
        case RedisClient.Arr(Seq(RedisClient.Bulk(id), RedisClient.Arr(kv))) =>
          (id, kv.grouped(2).map {
            case Seq(RedisClient.Bulk(f), RedisClient.Bulk(v)) => f -> v
            case other => throw new IllegalStateException(s"bad field pair $other")
          }.toMap)
        case other => throw new IllegalStateException(s"bad XRANGE entry $other")
      }
      case other => throw new IllegalStateException(s"expected array, got $other")
    }

  def close(): Unit = socket.close()
}

object RedisClient {
  sealed trait Reply
  final case class Simple(s: String) extends Reply
  final case class Err(s: String) extends Reply
  final case class Num(v: Long) extends Reply
  final case class Bulk(s: String) extends Reply
  final case class Arr(items: Seq[Reply]) extends Reply
}
