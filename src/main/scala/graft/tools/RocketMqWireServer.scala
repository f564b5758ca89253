package graft.tools

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import graft.serde.RocketMqProto
import graft.serde.RocketMqProto.{Command, StoredMessage}

/** Protocol-faithful Apache RocketMQ BROKER FIXTURE (loopback only —
  * the rocketmq-client jars are env-blocked). Speaks the published
  * remoting protocol: int32-framed commands with JSON
  * `RemotingCommand` headers, SEND_MESSAGE (header fields genuinely
  * validated, queue offsets assigned, properties stored), PULL_MESSAGE
  * (messages re-encoded in the CommitLog `MessageDecoder` layout,
  * PULL_NOT_FOUND past the max offset) and GET_MAX_OFFSET. A client
  * against this server exercises both codec directions plus the queue
  * semantics an actual broker owns.
  */
object RocketMqWireServer {

  private final class Queue {
    val messages = new ArrayBuffer[StoredMessage]
  }

  final class Broker {
    private[RocketMqWireServer] val queues = TrieMap.empty[(String, Int), Queue]
    val sends = new AtomicInteger(0)
    val pulls = new AtomicInteger(0)

    private[RocketMqWireServer] def queue(topic: String, id: Int): Queue =
      queues.getOrElseUpdate((topic, id), new Queue)

    def messageCount(topic: String, queueId: Int = 0): Int =
      queues.get((topic, queueId)).map(_.messages.size).getOrElse(0)
  }

  /** Messages returned per pull — forces the client to loop. */
  def serve(maxPerPull: Int = 32): (Int, Broker, Thread) = {
    val broker = new Broker
    val server = new ServerSocket(0, 16,
      java.net.InetAddress.getLoopbackAddress)
    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val t = new Thread(() => handle(sock, broker, maxPerPull))
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: java.io.IOException => () }
    }, "rocketmq-fixture-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    (server.getLocalPort, broker, acceptor)
  }

  private def handle(sock: Socket, broker: Broker, maxPerPull: Int): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      var open = true
      while (open) {
        val len = try in.readInt() catch { case _: java.io.EOFException => -1 }
        if (len < 0) open = false
        else {
          val frame = new Array[Byte](len)
          in.readFully(frame)
          val req = RocketMqProto.decodeFrame(frame)
          val resp = req.code match {
            case RocketMqProto.SendMessage => send(req, broker)
            case RocketMqProto.PullMessage => pull(req, broker, maxPerPull)
            case RocketMqProto.GetMaxOffset => maxOffset(req, broker)
            case other => Command(RocketMqProto.SystemError, req.opaque,
              RocketMqProto.ResponseFlag,
              Some(s"request code $other not supported"), Map.empty, null)
          }
          out.write(RocketMqProto.encodeFrame(resp)); out.flush()
        }
      }
    } catch {
      case _: java.io.IOException => ()
    } finally sock.close()
  }

  private def send(req: Command, broker: Broker): Command = {
    broker.sends.incrementAndGet()
    val ext = req.extFields
    // SendMessageRequestHeader required fields — genuinely validated
    val missing = Seq("producerGroup", "topic", "queueId", "bornTimestamp")
      .filterNot(ext.contains)
    if (missing.nonEmpty)
      return Command(RocketMqProto.SystemError, req.opaque,
        RocketMqProto.ResponseFlag,
        Some(s"missing header fields: ${missing.mkString(",")}"),
        Map.empty, null)
    val topic = ext("topic")
    val queueId = ext("queueId").toInt
    val props = RocketMqProto.parseProperties(ext.getOrElse("properties", ""))
    val q = broker.queue(topic, queueId)
    val offset = q.synchronized {
      val off = q.messages.size.toLong
      q.messages += StoredMessage(off, ext("bornTimestamp").toLong, props,
        if (req.body == null) Array.emptyByteArray else req.body)
      off
    }
    Command(RocketMqProto.Success, req.opaque, RocketMqProto.ResponseFlag,
      None, Map(
        "msgId" -> f"7F000001000000000000${offset}%012X",
        "queueId" -> queueId.toString,
        "queueOffset" -> offset.toString), null)
  }

  private def pull(req: Command, broker: Broker, maxPerPull: Int): Command = {
    broker.pulls.incrementAndGet()
    val ext = req.extFields
    val topic = ext("topic")
    val queueId = ext("queueId").toInt
    val from = ext("queueOffset").toLong
    val maxNum = math.min(ext.getOrElse("maxMsgNums", "32").toInt, maxPerPull)
    broker.queues.get((topic, queueId)) match {
      case None =>
        Command(RocketMqProto.PullNotFound, req.opaque,
          RocketMqProto.ResponseFlag, Some("no such queue"),
          Map("nextBeginOffset" -> "0", "minOffset" -> "0",
            "maxOffset" -> "0", "suggestWhichBrokerId" -> "0"), null)
      case Some(q) =>
        val (slice, max) = q.synchronized {
          (q.messages.slice(from.toInt, from.toInt + maxNum).toSeq,
            q.messages.size.toLong)
        }
        if (slice.isEmpty)
          Command(RocketMqProto.PullNotFound, req.opaque,
            RocketMqProto.ResponseFlag, None,
            Map("nextBeginOffset" -> max.toString, "minOffset" -> "0",
              "maxOffset" -> max.toString, "suggestWhichBrokerId" -> "0"),
            null)
        else {
          val body = slice.map(RocketMqProto.encodeMessage(topic, queueId, _))
            .reduce(_ ++ _)
          Command(RocketMqProto.Success, req.opaque,
            RocketMqProto.ResponseFlag, None,
            Map("nextBeginOffset" -> (slice.last.queueOffset + 1).toString,
              "minOffset" -> "0", "maxOffset" -> max.toString,
              "suggestWhichBrokerId" -> "0"), body)
        }
    }
  }

  private def maxOffset(req: Command, broker: Broker): Command = {
    val topic = req.extFields("topic")
    val queueId = req.extFields("queueId").toInt
    val max = broker.queues.get((topic, queueId))
      .map(q => q.synchronized(q.messages.size.toLong)).getOrElse(0L)
    Command(RocketMqProto.Success, req.opaque, RocketMqProto.ResponseFlag,
      None, Map("offset" -> max.toString), null)
  }
}
