package graft.sources.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import graft.serde.RocketMqProto
import graft.serde.RocketMqProto.{Command, StoredMessage}

/** Minimal RocketMQ client over TCP — the live transport behind the
  * RocketMQ-backed K7 history store (the reference reaches the broker
  * through the rocketmq-client jars: `debezium-storage-rocketmq/.../
  * RocketMqSchemaHistory.java`; those jars are env-blocked, so the
  * published remoting protocol is spoken directly). SEND_MESSAGE with a
  * full `SendMessageRequestHeader`, PULL_MESSAGE looped via
  * `nextBeginOffset` until PULL_NOT_FOUND, GET_MAX_OFFSET for the
  * recovery bound. Exercised against `graft.tools.RocketMqWireServer`
  * — zero egress.
  */
final class RocketMqClient(host: String, port: Int, group: String = "graft") {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val opaques = new AtomicInteger(1)

  private def roundTrip(code: Int, ext: Map[String, String],
                        body: Array[Byte]): Command = {
    val opaque = opaques.getAndIncrement()
    out.write(RocketMqProto.encodeFrame(
      Command(code, opaque, 0, None, ext, body)))
    out.flush()
    val len = in.readInt()
    val frame = new Array[Byte](len)
    in.readFully(frame)
    val resp = RocketMqProto.decodeFrame(frame)
    require(resp.opaque == opaque,
      s"opaque mismatch: ${resp.opaque} vs $opaque")
    require((resp.flag & RocketMqProto.ResponseFlag) != 0,
      "reply lacks the response flag")
    resp
  }

  /** Send one message; returns the broker-assigned queue offset. */
  def send(topic: String, queueId: Int, body: Array[Byte],
           properties: Seq[(String, String)] = Nil): Long = {
    val resp = roundTrip(RocketMqProto.SendMessage, Map(
      "producerGroup" -> group,
      "topic" -> topic,
      "defaultTopic" -> "TBW102",
      "defaultTopicQueueNums" -> "4",
      "queueId" -> queueId.toString,
      "sysFlag" -> "0",
      "bornTimestamp" -> "0",
      "flag" -> "0",
      "properties" -> RocketMqProto.renderProperties(properties),
      "reconsumeTimes" -> "0",
      "unitMode" -> "false",
      "batch" -> "false"), body)
    require(resp.code == RocketMqProto.Success,
      s"send failed: code=${resp.code} ${resp.remark.getOrElse("")}")
    resp.extFields("queueOffset").toLong
  }

  def sendString(topic: String, queueId: Int, body: String,
                 properties: Seq[(String, String)] = Nil): Long =
    send(topic, queueId, body.getBytes(StandardCharsets.UTF_8), properties)

  def maxOffset(topic: String, queueId: Int): Long = {
    val resp = roundTrip(RocketMqProto.GetMaxOffset, Map(
      "topic" -> topic, "queueId" -> queueId.toString), null)
    require(resp.code == RocketMqProto.Success, s"maxOffset code=${resp.code}")
    resp.extFields("offset").toLong
  }

  /** One pull; (nextBeginOffset, messages) — empty past the end. */
  def pullOnce(topic: String, queueId: Int, offset: Long,
               maxMsgNums: Int = 32): (Long, Seq[StoredMessage]) = {
    val resp = roundTrip(RocketMqProto.PullMessage, Map(
      "consumerGroup" -> group,
      "topic" -> topic,
      "queueId" -> queueId.toString,
      "queueOffset" -> offset.toString,
      "maxMsgNums" -> maxMsgNums.toString,
      "sysFlag" -> "0",
      "commitOffset" -> "0",
      "suspendTimeoutMillis" -> "0",
      "subscription" -> "*",
      "subVersion" -> "0",
      "expressionType" -> "TAG"), null)
    resp.code match {
      case RocketMqProto.Success =>
        val msgs = RocketMqProto.decodeMessages(resp.body).map { case (t, m) =>
          require(t == topic, s"pulled message for topic $t, wanted $topic")
          m
        }
        (resp.extFields("nextBeginOffset").toLong, msgs)
      case RocketMqProto.PullNotFound =>
        (resp.extFields("nextBeginOffset").toLong, Nil)
      case other =>
        throw new IllegalStateException(
          s"pull failed: code=$other ${resp.remark.getOrElse("")}")
    }
  }

  /** Drain a queue from `fromOffset` to its current max offset. */
  def pullAll(topic: String, queueId: Int,
              fromOffset: Long = 0L): Seq[StoredMessage] = {
    val max = maxOffset(topic, queueId)
    val acc = Seq.newBuilder[StoredMessage]
    var offset = fromOffset
    while (offset < max) {
      val (next, msgs) = pullOnce(topic, queueId, offset)
      acc ++= msgs
      require(next > offset || msgs.isEmpty, "pull made no progress")
      offset = if (msgs.isEmpty) max else next
    }
    acc.result()
  }

  def close(): Unit = socket.close()
}
