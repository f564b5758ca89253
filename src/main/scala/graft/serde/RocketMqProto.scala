package graft.serde

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import graft.serde.Bson.{BDoc, BInt32, BStr, BVal}

/** Apache RocketMQ remoting-protocol codec, implemented from the
  * published protocol (the OSS `RemotingCommand` / `MessageDecoder`
  * wire formats): a frame is `int32 totalLength`, then `int32` whose
  * high byte is the header serialize type (0 = JSON) and low 3 bytes
  * the header length, then the JSON `RemotingCommand` header, then the
  * body. The reference's RocketMQ storage module drives this protocol
  * through the rocketmq-client jars (`debezium-storage-rocketmq/src/
  * main/java/io/debezium/storage/rocketmq/history/
  * RocketMqSchemaHistory.java`); those jars are env-blocked, so the
  * bytes are produced directly.
  */
object RocketMqProto {

  // request codes (RocketMQ RequestCode)
  val SendMessage = 10
  val PullMessage = 11
  val GetMaxOffset = 30
  // response codes (ResponseCode)
  val Success = 0
  val PullNotFound = 19
  val SystemError = 1

  val ResponseFlag = 1 // RemotingCommand RPC_TYPE bit

  /** CommitLog MAGICCODE. */
  val MessageMagic: Int = -626843481

  final case class Command(code: Int, opaque: Int, flag: Int,
                           remark: Option[String],
                           extFields: Map[String, String],
                           body: Array[Byte])

  def encodeFrame(cmd: Command): Array[Byte] = {
    val fields: Seq[(String, BVal)] = Seq(
      "code" -> BInt32(cmd.code),
      "language" -> BStr("JAVA"),
      "version" -> BInt32(433),
      "opaque" -> BInt32(cmd.opaque),
      "flag" -> BInt32(cmd.flag)) ++
      cmd.remark.map(r => "remark" -> (BStr(r): BVal)).toSeq ++
      (if (cmd.extFields.isEmpty) Nil
       else Seq("extFields" -> (BDoc(cmd.extFields.toSeq.sortBy(_._1)
         .map { case (k, v) => k -> (BStr(v): BVal) }): BVal)))
    val header = Bson.renderJson(BDoc(fields))
      .getBytes(StandardCharsets.UTF_8)
    val body = if (cmd.body == null) Array.emptyByteArray else cmd.body
    val bb = ByteBuffer.allocate(8 + header.length + body.length)
    bb.putInt(4 + header.length + body.length)
    bb.putInt(header.length & 0xffffff) // serialize type 0 (JSON) in high byte
    bb.put(header)
    bb.put(body)
    bb.array()
  }

  /** Decode one frame (after the outer totalLength int32 was consumed
    * and `frame` holds exactly that many bytes).
    */
  def decodeFrame(frame: Array[Byte]): Command = {
    val bb = ByteBuffer.wrap(frame)
    val mark = bb.getInt()
    val serializeType = (mark >> 24) & 0xff
    require(serializeType == 0, s"only JSON headers supported, got $serializeType")
    val headerLen = mark & 0xffffff
    val header = new Array[Byte](headerLen)
    bb.get(header)
    val body = new Array[Byte](bb.remaining())
    bb.get(body)
    val doc = Bson.parseJson(new String(header, StandardCharsets.UTF_8)) match {
      case d: BDoc => d
      case other => throw new IllegalStateException(s"bad header: $other")
    }
    def int(name: String, default: Int = 0): Int = doc.get(name) match {
      case Some(BInt32(v)) => v
      case Some(Bson.BInt64(v)) => v.toInt
      case Some(Bson.BDouble(v)) => v.toInt
      case _ => default
    }
    val ext = doc.get("extFields") match {
      case Some(d: BDoc) => d.fields.collect {
        case (k, BStr(v)) => k -> v
        case (k, BInt32(v)) => k -> v.toString
        case (k, Bson.BInt64(v)) => k -> v.toString
        case (k, Bson.BBool(v)) => k -> v.toString
      }.toMap
      case _ => Map.empty[String, String]
    }
    val remark = doc.get("remark").collect { case BStr(s) => s }
    Command(int("code"), int("opaque"), int("flag"), remark, ext, body)
  }

  /** Message properties string (MessageDecoder contract):
    * `k\u0001v\u0002` per property, PROPERTY_SEPARATOR-terminated.
    */
  private val NameValueSep = '\u0001'
  private val PropSep = '\u0002'

  def renderProperties(props: Seq[(String, String)]): String =
    props.map { case (k, v) => s"$k$NameValueSep$v$PropSep" }.mkString

  def parseProperties(s: String): Seq[(String, String)] =
    if (s.isEmpty) Nil
    else s.split(PropSep).toSeq.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf(NameValueSep.toInt)
      (kv.substring(0, i), kv.substring(i + 1))
    }

  final case class StoredMessage(queueOffset: Long, bornTimestamp: Long,
                                 properties: Seq[(String, String)],
                                 body: Array[Byte])

  /** Encode one message in the CommitLog `MessageDecoder` layout (the
    * pull-response body format).
    */
  def encodeMessage(topic: String, queueId: Int,
                    msg: StoredMessage): Array[Byte] = {
    val topicB = topic.getBytes(StandardCharsets.UTF_8)
    val propsB = renderProperties(msg.properties)
      .getBytes(StandardCharsets.UTF_8)
    val total = 4 + 4 + 4 + 4 + 4 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + 4 + 8 +
      4 + msg.body.length + 1 + topicB.length + 2 + propsB.length
    val bb = ByteBuffer.allocate(total)
    bb.putInt(total)
    bb.putInt(MessageMagic)
    val crc = new java.util.zip.CRC32
    crc.update(msg.body)
    bb.putInt(crc.getValue.toInt)       // bodyCRC
    bb.putInt(queueId)
    bb.putInt(0)                        // flag
    bb.putLong(msg.queueOffset)
    bb.putLong(0L)                      // commitLog offset
    bb.putInt(0)                        // sysFlag
    bb.putLong(msg.bornTimestamp)
    bb.putInt(0x7f000001); bb.putInt(0) // bornHost 127.0.0.1:0
    bb.putLong(msg.bornTimestamp)       // storeTimestamp
    bb.putInt(0x7f000001); bb.putInt(0) // storeHost
    bb.putInt(0)                        // reconsumeTimes
    bb.putLong(0L)                      // preparedTransactionOffset
    bb.putInt(msg.body.length); bb.put(msg.body)
    bb.put(topicB.length.toByte); bb.put(topicB)
    bb.putShort(propsB.length.toShort); bb.put(propsB)
    bb.array()
  }

  /** Decode a pull-response body (concatenated messages), verifying the
    * magic and body CRC of each.
    */
  def decodeMessages(data: Array[Byte]): Seq[(String, StoredMessage)] = {
    val out = Seq.newBuilder[(String, StoredMessage)]
    val bb = ByteBuffer.wrap(data)
    while (bb.remaining() >= 4) {
      val start = bb.position()
      val total = bb.getInt()
      require(bb.remaining() >= total - 4, "truncated message")
      require(bb.getInt() == MessageMagic, "bad message magic")
      val bodyCrc = bb.getInt()
      val queueId = bb.getInt()
      bb.getInt()                       // flag
      val queueOffset = bb.getLong()
      bb.getLong()                      // commitLog offset
      bb.getInt()                       // sysFlag
      val bornTs = bb.getLong()
      bb.getInt(); bb.getInt()          // bornHost
      bb.getLong()                      // storeTimestamp
      bb.getInt(); bb.getInt()          // storeHost
      bb.getInt()                       // reconsumeTimes
      bb.getLong()                      // preparedTransactionOffset
      val body = new Array[Byte](bb.getInt()); bb.get(body)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      require(crc.getValue.toInt == bodyCrc, "message body CRC mismatch")
      val topic = new Array[Byte](bb.get() & 0xff); bb.get(topic)
      val props = new Array[Byte](bb.getShort() & 0xffff); bb.get(props)
      require(bb.position() == start + total, "message length mismatch")
      require(queueId >= 0, "negative queueId")
      out += ((new String(topic, StandardCharsets.UTF_8),
        StoredMessage(queueOffset, bornTs,
          parseProperties(new String(props, StandardCharsets.UTF_8)), body)))
    }
    out.result()
  }
}
