package graft.model

import java.nio.charset.StandardCharsets

import graft.sources.net.RocketMqClient

/** K7 RocketMQ schema-history storage over the live remoting client
  * (reference `debezium-storage-rocketmq/src/main/java/io/debezium/
  * storage/rocketmq/history/RocketMqSchemaHistory.java`: records
  * produced to a single-queue topic, recovery pulls the queue from
  * offset 0 to the max offset in order). The reference module ships
  * history storage only — offsets stay with the engine's other
  * backends — and so does this one.
  */
final class RocketMqHistoryStorage(host: String, port: Int, topic: String)
  extends HistoryStorage with AutoCloseable {

  private val client = new RocketMqClient(host, port, group = "graft-history")

  override def append(line: String): Unit =
    client.sendString(topic, 0, line,
      properties = Seq("graft.kind" -> "schema-history"))

  override def readAll(): Seq[String] =
    client.pullAll(topic, 0)
      .sortBy(_.queueOffset)
      .map(m => new String(m.body, StandardCharsets.UTF_8))

  override def close(): Unit = client.close()
}
