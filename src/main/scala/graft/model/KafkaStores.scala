package graft.model

import java.nio.charset.StandardCharsets

import graft.sources.net.KafkaClient

/** K7 Kafka storage backends over the live wire client (reference:
  * Connect's `KafkaOffsetBackingStore` used by the embedded engine, and
  * `debezium-storage-kafka/src/main/java/io/debezium/storage/kafka/
  * history/KafkaSchemaHistory.java`). Both restart paths are a full read
  * of the backing topic partition:
  *
  *  - offsets live in a log-compacted topic keyed by offset key; the
  *    recovery read folds last-value-wins per key and a null-value
  *    tombstone deletes the key (exactly what compaction retains — the
  *    reader's fold is identical whether or not the broker has already
  *    compacted the log);
  *  - schema history is an append-only single-partition topic replayed
  *    in offset order at startup.
  *
  * At 100 TB / production scale the same reads bound themselves by key
  * cardinality (offsets) and DDL count (history), not data size — both
  * are control-plane-sized topics.
  */
final class KafkaOffsetBackingStore(host: String, port: Int, topic: String)
  extends OffsetBackingStore with AutoCloseable {

  private val client = new KafkaClient(host, port, clientId = "graft-offsets")
  private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
  replay()

  private def replay(): Unit =
    client.fetchAll(topic, 0).foreach { r =>
      val k = new String(r.key, StandardCharsets.UTF_8)
      if (r.value == null) cache.remove(k)
      else cache.put(k, new String(r.value, StandardCharsets.UTF_8))
    }

  override def get(key: String): Option[String] = cache.get(key)

  override def set(key: String, value: String): Unit = {
    client.produceStrings(topic, 0, Seq((key, value)))
    cache.put(key, value)
  }

  /** Compacted delete: produce a tombstone for the key. */
  def remove(key: String): Unit = {
    client.produceStrings(topic, 0, Seq((key, null)))
    cache.remove(key)
  }

  override def snapshot: Map[String, String] = cache.toMap

  override def close(): Unit = client.close()
}

/** Append-only schema history on a single-partition topic (reference
  * `KafkaSchemaHistory.storeRecord` / `recoverRecords`).
  */
final class KafkaHistoryStorage(host: String, port: Int, topic: String)
  extends HistoryStorage with AutoCloseable {

  private val client = new KafkaClient(host, port, clientId = "graft-history")

  override def append(line: String): Unit =
    client.produceStrings(topic, 0,
      Seq((null: String, line)))

  override def readAll(): Seq[String] =
    client.fetchAll(topic, 0)
      .sortBy(_.offset)
      .map(r => new String(r.value, StandardCharsets.UTF_8))

  override def close(): Unit = client.close()
}
