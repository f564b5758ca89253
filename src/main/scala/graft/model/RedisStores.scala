package graft.model

import graft.sources.net.RedisClient

/** K7 Redis storage backends over the live RESP client (reference
  * `debezium-storage-redis/src/main/java/io/debezium/storage/redis/
  * offset/RedisOffsetBackingStore.java` — offsets as fields of one Redis
  * hash, loaded with HGETALL at start, written with HSET per commit —
  * and `.../history/RedisSchemaHistory.java` — history records appended
  * to a Redis stream with XADD and replayed with XRANGE - +).
  */
final class RedisOffsetBackingStore(host: String, port: Int,
                                    password: String, key: String)
  extends OffsetBackingStore with AutoCloseable {

  private val client = new RedisClient(host, port, password)
  private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
  cache ++= client.hgetAll(key)

  override def get(k: String): Option[String] = cache.get(k)

  override def set(k: String, value: String): Unit = {
    client.hset(key, k, value)
    cache.put(k, value)
  }

  def remove(k: String): Unit = {
    client.hdel(key, k)
    cache.remove(k)
  }

  override def snapshot: Map[String, String] = cache.toMap

  override def close(): Unit = client.close()
}

/** Schema history as a Redis stream: XADD appends a `{schema: line}`
  * entry, recovery XRANGEs the whole stream in id order.
  */
final class RedisHistoryStorage(host: String, port: Int,
                                password: String, key: String)
  extends HistoryStorage with AutoCloseable {

  private val client = new RedisClient(host, port, password)

  override def append(line: String): Unit =
    client.xadd(key, "schema" -> line)

  override def readAll(): Seq[String] =
    client.xrangeAll(key).map(_._2("schema"))

  override def close(): Unit = client.close()
}
