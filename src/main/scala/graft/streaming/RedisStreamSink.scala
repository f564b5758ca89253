package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.net.RedisClient

/** K1-family Redis Streams change-event sink (the reference ecosystem's
  * debezium-server redis sink: one Redis stream per destination topic,
  * each change event appended with XADD as a `{key, value}` field pair
  * — its "compact" message format — batched through client pipelining).
  * The Jedis jars are env-blocked, so the published RESP2 protocol is
  * spoken directly via [[RedisClient]] against the protocol-faithful
  * loopback fixture (`graft.tools.RedisWireServer`).
  *
  * Distributed shape: one client per executor partition; XADDs are
  * RESP-pipelined per (topic, chunk), so a batch costs one round trip,
  * not one per record. The driver only sees bounded per-topic counts.
  * Stream entries keep arrival order per partition — routing upstream by
  * key (the repartition the caller already has) preserves per-key order,
  * the same guarantee the reference gets from Kafka partitioning.
  */
object RedisStreamSink {

  /** Field pairs of one entry: a NULL key or value (tombstones are the
    * standard null-value delete representation) is OMITTED rather than
    * sent — `readBack`'s `getOrElse(..., null)` recovers the null
    * exactly. XADD needs at least one field, so the both-null case
    * carries an explicit tombstone marker.
    */
  private def entryFields(key: String, value: String): Seq[String] = {
    val fs = (if (key == null) Nil else Seq("key", key)) ++
      (if (value == null) Nil else Seq("value", value))
    if (fs.nonEmpty) fs else Seq("tombstone", "1")
  }

  /** Write (topic, key, value) string rows; returns per-topic produced
    * counts for verification.
    */
  def write(df: DataFrame, host: String, port: Int,
            batchSize: Int = 500, password: String = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.select(
      col("topic").cast("string"),
      col("key").cast("string"),
      col("value").cast("string"))
    val counts = cols.mapPartitions { it: Iterator[Row] =>
      if (!it.hasNext) Iterator.empty
      else {
        val client = new RedisClient(host, port, password)
        try {
          val acc = scala.collection.mutable.Map.empty[String, Long]
          it.grouped(batchSize).foreach { chunk =>
            chunk.groupBy(_.getString(0)).foreach { case (topic, rows) =>
              val replies = client.pipeline(rows.map(r =>
                Seq("XADD", topic, "*") ++
                  RedisStreamSink.entryFields(r.getString(1), r.getString(2))))
              replies.foreach {
                case RedisClient.Bulk(id) if id != null => ()
                case other =>
                  throw new IllegalStateException(s"XADD failed: $other")
              }
              acc(topic) = acc.getOrElse(topic, 0L) + rows.size
            }
          }
          acc.iterator.map { case (t, n) => (t, n) }
        } finally client.close()
      }
    }.toDF("topic", "n")
    // produce exactly once: materialize the lazy mapPartitions HERE and
    // hand back a local frame (re-collecting must not re-XADD)
    import spark.implicits._
    counts.groupBy("topic").agg(sum("n").as("produced"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("topic", "produced")
  }

  /** Exactly-once append: each record is XADDed with an EXPLICIT id
    * derived from its source position (`<pos>-0`), produced in pos
    * order per topic. Real Redis rejects an explicit id ≤ the stream's
    * top item, so a replayed batch is rejected record-by-record by the
    * SERVER — at-least-once delivery composes to exactly-once stream
    * content with no sink-side epoch state at all (the log position IS
    * the fence). `df`: (topic, pos, key, value) rows; POS MUST BE
    * UNIQUE WITHIN A TOPIC and non-negative (the envelope's pos is a
    * collision-free total order by contract) — a violated invariant
    * would be misread as a replay. Returns per-topic
    * (produced, skipped) counts.
    */
  def writeIdempotent(df: DataFrame, host: String, port: Int,
                      batchSize: Int = 500, password: String = null,
                      numPartitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val routed = df.select(
        col("topic").cast("string"),
        col("pos").cast("long"),
        col("key").cast("string"),
        col("value").cast("string"))
      // per-topic pos order within each partition: explicit stream ids
      // must arrive ascending
      .repartition(numPartitions, col("topic"))
      .sortWithinPartitions(col("topic"), col("pos"))
    val counts = routed.mapPartitions { it: Iterator[Row] =>
      if (!it.hasNext) Iterator.empty
      else {
        val client = new RedisClient(host, port, password)
        try {
          val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
          it.grouped(batchSize).foreach { chunk =>
            chunk.groupBy(_.getString(0)).foreach { case (topic, rows) =>
              val replies = client.pipeline(rows.map(r =>
                Seq("XADD", topic, s"${r.getLong(1)}-0") ++
                  RedisStreamSink.entryFields(r.getString(2), r.getString(3))))
              var (p, sk) = acc.getOrElse(topic, (0L, 0L))
              replies.foreach {
                case RedisClient.Bulk(id) if id != null => p += 1
                case RedisClient.Err(m)
                    if m.contains("equal or smaller") => sk += 1
                case other =>
                  throw new IllegalStateException(s"XADD failed: $other")
              }
              acc(topic) = (p, sk)
            }
          }
          acc.iterator.map { case (t, (p, sk)) => (t, p, sk) }
        } finally client.close()
      }
    }.toDF("topic", "p", "s")
    import spark.implicits._
    counts.groupBy("topic")
      .agg(sum("p").as("produced"), sum("s").as("skipped"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("topic", "produced", "skipped")
  }

  /** Read every entry of every stream back (driver-side verification
    * read): (stream, id, key, value).
    */
  def readBack(spark: SparkSession, host: String, port: Int,
               password: String = null): DataFrame = {
    import spark.implicits._
    val client = new RedisClient(host, port, password)
    try {
      val keys = client.command("KEYS", "*") match {
        case RedisClient.Arr(items) => items.collect {
          case RedisClient.Bulk(k) => k
        }
        case other => throw new IllegalStateException(s"KEYS failed: $other")
      }
      // the instance may also hold non-stream keys (e.g. the hash-based
      // offset store); XRANGE on those is WRONGTYPE on real redis
      val streams = keys.filter { k =>
        client.command("TYPE", k) == RedisClient.Simple("stream")
      }
      val rows = streams.flatMap { stream =>
        client.xrangeAll(stream).map { case (id, fields) =>
          (stream, id, fields.getOrElse("key", null),
            fields.getOrElse("value", null))
        }
      }
      rows.toDF("topic", "id", "key", "value")
    } finally client.close()
  }
}
