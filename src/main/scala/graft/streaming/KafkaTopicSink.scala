package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.sources.net.KafkaClient

/** K1 topic sink over the live wire client (SURVEY §2.2 K1; reference
  * emits one topic per table with the record key = PK through the Kafka
  * producer — `schema/DefaultTopicNamingStrategy.java` names the topic,
  * Connect's producer does the write; the client jars are env-blocked so
  * the produce path speaks the published protocol directly via
  * `KafkaClient`).
  *
  * Distributed shape: one client per PARTITION (executor task), records
  * grouped by topic inside the partition and produced in bounded batches
  * — the same per-task-producer + per-topic-batch shape the real
  * producer's record accumulator gives. No driver collect; the driver
  * only sees the returned per-topic counts (bounded by topic
  * cardinality). At 1000 executors this is 1000 concurrent connections,
  * which is exactly how Connect deploys.
  */
object KafkaTopicSink {

  /** Write (topic, key, value) string rows; returns per-topic produced
    * counts as a DataFrame for verification.
    */
  def write(df: DataFrame, host: String, port: Int,
            batchSize: Int = 500): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.select(
      col("topic").cast("string"),
      col("key").cast("string"),
      col("value").cast("string"))
    val counts = cols.mapPartitions { it: Iterator[Row] =>
      if (!it.hasNext) Iterator.empty
      else {
        val client = new KafkaClient(host, port, clientId = "graft-sink")
        try {
          val acc = scala.collection.mutable.Map.empty[String, Long]
          it.grouped(batchSize).foreach { chunk =>
            chunk.groupBy(_.getString(0)).foreach { case (topic, rows) =>
              client.produceStrings(topic, 0,
                rows.map(r => (r.getString(1), r.getString(2))).toSeq)
              acc(topic) = acc.getOrElse(topic, 0L) + rows.size
            }
          }
          acc.iterator.map { case (t, n) => (t, n) }
        } finally {
          // client closes after the iterator drains; mapPartitions fully
          // consumes `it` above so this runs post-produce
          client.close()
        }
      }
    }.toDF("topic", "n")
    eagerCounts(spark, counts, "produced")
  }

  /** KIP-98 idempotent produce path: each executor task obtains a
    * producer id (InitProducerId) and stamps every batch with a
    * per-topic base sequence, so the BROKER deduplicates ack-lost
    * retries — exactly-once append under at-least-once sending, the
    * mechanism Connect's producer gives the reference. With
    * `retryEach = true` every batch is deliberately sent twice
    * (simulated ack timeout); the broker must return the ORIGINAL base
    * offset for the retry and append nothing.
    */
  /** NOTE: like real Kafka idempotence (KIP-98 without transactions),
    * the dedup window is per PRODUCER SESSION — it fences ack-lost
    * RETRIES within a task attempt; a full Spark task re-execution gets
    * a fresh pid and re-appends. Cross-attempt exactly-once needs a
    * data-derived fence (see RedisStreamSink.writeIdempotent) or
    * transactional produce.
    */
  def writeIdempotent(df: DataFrame, host: String, port: Int,
                      batchSize: Int = 500,
                      retryEach: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.select(
      col("topic").cast("string"),
      col("key").cast("string"),
      col("value").cast("string"))
    val counts = cols.mapPartitions { it: Iterator[Row] =>
      if (!it.hasNext) Iterator.empty
      else {
        val client = new KafkaClient(host, port, clientId = "graft-idem")
        try {
          val (pid, epoch) = client.initProducerId()
          val seqs = scala.collection.mutable.Map.empty[String, Int]
          val acc = scala.collection.mutable.Map.empty[String, Long]
          it.grouped(batchSize).foreach { chunk =>
            chunk.groupBy(_.getString(0)).foreach { case (topic, rows) =>
              val seq = seqs.getOrElse(topic, 0)
              val recs = rows.map(r => (
                if (r.getString(1) == null) null
                else r.getString(1).getBytes("UTF-8"),
                if (r.getString(2) == null) null
                else r.getString(2).getBytes("UTF-8")))
              val base = client.produce(topic, 0, recs.toSeq,
                producerId = pid, producerEpoch = epoch, baseSequence = seq)
              if (retryEach) {
                // ack-lost retry: same pid/seq — broker must dedup and
                // return the same base offset
                val again = client.produce(topic, 0, recs.toSeq,
                  producerId = pid, producerEpoch = epoch,
                  baseSequence = seq)
                require(again == base,
                  s"retry re-appended: base $base vs $again")
              }
              seqs(topic) = seq + rows.size
              acc(topic) = acc.getOrElse(topic, 0L) + rows.size
            }
          }
          acc.iterator.map { case (t, n) => (t, n) }
        } finally client.close()
      }
    }.toDF("topic", "n")
    eagerCounts(spark, counts, "produced")
  }

  /** Produce side effects must run EXACTLY ONCE per call: the
    * mapPartitions above is lazy, so the counts materialize HERE (one
    * action) and the caller gets a local frame — re-collecting it
    * cannot re-produce the records.
    */
  private def eagerCounts(spark: org.apache.spark.sql.SparkSession,
                          counts: DataFrame, alias: String): DataFrame = {
    import spark.implicits._
    counts.groupBy("topic").agg(sum("n").as(alias))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("topic", alias)
  }

  /** Read every record of every topic back (driver-side verification
    * read — bounded by what the verifying query needs, not a data path).
    */
  def readBack(spark: org.apache.spark.sql.SparkSession, host: String,
               port: Int): DataFrame = {
    import spark.implicits._
    val client = new KafkaClient(host, port, clientId = "graft-verify")
    try {
      val rows = client.listTopics().flatMap { topic =>
        client.fetchAll(topic, 0).map { r =>
          (topic, r.offset,
            if (r.key == null) null else new String(r.key, "UTF-8"),
            if (r.value == null) null else new String(r.value, "UTF-8"))
        }
      }
      rows.toDF("topic", "offset", "key", "value")
    } finally client.close()
  }
}
