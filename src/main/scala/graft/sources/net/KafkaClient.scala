package graft.sources.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import graft.serde.KafkaProto
import graft.serde.KafkaProto.{Reader, Record}

/** Minimal Kafka client over TCP — the live transport behind the
  * Kafka-backed K7 stores and the K1 topic sink (reference reaches the
  * broker through the Kafka client jars: `debezium-storage-kafka/src/
  * main/java/io/debezium/storage/kafka/history/KafkaSchemaHistory.java`,
  * Connect's `KafkaOffsetBackingStore`; those jars are env-blocked, so
  * the published wire protocol is spoken directly). Framing is
  * int32-length + header v1; APIs: ApiVersions v0 (handshake +
  * supported-range check), Metadata v1, Produce v3 (acks=-1, one
  * magic-2 batch per call), Fetch v4 looped to the high watermark.
  *
  * Exercised against `graft.tools.KafkaWireServer` (zero egress); the
  * bytes on the socket are the real protocol either way.
  */
final class KafkaClient(host: String, port: Int, clientId: String = "graft") {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val correlations = new AtomicInteger(1)

  handshake()

  private def roundTrip(apiKey: Int, apiVersion: Int,
                        body: KafkaProto.Writer => Unit): Reader = {
    val corr = correlations.getAndIncrement()
    out.write(KafkaProto.requestFrame(apiKey, apiVersion, corr, clientId, body))
    out.flush()
    val len = in.readInt()
    val frame = new Array[Byte](len)
    in.readFully(frame)
    val r = new Reader(frame)
    val respCorr = r.int32()
    require(respCorr == corr, s"correlation mismatch: $respCorr vs $corr")
    r
  }

  /** ApiVersions v0: verify the broker supports the exact versions this
    * client speaks (the real client's version-negotiation step).
    */
  private def handshake(): Unit = {
    val r = roundTrip(KafkaProto.ApiApiVersions, 0, _ => ())
    require(r.int16() == 0, "ApiVersions returned an error")
    val ranges = (0 until r.int32()).map { _ =>
      (r.int16(), r.int16(), r.int16())
    }.map { case (k, lo, hi) => k -> (lo, hi) }.toMap
    def supports(key: Int, v: Int): Boolean =
      ranges.get(key).exists { case (lo, hi) => v >= lo && v <= hi }
    require(supports(KafkaProto.ApiProduce, 3), "broker lacks Produce v3")
    require(supports(KafkaProto.ApiFetch, 4), "broker lacks Fetch v4")
    require(supports(KafkaProto.ApiMetadata, 1), "broker lacks Metadata v1")
  }

  /** InitProducerId v0 (KIP-98): obtain a (producerId, epoch) for
    * idempotent produces.
    */
  def initProducerId(): (Long, Short) = {
    val r = roundTrip(KafkaProto.ApiInitProducerId, 0, { w =>
      w.nullableString(null) // transactional_id (idempotence only)
      w.int32(60000)         // transaction_timeout_ms
    })
    r.int32() // throttle_time_ms
    require(r.int16() == 0, "InitProducerId returned an error")
    val pid = r.int64()
    val epoch = r.int16().toShort
    (pid, epoch)
  }

  /** Topic names known to the broker (Metadata v1 with a null topic
    * array = all topics).
    */
  def listTopics(): Seq[String] = {
    val r = roundTrip(KafkaProto.ApiMetadata, 1, _.int32(-1))
    val nBrokers = r.int32()
    (0 until nBrokers).foreach { _ =>
      r.int32(); r.string(); r.int32(); r.nullableString()
    }
    r.int32() // controller_id
    (0 until r.int32()).map { _ =>
      r.int16() // error
      val name = r.string()
      r.int8() // is_internal
      (0 until r.int32()).foreach { _ =>
        r.int16(); r.int32(); r.int32()
        (0 until r.int32()).foreach(_ => r.int32())
        (0 until r.int32()).foreach(_ => r.int32())
      }
      name
    }
  }

  /** Produce one batch; returns the broker-assigned base offset. With a
    * non-negative `producerId`, the batch carries (pid, epoch, baseSeq)
    * and the broker applies KIP-98 idempotence: an exact retry of the
    * last batch is deduplicated server-side (original offset returned),
    * a sequence gap is rejected with OUT_OF_ORDER_SEQUENCE_NUMBER.
    */
  def produce(topic: String, partition: Int,
              records: Seq[(Array[Byte], Array[Byte])],
              timestamp: Long = 0L,
              producerId: Long = -1L, producerEpoch: Short = -1,
              baseSequence: Int = -1): Long = {
    val batch = KafkaProto.encodeBatch(0L,
      records.zipWithIndex.map { case ((k, v), i) =>
        Record(i.toLong, timestamp, k, v)
      }, producerId, producerEpoch, baseSequence)
    val r = roundTrip(KafkaProto.ApiProduce, 3, { w =>
      w.nullableString(null) // transactional_id
      w.int16(-1)            // acks=all
      w.int32(30000)         // timeout
      w.int32(1); w.string(topic)
      w.int32(1); w.int32(partition); w.bytes(batch)
    })
    val nTopics = r.int32()
    require(nTopics == 1, s"produce response topics=$nTopics")
    r.string()
    val nParts = r.int32()
    require(nParts == 1, s"produce response partitions=$nParts")
    r.int32() // partition
    val err = r.int16()
    require(err == 0, s"produce failed with error code $err")
    val baseOffset = r.int64()
    r.int64() // log_append_time
    r.int32() // throttle_time_ms
    baseOffset
  }

  def produceStrings(topic: String, partition: Int,
                     records: Seq[(String, String)]): Long =
    produce(topic, partition, records.map { case (k, v) =>
      (if (k == null) null else k.getBytes(StandardCharsets.UTF_8),
        if (v == null) null else v.getBytes(StandardCharsets.UTF_8))
    })

  /** One Fetch v4 round trip: (highWatermark, decoded records). */
  def fetchOnce(topic: String, partition: Int, offset: Long): (Long, Seq[Record]) = {
    val r = roundTrip(KafkaProto.ApiFetch, 4, { w =>
      w.int32(-1)      // replica_id
      w.int32(100)     // max_wait_time
      w.int32(1)       // min_bytes
      w.int32(1 << 20) // max_bytes
      w.int8(0)        // isolation_level
      w.int32(1); w.string(topic)
      w.int32(1); w.int32(partition); w.int64(offset); w.int32(1 << 20)
    })
    r.int32() // throttle_time_ms
    require(r.int32() == 1, "fetch response topics != 1")
    r.string()
    require(r.int32() == 1, "fetch response partitions != 1")
    r.int32() // partition
    val err = r.int16()
    val hw = r.int64()
    r.int64() // last_stable_offset
    (0 until r.int32()).foreach(_ => { r.int64(); r.int64() }) // aborted txs
    val recordSet = r.bytes()
    require(err == 0 || err == KafkaProto.ErrUnknownTopicOrPartition,
      s"fetch failed with error code $err")
    if (err != 0 || recordSet == null) (math.max(hw, 0L), Nil)
    else (hw, KafkaProto.decodeBatches(recordSet))
  }

  /** Read the whole partition from `fromOffset` to the current high
    * watermark (the store-recovery read path).
    */
  def fetchAll(topic: String, partition: Int, fromOffset: Long = 0L): Seq[Record] = {
    val acc = Seq.newBuilder[Record]
    var offset = fromOffset
    var done = false
    while (!done) {
      val (hw, recs) = fetchOnce(topic, partition, offset)
      acc ++= recs.filter(_.offset >= offset)
      offset = if (recs.nonEmpty) recs.map(_.offset).max + 1 else offset
      done = recs.isEmpty || offset >= hw
    }
    acc.result()
  }

  def close(): Unit = socket.close()
}
