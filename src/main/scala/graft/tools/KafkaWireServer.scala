package graft.tools

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import graft.serde.KafkaProto
import graft.serde.KafkaProto.{Reader, Record, Writer}

/** Protocol-faithful Kafka BROKER FIXTURE (loopback only — the Kafka
  * client/broker jars are env-blocked, so this stands in for a broker
  * the way the other `tools.*WireServer`s stand in for their databases).
  * Speaks the published wire protocol (kafka.apache.org/protocol):
  * int32-framed requests with header v1, ApiVersions v0, Metadata v1,
  * Produce v3 and Fetch v4 with magic-2 record batches. Produce payloads
  * are genuinely decoded — CRC32C verified, offsets assigned per
  * partition, records stored individually — and Fetch re-encodes stored
  * records into fresh batches from the requested offset, so a client
  * talking to this server exercises both codec directions against an
  * independent implementation of the log semantics (offset assignment,
  * high watermark, out-of-range handling).
  */
object KafkaWireServer {

  /** One partition's log: records with broker-assigned offsets. */
  private final class Log {
    val records = new ArrayBuffer[Record]
    def highWatermark: Long = records.size.toLong
  }

  /** Broker state + the observations specs assert on. */
  final class Broker {
    private[KafkaWireServer] val logs = TrieMap.empty[(String, Int), Log]
    val produceRequests = new AtomicInteger(0)
    val fetchRequests = new AtomicInteger(0)
    val batchesVerified = new AtomicInteger(0)
    val duplicatesDropped = new AtomicInteger(0)
    @volatile var apiVersionsSeen = false
    @volatile private[KafkaWireServer] var recordsPerFetch = 500
    /** next producer id handed out by InitProducerId */
    private[KafkaWireServer] val nextPid = new java.util.concurrent.atomic.AtomicLong(1000L)
    /** (topic, partition, pid) -> (lastBaseSeq, lastCount, lastBaseOffset):
      * the KIP-98 idempotence window (depth-1, like a real broker's most
      * recent cached batch — enough to dedup an ack-lost retry).
      */
    private[KafkaWireServer] val producerSeqs =
      TrieMap.empty[(String, Int, Long), (Int, Int, Long)]

    private[KafkaWireServer] def log(topic: String, partition: Int): Log =
      logs.getOrElseUpdate((topic, partition), new Log)

    /** Topics that exist (have received at least one produce). */
    def topics: Set[String] = logs.keySet.map(_._1).toSet

    def recordCount(topic: String, partition: Int = 0): Int =
      logs.get((topic, partition)).map(_.records.size).getOrElse(0)
  }

  /** Records returned per fetch response batch — capped so clients must
    * loop to the high watermark like they would against a byte-capped
    * real broker (specs shrink it to force multi-batch reads on tiny
    * logs).
    */
  def serve(recordsPerFetch: Int = 500): (Int, Broker, Thread) = {
    val broker = new Broker
    broker.recordsPerFetch = recordsPerFetch
    val server = new ServerSocket(0, 16,
      java.net.InetAddress.getLoopbackAddress)
    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val t = new Thread(() => handle(sock, broker))
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: java.io.IOException => () } // closed
    }, "kafka-fixture-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    (server.getLocalPort, broker, acceptor)
  }

  private def handle(sock: Socket, broker: Broker): Unit = {
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
          val r = new Reader(frame)
          val apiKey = r.int16()
          val apiVersion = r.int16()
          val correlationId = r.int32()
          r.nullableString() // clientId
          val resp = apiKey match {
            case KafkaProto.ApiApiVersions => apiVersions(correlationId, broker)
            case KafkaProto.ApiMetadata => metadata(r, correlationId, apiVersion, broker)
            case KafkaProto.ApiProduce => produce(r, correlationId, apiVersion, broker)
            case KafkaProto.ApiFetch => fetch(r, correlationId, apiVersion, broker)
            case KafkaProto.ApiInitProducerId =>
              initProducerId(r, correlationId, broker)
            case other =>
              throw new IllegalStateException(s"unsupported api key $other")
          }
          out.write(resp); out.flush()
        }
      }
    } catch {
      case _: java.io.IOException => ()
    } finally sock.close()
  }

  private def apiVersions(correlationId: Int, broker: Broker): Array[Byte] = {
    broker.apiVersionsSeen = true
    KafkaProto.responseFrame(correlationId, { w =>
      w.int16(0) // error_code
      val apis = Seq(
        (KafkaProto.ApiProduce, 3, 3),
        (KafkaProto.ApiFetch, 4, 4),
        (KafkaProto.ApiMetadata, 0, 1),
        (KafkaProto.ApiApiVersions, 0, 0),
        (KafkaProto.ApiInitProducerId, 0, 0))
      w.int32(apis.size)
      apis.foreach { case (k, lo, hi) => w.int16(k); w.int16(lo); w.int16(hi) }
    })
  }

  private def metadata(r: Reader, correlationId: Int, version: Int,
                       broker: Broker): Array[Byte] = {
    val nTopics = r.int32()
    val asked =
      if (nTopics < 0) broker.topics.toSeq.sorted
      else (0 until nTopics).map(_ => r.string())
    KafkaProto.responseFrame(correlationId, { w =>
      w.int32(1) // brokers
      w.int32(0); w.string("127.0.0.1"); w.int32(0)
      if (version >= 1) w.nullableString(null) // rack
      if (version >= 1) w.int32(0) // controller_id
      w.int32(asked.size)
      asked.foreach { t =>
        val exists = broker.topics.contains(t)
        w.int16(if (exists) KafkaProto.ErrNone
                else KafkaProto.ErrUnknownTopicOrPartition)
        w.string(t)
        if (version >= 1) w.int8(0) // is_internal
        if (exists) {
          val parts = broker.logs.keySet.filter(_._1 == t).map(_._2).toSeq.sorted
          w.int32(parts.size)
          parts.foreach { p =>
            w.int16(0); w.int32(p); w.int32(0)
            w.int32(1); w.int32(0) // replicas
            w.int32(1); w.int32(0) // isr
          }
        } else w.int32(0)
      }
    })
  }

  /** InitProducerId v0 (KIP-98): assign a fresh (pid, epoch 0). Request
    * carries a nullable transactional id (unused here — idempotence
    * only) and a transaction timeout.
    */
  private def initProducerId(r: Reader, correlationId: Int,
                             broker: Broker): Array[Byte] = {
    r.nullableString() // transactional_id
    r.int32()          // transaction_timeout_ms
    val pid = broker.nextPid.getAndIncrement()
    KafkaProto.responseFrame(correlationId, { w =>
      w.int32(0)  // throttle_time_ms
      w.int16(0)  // error_code
      w.int64(pid)
      w.int16(0)  // producer_epoch
    })
  }

  private def produce(r: Reader, correlationId: Int, version: Int,
                      broker: Broker): Array[Byte] = {
    require(version == 3, s"fixture speaks Produce v3, got v$version")
    broker.produceRequests.incrementAndGet()
    r.nullableString() // transactional_id
    val acks = r.int16()
    require(acks == 1 || acks == -1, s"unexpected acks=$acks")
    r.int32() // timeout
    val nTopics = r.int32()
    val results = Seq.newBuilder[(String, Int, Int, Long)]
    (0 until nTopics).foreach { _ =>
      val topic = r.string()
      val nParts = r.int32()
      (0 until nParts).foreach { _ =>
        val partition = r.int32()
        val recordSet = r.bytes()
        val (err, baseOffset) =
          try {
            val recs = KafkaProto.decodeBatches(recordSet) // verifies CRC32C
            val (pid, _, baseSeq) = KafkaProto.batchProducerMeta(recordSet)
            broker.batchesVerified.incrementAndGet()
            val log = broker.log(topic, partition)
            log.synchronized {
              def append(): (Int, Long) = {
                val base = log.highWatermark
                recs.zipWithIndex.foreach { case (rec, i) =>
                  log.records += Record(base + i, rec.timestamp, rec.key, rec.value)
                }
                (KafkaProto.ErrNone, base)
              }
              if (pid < 0) append() // non-idempotent producer: plain append
              else {
                // KIP-98 idempotence: dedup an exact retry of the most
                // recent batch (return its ORIGINAL offset, append
                // nothing); reject sequence gaps; else append and advance
                val key = (topic, partition, pid)
                broker.producerSeqs.get(key) match {
                  case Some((lastSeq, lastCount, lastBase))
                      if baseSeq == lastSeq =>
                    broker.duplicatesDropped.incrementAndGet()
                    require(recs.size == lastCount,
                      "duplicate batch with different record count")
                    (KafkaProto.ErrNone, lastBase)
                  case Some((lastSeq, lastCount, _))
                      if baseSeq != lastSeq + lastCount =>
                    (KafkaProto.ErrOutOfOrderSequenceNumber, -1L)
                  case None if baseSeq != 0 =>
                    (KafkaProto.ErrOutOfOrderSequenceNumber, -1L)
                  case _ =>
                    val res = append()
                    broker.producerSeqs.put(key,
                      (baseSeq, recs.size, res._2))
                    res
                }
              }
            }
          } catch {
            case _: IllegalArgumentException | _: IllegalStateException =>
              (KafkaProto.ErrCorruptMessage, -1L)
          }
        results += ((topic, partition, err, baseOffset))
      }
    }
    val byTopic = results.result().groupBy(_._1)
    KafkaProto.responseFrame(correlationId, { w =>
      w.int32(byTopic.size)
      byTopic.toSeq.sortBy(_._1).foreach { case (topic, parts) =>
        w.string(topic)
        w.int32(parts.size)
        parts.foreach { case (_, p, err, base) =>
          w.int32(p); w.int16(err); w.int64(base)
          w.int64(-1L) // log_append_time (CREATE_TIME batches)
        }
      }
      w.int32(0) // throttle_time_ms
    })
  }

  private def fetch(r: Reader, correlationId: Int, version: Int,
                    broker: Broker): Array[Byte] = {
    require(version == 4, s"fixture speaks Fetch v4, got v$version")
    broker.fetchRequests.incrementAndGet()
    r.int32() // replica_id
    r.int32() // max_wait_time
    r.int32() // min_bytes
    r.int32() // max_bytes
    r.int8()  // isolation_level
    val nTopics = r.int32()
    val reqs = Seq.newBuilder[(String, Int, Long)]
    (0 until nTopics).foreach { _ =>
      val topic = r.string()
      val nParts = r.int32()
      (0 until nParts).foreach { _ =>
        val partition = r.int32()
        val offset = r.int64()
        r.int32() // partition_max_bytes
        reqs += ((topic, partition, offset))
      }
    }
    val byTopic = reqs.result().groupBy(_._1)
    KafkaProto.responseFrame(correlationId, { w =>
      w.int32(0) // throttle_time_ms
      w.int32(byTopic.size)
      byTopic.toSeq.sortBy(_._1).foreach { case (topic, parts) =>
        w.string(topic)
        w.int32(parts.size)
        parts.foreach { case (_, partition, offset) =>
          w.int32(partition)
          broker.logs.get((topic, partition)) match {
            case None =>
              w.int16(KafkaProto.ErrUnknownTopicOrPartition)
              w.int64(-1L); w.int64(-1L); w.int32(0); w.bytes(null)
            case Some(log) =>
              val (hw, slice) = log.synchronized {
                (log.highWatermark,
                  log.records.slice(offset.toInt,
                    offset.toInt + broker.recordsPerFetch).toSeq)
              }
              w.int16(0)
              w.int64(hw)
              w.int64(hw) // last_stable_offset
              w.int32(0)  // aborted_transactions
              if (slice.isEmpty) w.bytes(null)
              else w.bytes(KafkaProto.encodeBatch(slice.head.offset, slice))
          }
        }
      }
    })
  }

  /** Convenience for specs: all (key,value) string pairs in a log. */
  def dump(broker: Broker, topic: String, partition: Int = 0): Seq[(String, String)] =
    broker.logs.get((topic, partition)).map { log =>
      log.synchronized {
        log.records.map { r =>
          (if (r.key == null) null else new String(r.key, "UTF-8"),
            if (r.value == null) null else new String(r.value, "UTF-8"))
        }.toSeq
      }
    }.getOrElse(Nil)
}
