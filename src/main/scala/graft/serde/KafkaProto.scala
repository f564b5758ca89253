package graft.serde

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C

/** Kafka wire-protocol primitives + the record-batch v2 (magic 2) codec,
  * implemented from the published protocol guide
  * (kafka.apache.org/protocol and the KIP-98 record format description).
  * The reference ships Kafka-backed storage and sinks through the Kafka
  * client jars (`debezium-storage-kafka/.../KafkaOffsetBackingStore` via
  * Kafka Connect, `debezium-storage-kafka/src/main/java/io/debezium/
  * storage/kafka/history/KafkaSchemaHistory.java`); those jars are
  * env-blocked here, so the byte layer is implemented directly — the
  * bytes on the socket are the real protocol.
  *
  * Everything is big-endian (network order). Non-flexible (pre-tagged-
  * field) API versions are used throughout, so strings are int16-length
  * UTF-8, bytes are int32-length, arrays are int32-count; records inside
  * a batch use zigzag varints exactly like the broker's.
  */
object KafkaProto {

  // ---- primitive writers over a growable buffer ----

  final class Writer(initial: Int = 256) {
    private var buf = new Array[Byte](initial)
    private var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, pos + n))
    def int8(v: Int): this.type = { ensure(1); buf(pos) = v.toByte; pos += 1; this }
    def int16(v: Int): this.type = {
      ensure(2); buf(pos) = (v >> 8).toByte; buf(pos + 1) = v.toByte; pos += 2; this
    }
    def int32(v: Int): this.type = {
      ensure(4)
      buf(pos) = (v >> 24).toByte; buf(pos + 1) = (v >> 16).toByte
      buf(pos + 2) = (v >> 8).toByte; buf(pos + 3) = v.toByte
      pos += 4; this
    }
    def int64(v: Long): this.type = { int32((v >> 32).toInt); int32(v.toInt); this }
    def raw(b: Array[Byte]): this.type = {
      ensure(b.length); System.arraycopy(b, 0, buf, pos, b.length)
      pos += b.length; this
    }
    def string(s: String): this.type = {
      val b = s.getBytes(StandardCharsets.UTF_8); int16(b.length); raw(b)
    }
    def nullableString(s: String): this.type =
      if (s == null) int16(-1)
      else string(s)
    def bytes(b: Array[Byte]): this.type =
      if (b == null) int32(-1) else { int32(b.length); raw(b) }
    /** Zigzag varint (record-internal fields). */
    def varint(v: Int): this.type = varlongRaw(((v << 1) ^ (v >> 31)).toLong & 0xffffffffL)
    def varlong(v: Long): this.type = varlongRaw((v << 1) ^ (v >> 63))
    private def varlongRaw(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7fL) != 0) { int8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      int8(v.toInt); this
    }
    def size: Int = pos
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  }

  // ---- primitive readers ----

  final class Reader(b: Array[Byte], var pos: Int = 0) {
    def int8(): Int = { val v = b(pos); pos += 1; v.toInt }
    def int16(): Int = {
      val v = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff); pos += 2; v.toShort.toInt
    }
    def int32(): Int = {
      val v = ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
        ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      pos += 4; v
    }
    def int64(): Long = ((int32().toLong & 0xffffffffL) << 32) | (int32().toLong & 0xffffffffL)
    def raw(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
    def string(): String = new String(raw(int16()), StandardCharsets.UTF_8)
    def nullableString(): String = {
      val n = int16()
      if (n < 0) null else new String(raw(n), StandardCharsets.UTF_8)
    }
    def bytes(): Array[Byte] = {
      val n = int32()
      if (n < 0) null else raw(n)
    }
    def varint(): Int = { val v = varlongUn(); ((v >>> 1) ^ -(v & 1)).toInt }
    def varlong(): Long = { val v = varlongUn(); (v >>> 1) ^ -(v & 1) }
    private def varlongUn(): Long = {
      var v = 0L; var shift = 0; var cont = true
      while (cont) {
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift; shift += 7; cont = (x & 0x80) != 0
      }
      v
    }
    def remaining: Int = b.length - pos
  }

  // ---- record batch v2 ----

  /** One record inside a batch (headers omitted — the engine never sets
    * them and the codec writes an empty header array).
    */
  final case class Record(offset: Long, timestamp: Long,
                          key: Array[Byte], value: Array[Byte])

  /** Encode records (offsets must be contiguous from `baseOffset`) as one
    * magic-2 batch: CRC32C over attributes..end, zigzag-varint record
    * bodies, no compression (attributes=0).
    */
  def encodeBatch(baseOffset: Long, records: Seq[Record],
                  producerId: Long = -1L, producerEpoch: Short = -1,
                  baseSequence: Int = -1): Array[Byte] = {
    require(records.nonEmpty, "empty batch")
    val baseTs = records.map(_.timestamp).min
    val maxTs = records.map(_.timestamp).max
    val body = new Writer(256)
    body.int16(0)                                   // attributes
    body.int32((records.last.offset - baseOffset).toInt) // lastOffsetDelta
    body.int64(baseTs)
    body.int64(maxTs)
    body.int64(producerId)
    body.int16(producerEpoch.toInt)
    body.int32(baseSequence)
    body.int32(records.size)
    records.foreach { r =>
      val rec = new Writer(64)
      rec.int8(0)                                   // record attributes
      rec.varlong(r.timestamp - baseTs)
      rec.varint((r.offset - baseOffset).toInt)
      if (r.key == null) rec.varint(-1) else { rec.varint(r.key.length); rec.raw(r.key) }
      if (r.value == null) rec.varint(-1) else { rec.varint(r.value.length); rec.raw(r.value) }
      rec.varint(0)                                 // headers
      val rb = rec.result()
      body.varint(rb.length)
      body.raw(rb)
    }
    val bodyBytes = body.result()
    val crc = new CRC32C
    crc.update(bodyBytes)

    val out = new Writer(61 + bodyBytes.length)
    out.int64(baseOffset)
    out.int32(4 + 1 + 4 + bodyBytes.length)         // batchLength: epoch+magic+crc+body
    out.int32(-1)                                   // partitionLeaderEpoch
    out.int8(2)                                     // magic
    out.int32(crc.getValue.toInt)
    out.raw(bodyBytes)
    out.result()
  }

  /** (producerId, producerEpoch, baseSequence) of the FIRST batch in a
    * record set — the produce path sends one batch per partition, and
    * the broker's idempotence bookkeeping reads exactly these fields.
    */
  def batchProducerMeta(data: Array[Byte]): (Long, Short, Int) = {
    val r = new Reader(data)
    r.int64(); r.int32(); r.int32()                 // baseOffset/len/leaderEpoch
    require(r.int8() == 2, "unsupported record-batch magic")
    r.int32()                                       // crc
    r.int16()                                       // attributes
    r.int32()                                       // lastOffsetDelta
    r.int64(); r.int64()                            // timestamps
    val pid = r.int64()
    val epoch = r.int16().toShort
    val seq = r.int32()
    (pid, epoch, seq)
  }

  /** Decode every batch in a record set (a fetch can return several
    * concatenated batches), verifying magic and CRC32C per batch.
    */
  def decodeBatches(data: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    val r = new Reader(data)
    while (r.remaining >= 12) {
      val baseOffset = r.int64()
      val batchLength = r.int32()
      if (r.remaining < batchLength) {
        // partial trailing batch (broker hit the fetch byte cap) — stop
        r.pos = data.length
      } else {
        val end = r.pos + batchLength
        r.int32()                                   // partitionLeaderEpoch
        val magic = r.int8()
        require(magic == 2, s"unsupported record-batch magic $magic")
        val crcStored = r.int32()
        val crc = new CRC32C
        crc.update(data, r.pos, end - r.pos)
        require(crc.getValue.toInt == crcStored,
          s"record batch CRC mismatch at offset $baseOffset")
        r.int16()                                   // attributes (no compression)
        r.int32()                                   // lastOffsetDelta
        val baseTs = r.int64()
        r.int64()                                   // maxTimestamp
        r.int64(); r.int16(); r.int32()             // pid / epoch / baseSeq
        val count = r.int32()
        var i = 0
        while (i < count) {
          val len = r.varint()
          val recEnd = r.pos + len
          r.int8()                                  // record attributes
          val tsDelta = r.varlong()
          val offDelta = r.varint()
          val klen = r.varint()
          val key = if (klen < 0) null else r.raw(klen)
          val vlen = r.varint()
          val value = if (vlen < 0) null else r.raw(vlen)
          val headers = r.varint()
          var h = 0
          while (h < headers) {
            r.raw(r.varint())                       // header key
            val hv = r.varint()
            if (hv >= 0) r.raw(hv)
            h += 1
          }
          require(r.pos == recEnd, s"record length mismatch: ${r.pos} vs $recEnd")
          out += Record(baseOffset + offDelta, baseTs + tsDelta, key, value)
          i += 1
        }
        require(r.pos == end, s"batch length mismatch: ${r.pos} vs $end")
      }
    }
    out.result()
  }

  // ---- request/response framing ----

  /** Build a length-prefixed request frame with header v1
    * (apiKey, apiVersion, correlationId, clientId).
    */
  def requestFrame(apiKey: Int, apiVersion: Int, correlationId: Int,
                   clientId: String, body: Writer => Unit): Array[Byte] = {
    val w = new Writer(128)
    w.int32(0) // placeholder
    w.int16(apiKey); w.int16(apiVersion); w.int32(correlationId)
    w.nullableString(clientId)
    body(w)
    val out = w.result()
    val len = out.length - 4
    out(0) = (len >> 24).toByte; out(1) = (len >> 16).toByte
    out(2) = (len >> 8).toByte; out(3) = len.toByte
    out
  }

  /** Build a length-prefixed response frame (header v0: correlationId). */
  def responseFrame(correlationId: Int, body: Writer => Unit): Array[Byte] = {
    val w = new Writer(128)
    w.int32(0)
    w.int32(correlationId)
    body(w)
    val out = w.result()
    val len = out.length - 4
    out(0) = (len >> 24).toByte; out(1) = (len >> 16).toByte
    out(2) = (len >> 8).toByte; out(3) = len.toByte
    out
  }

  // API keys used (protocol guide numbering)
  val ApiProduce = 0
  val ApiFetch = 1
  val ApiMetadata = 3
  val ApiApiVersions = 18
  val ApiInitProducerId = 22

  // error codes
  val ErrNone = 0
  val ErrUnknownTopicOrPartition = 3
  val ErrCorruptMessage = 2
  val ErrOutOfOrderSequenceNumber = 45
}
