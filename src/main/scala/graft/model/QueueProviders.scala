package graft.model

import java.nio.MappedByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** Pluggable change-event queue providers (reference
  * `debezium-connector-common/.../connector/base/QueueProvider.java`
  * SPI with the Chronicle-Queue-backed spill implementations in
  * `debezium-storage/debezium-storage-chronicle-queue/.../
  * ChronicleQueueProvider.java` / `HybridChronicleQueueProvider.java`):
  * the admission queue between the source reader and the dispatcher can
  * spill to memory-mapped files on disk so a slow sink never balloons
  * the heap. The Chronicle library is env-blocked; the SEMANTICS are
  * what the module contributes — strict FIFO through a spill boundary,
  * mmap-backed segment files with independent write/read cursors,
  * cycle-file roll-over — so those are implemented directly on
  * `FileChannel.map`.
  */
trait QueueProvider[T] extends AutoCloseable {
  def name: String
  def enqueue(event: T): Unit
  def poll(): Option[T]
  def size: Int
}

/** Pure in-memory provider (the default `ChangeEventQueue` behavior). */
final class MemoryQueueProvider[T] extends QueueProvider[T] {
  private val q = new java.util.ArrayDeque[T]()
  override def name: String = "memory"
  override def enqueue(event: T): Unit = q.addLast(event)
  override def poll(): Option[T] = Option(q.pollFirst())
  override def size: Int = q.size
  override def close(): Unit = q.clear()
}

/** Memory-mapped spill queue over string-serialized events (reference
  * `ChronicleQueueProvider` + `ChronicleQueueHelper`): fixed-size
  * mmap'd segment files rolled like chronicle's cycle files, 4-byte
  * length-prefixed UTF-8 records, a `-1` roll marker terminating each
  * full segment, writer and reader on independent (segment, offset)
  * cursors. A segment the reader has fully drained is deleted
  * immediately, so steady-state disk usage tracks queue DEPTH, not
  * total throughput. With `dir = null` a temp directory is created and
  * removed on close (the reference's temporary-path behavior).
  */
final class SpillQueueProvider(dir: Path, segmentBytes: Int = 1 << 20)
  extends QueueProvider[String] {

  private val temporary = dir == null
  private val base: Path =
    if (temporary) Files.createTempDirectory("graft-cq-") else {
      Files.createDirectories(dir); dir
    }

  private var writeSeg = 0
  private var writeBuf = map(0)
  private var readSeg = 0
  private var readBuf = { val b = writeBuf.duplicate(); b.position(0); b }
  private var count = 0

  private def segPath(n: Int): Path = base.resolve(f"cycle-$n%06d.cq")

  private def map(n: Int): MappedByteBuffer = {
    val ch = FileChannel.open(segPath(n), StandardOpenOption.CREATE,
      StandardOpenOption.READ, StandardOpenOption.WRITE)
    try ch.map(FileChannel.MapMode.READ_WRITE, 0, segmentBytes.toLong)
    finally ch.close()
  }

  override def name: String = "spill"

  override def enqueue(event: String): Unit = {
    val bytes = event.getBytes(StandardCharsets.UTF_8)
    require(bytes.length + 8 <= segmentBytes,
      s"record of ${bytes.length} bytes exceeds the $segmentBytes-byte segment")
    if (writeBuf.position() + 4 + bytes.length + 4 > segmentBytes) {
      writeBuf.putInt(-1) // roll marker: rest of this segment is dead
      writeSeg += 1
      writeBuf = map(writeSeg)
    }
    writeBuf.putInt(bytes.length)
    writeBuf.put(bytes)
    count += 1
  }

  override def poll(): Option[String] =
    if (count == 0) None
    else {
      if (readBuf.getInt(readBuf.position()) == -1) {
        // writer rolled past this segment; reader follows and reclaims
        Files.deleteIfExists(segPath(readSeg))
        readSeg += 1
        readBuf =
          if (readSeg == writeSeg) {
            // share the writer's live mapping (positions independent)
            val b = writeBuf.duplicate(); b.position(0); b
          } else map(readSeg) // sealed segment: immutable once rolled
      }
      val len = readBuf.getInt()
      val bytes = new Array[Byte](len)
      readBuf.get(bytes)
      count -= 1
      Some(new String(bytes, StandardCharsets.UTF_8))
    }

  override def size: Int = count

  /** Segment files currently on disk (observability for specs). */
  def segmentsOnDisk: Int = {
    val files = Files.list(base)
    try files.filter(_.getFileName.toString.endsWith(".cq")).count().toInt
    finally files.close()
  }

  override def close(): Unit = {
    if (temporary) {
      val files = Files.list(base)
      try files.forEach(p => Files.deleteIfExists(p))
      finally files.close()
      Files.deleteIfExists(base)
    }
  }
}

/** Hybrid provider (reference `HybridChronicleQueueProvider`): a
  * bounded in-memory deque absorbs normal traffic; when full, the
  * OLDEST event is evicted to the spill queue before the new one is
  * admitted, and polling drains the spill queue first — strict FIFO
  * across the spill boundary, zero disk I/O while traffic fits in
  * memory.
  */
final class HybridQueueProvider(maxMemory: Int, dir: Path = null,
                                segmentBytes: Int = 1 << 20)
  extends QueueProvider[String] {

  require(maxMemory > 0, "maxMemory must be positive")
  private val memory = new java.util.ArrayDeque[String](maxMemory)
  private val spill = new SpillQueueProvider(dir, segmentBytes)
  private var everSpilled = 0

  override def name: String = "hybrid_spill"

  override def enqueue(event: String): Unit = {
    if (memory.size >= maxMemory) {
      spill.enqueue(memory.pollFirst())
      everSpilled += 1
    }
    memory.addLast(event)
  }

  override def poll(): Option[String] =
    spill.poll().orElse(Option(memory.pollFirst()))

  override def size: Int = memory.size + spill.size

  /** How many events ever crossed the spill boundary (observability). */
  def spillCount: Int = everSpilled

  override def close(): Unit = {
    memory.clear()
    spill.close()
  }
}
