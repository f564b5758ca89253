package graft.model

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** K7 pluggable storage backends (SURVEY §2.2 K7; reference
  * `debezium-storage-*` modules + Kafka Connect's offset stores used by
  * the embedded engine — `FileOffsetBackingStore` /
  * `MemoryOffsetBackingStore`): the two durable artifacts the engine owns
  * OUTSIDE Spark's checkpoint are stream offsets and the schema history;
  * both get a small SPI so deployments can swap the backend without
  * touching pipeline code. Spark's own checkpoint remains the default for
  * streaming queries — these stores serve the embedded-engine-style
  * API surface and the schema-history log.
  */
trait OffsetBackingStore {
  def get(key: String): Option[String]
  def set(key: String, value: String): Unit
  def snapshot: Map[String, String]
}

/** In-memory store (reference `MemoryOffsetBackingStore`) — tests and
  * fire-and-forget runs.
  */
final class MemoryOffsetBackingStore extends OffsetBackingStore {
  private val m = scala.collection.concurrent.TrieMap.empty[String, String]
  override def get(key: String): Option[String] = m.get(key)
  override def set(key: String, value: String): Unit = m.put(key, value)
  override def snapshot: Map[String, String] = m.toMap
}

/** File-backed store (reference `FileOffsetBackingStore`): loads existing
  * state at construction (the restart path), every `set` rewrites the
  * file atomically (temp + ATOMIC_MOVE) so a crash never leaves a torn
  * offset file. Line format: `key\tvalue`.
  */
final class FileOffsetBackingStore(path: Path) extends OffsetBackingStore {
  private val m = scala.collection.concurrent.TrieMap.empty[String, String]
  if (Files.exists(path))
    Files.readAllLines(path).asScala.filter(_.nonEmpty).foreach { l =>
      val Array(k, v) = l.split("\t", 2)
      m.put(k, v)
    }

  override def get(key: String): Option[String] = m.get(key)

  override def set(key: String, value: String): Unit = synchronized {
    m.put(key, value)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp,
      m.toSeq.sortBy(_._1).map { case (k, v) => s"$k\t$v" }
        .mkString("", "\n", "\n"))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def snapshot: Map[String, String] = m.toMap
}

/** Append-only record storage for the schema history (reference
  * `SchemaHistory.java` storage channel).
  */
trait HistoryStorage {
  def append(line: String): Unit
  def readAll(): Seq[String]
}

final class FileHistoryStorage(path: Path) extends HistoryStorage {
  override def append(line: String): Unit =
    Files.write(path, (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  override def readAll(): Seq[String] =
    if (!Files.exists(path)) Seq.empty
    else Files.readAllLines(path).asScala.toSeq.filter(_.nonEmpty)
}

final class MemoryHistoryStorage extends HistoryStorage {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  override def append(line: String): Unit = synchronized { buf += line }
  override def readAll(): Seq[String] = synchronized(buf.toSeq)
}
