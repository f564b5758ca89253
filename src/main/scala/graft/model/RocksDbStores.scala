package graft.model

import java.nio.charset.StandardCharsets.UTF_8
import org.rocksdb.{Options, RocksDB, RocksIterator}

/** K7 RocksDB storage backend (reference
  * `debezium-storage-rocksdb/.../RocksDbTableMappingStorage.java:53`):
  * disk-backed key-value storage for state that can exceed memory. The
  * reference uses RocksDB for its spillable table-mapping cache; here the
  * same embedded store (rocksdbjni ships with Spark for the streaming
  * state store) backs the two K7 artifacts — offsets and the schema
  * history — giving a log-structured alternative to the file store whose
  * write cost is O(1) per set instead of a full-file rewrite.
  *
  * Reference pattern kept: `RocksDB.loadLibrary()` once, `Options`
  * with create-if-missing, byte[] UTF-8 keys/values, iterator scans
  * (`RocksDbTableMappingStorage.configureStorage/getAllKeys`).
  */
object RocksDbStore {
  RocksDB.loadLibrary()

  private[model] def open(dir: String): RocksDB = {
    val opts = new Options().setCreateIfMissing(true)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    RocksDB.open(opts, dir)
  }
}

/** RocksDB-backed [[OffsetBackingStore]]: each `set` is one durable put —
  * the LSM absorbs high-frequency offset flushes that would thrash the
  * rewrite-everything file store.
  */
final class RocksDbOffsetBackingStore(dir: String)
  extends OffsetBackingStore with AutoCloseable {

  private val db = RocksDbStore.open(dir)

  override def get(key: String): Option[String] =
    Option(db.get(key.getBytes(UTF_8))).map(new String(_, UTF_8))

  override def set(key: String, value: String): Unit =
    db.put(key.getBytes(UTF_8), value.getBytes(UTF_8))

  override def snapshot: Map[String, String] = {
    val it: RocksIterator = db.newIterator()
    try {
      val b = Map.newBuilder[String, String]
      it.seekToFirst()
      while (it.isValid) {
        b += new String(it.key(), UTF_8) -> new String(it.value(), UTF_8)
        it.next()
      }
      b.result()
    } finally it.close()
  }

  override def close(): Unit = db.close()
}

/** RocksDB-backed [[HistoryStorage]]: append-only log under zero-padded
  * sequence keys so RocksDB's key order IS the record order; the next
  * sequence is recovered from the last key on open (restart path).
  */
final class RocksDbHistoryStorage(dir: String)
  extends HistoryStorage with AutoCloseable {

  private val db = RocksDbStore.open(dir)
  private var seq: Long = {
    val it = db.newIterator()
    try {
      it.seekToLast()
      if (it.isValid) new String(it.key(), UTF_8).toLong else 0L
    } finally it.close()
  }

  override def append(line: String): Unit = synchronized {
    seq += 1
    db.put(f"$seq%020d".getBytes(UTF_8), line.getBytes(UTF_8))
  }

  override def readAll(): Seq[String] = {
    val it = db.newIterator()
    try {
      val b = Seq.newBuilder[String]
      it.seekToFirst()
      while (it.isValid) {
        b += new String(it.value(), UTF_8)
        it.next()
      }
      b.result()
    } finally it.close()
  }

  override def close(): Unit = db.close()
}
