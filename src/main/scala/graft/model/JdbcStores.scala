package graft.model

import java.sql.{Connection, DriverManager, Timestamp}
import java.util.UUID
import java.util.concurrent.atomic.AtomicInteger

/** K7 JDBC storage backend (reference
  * `debezium-storage-jdbc/.../offset/JdbcOffsetBackingStore.java:44` and
  * `history/JdbcSchemaHistory.java:50`): offsets and schema history
  * persisted to relational tables through plain JDBC. The reference ships
  * this for any JDBC target; here it runs against embedded Derby (the one
  * JDBC engine on the classpath), but every statement is portable ANSI SQL
  * built from the same overridable templates as the reference
  * (`JdbcOffsetBackingStoreConfig.java:34-61`,
  * `JdbcSchemaHistoryConfig.java:38-67`).
  *
  * Reference semantics kept:
  *  - offset save = DELETE all + re-INSERT the full map, each row with a
  *    fresh UUID id, insert timestamp and a monotone insert seq
  *    (`JdbcOffsetBackingStore.save`);
  *  - offset load = SELECT the whole table into memory at start;
  *  - history records longer than 65000 chars split across rows sharing
  *    one UUID id with increasing `partseq`, reassembled on recovery in
  *    (record_insert_seq, partseq) order (`JdbcSchemaHistory.storeRecord`
  *    / `recoverRecords`).
  *
  * One deliberate divergence: the reference seeds `recordInsertSeq` at 0
  * on every restart, so rows written after a restart sort BEFORE older
  * rows under `ORDER BY record_insert_seq`; this impl seeds from
  * MAX(record_insert_seq) so append order survives restarts.
  */
object Jdbc {
  /** Derby 10.16 registers its embedded driver via the service loader from
    * derbytools.jar; Class.forName is the belt-and-braces load for
    * classpaths where autoloading is disabled.
    */
  def connect(url: String): Connection = {
    // keep Derby's boot log out of the working directory
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        System.getProperty("java.io.tmpdir") + "/derby.log")
    try Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    catch { case _: ClassNotFoundException => () }
    val c = DriverManager.getConnection(url)
    c.setAutoCommit(false)
    c
  }

  def tableExists(conn: Connection, table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    try rs.next() finally rs.close()
  }
}

/** JDBC-backed [[OffsetBackingStore]]. `url` e.g.
  * `jdbc:derby:/path/db;create=true`.
  */
final class JdbcOffsetBackingStore(
    url: String,
    table: String = "graft_offset_storage")
  extends OffsetBackingStore with AutoCloseable {

  private val conn = Jdbc.connect(url)
  private val m = scala.collection.concurrent.TrieMap.empty[String, String]
  private val seq = new AtomicInteger(0)

  locally {
    if (!Jdbc.tableExists(conn, table)) {
      val st = conn.createStatement()
      try st.execute(
        s"""CREATE TABLE $table (
           |  id VARCHAR(36) NOT NULL,
           |  offset_key VARCHAR(1255),
           |  offset_val VARCHAR(1255),
           |  record_insert_ts TIMESTAMP NOT NULL,
           |  record_insert_seq INTEGER NOT NULL)""".stripMargin)
      finally st.close()
      conn.commit()
    }
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT offset_key, offset_val, record_insert_seq FROM $table")
      var maxSeq = 0
      while (rs.next()) {
        m.put(rs.getString(1), rs.getString(2))
        maxSeq = math.max(maxSeq, rs.getInt(3))
      }
      rs.close()
      seq.set(maxSeq)
    } finally st.close()
    conn.commit()
  }

  override def get(key: String): Option[String] = m.get(key)

  /** Write-through: reference `save()` rewrites the whole table per flush
    * (DELETE all + INSERT each live entry).
    */
  override def set(key: String, value: String): Unit = synchronized {
    m.put(key, value)
    val del = conn.prepareStatement(s"DELETE FROM $table")
    try del.executeUpdate() finally del.close()
    val ins = conn.prepareStatement(
      s"INSERT INTO $table (id, offset_key, offset_val, record_insert_ts, " +
        "record_insert_seq) VALUES (?, ?, ?, ?, ?)")
    try m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      ins.setString(1, UUID.randomUUID().toString)
      ins.setString(2, k)
      ins.setString(3, v)
      ins.setTimestamp(4, new Timestamp(System.currentTimeMillis()))
      ins.setInt(5, seq.incrementAndGet())
      ins.executeUpdate()
    } finally ins.close()
    conn.commit()
  }

  override def snapshot: Map[String, String] = m.toMap

  override def close(): Unit = conn.close()
}

/** JDBC-backed [[HistoryStorage]]: one logical record per `append`, split
  * across ≤`chunk`-char rows sharing a UUID id (reference
  * `JdbcSchemaHistory.storeRecord` splits at 65000 — under Derby's 32672
  * VARCHAR cap the column is CLOB but the split semantics are identical).
  */
final class JdbcHistoryStorage(
    url: String,
    table: String = "graft_database_history",
    chunk: Int = 65000)
  extends HistoryStorage with AutoCloseable {

  private val conn = Jdbc.connect(url)
  private val seq = new AtomicInteger(0)

  locally {
    if (!Jdbc.tableExists(conn, table)) {
      val st = conn.createStatement()
      try st.execute(
        s"""CREATE TABLE $table (
           |  id VARCHAR(36) NOT NULL,
           |  history_data CLOB(1M),
           |  partseq INTEGER NOT NULL,
           |  record_insert_ts TIMESTAMP NOT NULL,
           |  record_insert_seq INTEGER NOT NULL)""".stripMargin)
      finally st.close()
      conn.commit()
    }
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT COALESCE(MAX(record_insert_seq), 0) FROM $table")
      rs.next()
      seq.set(rs.getInt(1))
      rs.close()
    } finally st.close()
    conn.commit()
  }

  override def append(line: String): Unit = synchronized {
    val id = UUID.randomUUID().toString
    val ts = new Timestamp(System.currentTimeMillis())
    val recordSeq = seq.incrementAndGet()
    val parts = line.grouped(chunk).toSeq
    val ins = conn.prepareStatement(
      s"INSERT INTO $table (id, history_data, partseq, record_insert_ts, " +
        "record_insert_seq) VALUES (?, ?, ?, ?, ?)")
    try parts.zipWithIndex.foreach { case (p, i) =>
      ins.setString(1, id)
      ins.setString(2, p)
      ins.setInt(3, i)
      ins.setTimestamp(4, ts)
      ins.setInt(5, recordSeq)
      ins.executeUpdate()
    } finally ins.close()
    conn.commit()
  }

  /** Recovery path: rows in (record_insert_seq, partseq) order, adjacent
    * rows with the same id concatenated back into one record (reference
    * `recoverRecords` string-builder fold).
    */
  override def readAll(): Seq[String] = synchronized {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT id, history_data FROM $table " +
          "ORDER BY record_insert_seq, partseq")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var currentId: String = null
      while (rs.next()) {
        val id = rs.getString(1)
        if (currentId != null && currentId != id && sb.nonEmpty) {
          out += sb.toString
          sb.clear()
        }
        sb.append(rs.getString(2))
        currentId = id
      }
      if (sb.nonEmpty) out += sb.toString
      rs.close()
      conn.commit()
      out.toSeq
    } finally st.close()
  }

  override def close(): Unit = conn.close()
}
