package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.operators.SchemaEvolution._

/** K7 storage backends beyond memory/file: JDBC (embedded Derby, reference
  * debezium-storage-jdbc) and RocksDB (reference debezium-storage-rocksdb).
  */
class StoreBackendsSpec extends AnyFunSuite {

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("jdbc-store")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JDBC offset store: restart recovery, delete+reinsert save") {
    val url = derbyUrl()
    val st = new JdbcOffsetBackingStore(url)
    assert(st.snapshot.isEmpty)
    st.set("a", "1")
    st.set("b", "2")
    st.set("a", "3") // overwrite: map semantics, not append
    st.close()

    val st2 = new JdbcOffsetBackingStore(url)
    assert(st2.snapshot == Map("a" -> "3", "b" -> "2"))
    assert(st2.get("a").contains("3"))
    assert(st2.get("zz").isEmpty)
    // the table holds exactly the live map (reference save() rewrites)
    val conn = Jdbc.connect(url)
    val rs = conn.createStatement()
      .executeQuery("SELECT COUNT(*) FROM graft_offset_storage")
    rs.next()
    assert(rs.getInt(1) == 2)
    conn.commit()
    conn.close()
    st2.close()
  }

  test("JDBC history storage: 65000-char split + ordered reassembly") {
    val url = derbyUrl()
    val hs = new JdbcHistoryStorage(url)
    val big = "x" * 130001 // 3 parts
    hs.append("one")
    hs.append(big)
    hs.append("three")
    assert(hs.readAll() == Seq("one", big, "three"))
    hs.close()

    // restart: recovered records identical, appends keep ordering
    val hs2 = new JdbcHistoryStorage(url)
    hs2.append("four")
    assert(hs2.readAll() == Seq("one", big, "three", "four"))
    hs2.close()
  }

  test("SchemaHistory replays identically over the JDBC channel") {
    val url = derbyUrl()
    val base = StructType(Seq(StructField("id", IntegerType),
      StructField("v", StringType)))
    val jh = new JdbcHistoryStorage(url)
    val h = new SchemaHistory(jh)
    h.append(100, AddColumn("extra", DoubleType))
    h.append(200, DropColumn("v"))
    assert(h.recover(base, 150).fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(h.recover(base).fieldNames.toSeq == Seq("id", "extra"))
    jh.close()
    val jh2 = new JdbcHistoryStorage(url)
    assert(new SchemaHistory(jh2).recover(base).fieldNames.toSeq ==
      Seq("id", "extra"))
    jh2.close()
  }

  test("RocksDB offset store: durable puts, restart recovery") {
    val dir = Files.createTempDirectory("rocks-store").toString + "/offsets"
    val st = new RocksDbOffsetBackingStore(dir)
    st.set("a", "1")
    st.set("a", "9")
    st.set("b", "2")
    assert(st.snapshot == Map("a" -> "9", "b" -> "2"))
    st.close()
    val st2 = new RocksDbOffsetBackingStore(dir)
    assert(st2.get("a").contains("9"))
    assert(st2.snapshot == Map("a" -> "9", "b" -> "2"))
    st2.close()
  }

  test("RocksDB history storage: append order survives restart") {
    val dir = Files.createTempDirectory("rocks-hist").toString + "/history"
    val hs = new RocksDbHistoryStorage(dir)
    (1 to 25).foreach(i => hs.append(s"rec_$i")) // crosses 2-digit seq
    hs.close()
    val hs2 = new RocksDbHistoryStorage(dir)
    hs2.append("rec_26")
    assert(hs2.readAll() == (1 to 26).map(i => s"rec_$i"))
    hs2.close()
  }
}
