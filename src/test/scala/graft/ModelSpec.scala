package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Crdt, Envelope, SchemaHistory}
import graft.operators.SchemaEvolution._

class ModelSpec extends AnyFunSuite {

  test("schema history replays to the schema as-of any position") {
    val dir = Files.createTempDirectory("hist").toString
    val h = SchemaHistory.at(dir, "orders")
    val base = StructType(Seq(StructField("id", IntegerType),
      StructField("v", StringType)))
    h.append(100, AddColumn("extra", DoubleType))
    h.append(200, WidenColumn("id", LongType))
    h.append(300, DropColumn("v"))
    h.append(400, RenameColumn("extra", "bonus"))
    assert(h.recover(base, 50) == base)
    assert(h.recover(base, 150).fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(h.recover(base, 250)("id").dataType == LongType)
    assert(h.recover(base, 350).fieldNames.toSeq == Seq("id", "extra"))
    assert(h.recover(base).fieldNames.toSeq == Seq("id", "bonus"))
    // a fresh instance over the same file recovers identically (restart)
    assert(SchemaHistory.at(dir, "orders").recover(base) == h.recover(base))
  }

  test("K7 offset stores: file store survives restart, atomic rewrite") {
    import graft.model.{FileOffsetBackingStore, MemoryOffsetBackingStore}
    val f = Files.createTempDirectory("off").resolve("offsets.dat")
    val st = new FileOffsetBackingStore(f)
    assert(st.get("orders").isEmpty)
    st.set("orders", "1234")
    st.set("customer", "99")
    st.set("orders", "5678") // overwrite
    // restart: fresh instance over the same file
    val st2 = new FileOffsetBackingStore(f)
    assert(st2.get("orders").contains("5678"))
    assert(st2.snapshot == Map("orders" -> "5678", "customer" -> "99"))
    // no stray temp file left behind
    assert(!Files.exists(f.resolveSibling("offsets.dat.tmp")))
    val mem = new MemoryOffsetBackingStore
    mem.set("a", "1"); assert(mem.get("a").contains("1"))
  }

  test("K7 schema history runs over the in-memory backend too") {
    val h = SchemaHistory.inMemory()
    val base = StructType(Seq(StructField("id", IntegerType)))
    h.append(10, AddColumn("x", StringType))
    assert(h.recover(base).fieldNames.toSeq == Seq("id", "x"))
    assert(h.recover(base, 5) == base)
  }

  test("CRDT counters merge idempotently and commutatively") {
    import Crdt._
    val a = GCounter().increment("r1", 5).increment("r2", 2)
    val b = GCounter().increment("r1", 3).increment("r3", 7)
    assert(a.merge(b).value == 14) // max(5,3) + 2 + 7
    assert(a.merge(b) == b.merge(a))
    assert(a.merge(a).value == a.value)
    val pn = PNCounter().increment("r1", 10).decrement("r2", 4)
    assert(pn.value == 6)
    assert(pn.merge(pn).value == 6)
  }

  test("TableId parses quoting-aware 1/2/3-part names") {
    import Envelope.TableId
    assert(TableId.parse("db.sch.tbl") == TableId("db", "sch", "tbl"))
    assert(TableId.parse("sch.tbl") == TableId(null, "sch", "tbl"))
    assert(TableId.parse("tbl") == TableId(null, null, "tbl"))
    assert(TableId.parse("db.\"my.schema\".tbl") ==
      TableId("db", "my.schema", "tbl"))
    assert(TableId.parse("`a``b`.t") == TableId(null, null, "a`b.t") ||
      TableId.parse("`a``b`.t") == TableId(null, "a`b", "t"))
  }

  test("PgSnapshot: pg_current_snapshot grammar, visibility, dedup bracket") {
    import graft.sources.wire.PgSnapshot
    val s = PgSnapshot.parse("100:104:100,102")
    assert(s == PgSnapshot(100L, 104L, Set(100L, 102L)))
    // below xmin: visible; in [xmin,xmax) visible unless in-progress;
    // at/after xmax: never started yet
    assert(s.visible(99) && s.visible(101) && s.visible(103))
    assert(!s.visible(100) && !s.visible(102) && !s.visible(104))
    // empty xip (idle database), both with and without the trailing colon
    assert(PgSnapshot.parse("7:7:") == PgSnapshot(7L, 7L, Set.empty))
    assert(PgSnapshot.parse("7:7:").text == "7:7:")
    intercept[IllegalArgumentException](PgSnapshot.parse("not-a-snapshot"))
    // updateWindowState bracket: open at lo.xMin, close past
    // max(hi.xMax, lo.xMax) — lo's in-flight txids land inside even when
    // hi has not moved (the no-activity chunk is a valid point bracket)
    assert(PgSnapshot.window(PgSnapshot.parse("100:104:100,102"),
      PgSnapshot.parse("110:115:")) == (100L, 115L))
    assert(PgSnapshot.window(PgSnapshot.parse("100:104:100,102"),
      PgSnapshot.parse("100:104:100,102")) == (100L, 104L))
    assert(PgSnapshot.window(PgSnapshot.parse("7:7:"),
      PgSnapshot.parse("7:7:")) == (7L, 7L))
  }
}
