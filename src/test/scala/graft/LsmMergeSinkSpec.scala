package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Materialize
import graft.sources.{ChangeFeedGen, Tables}
import graft.streaming.LsmMergeSink

class LsmMergeSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  test("DSv2 writeTo drives the sink family: create()=snapshot epoch, " +
      "append()=next epoch, explicit-epoch replay is a no-op, DROP works") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val root = Files.createTempDirectory("wt-cat").toString
    spark.conf.set("spark.sql.catalog.graft_t",
      classOf[graft.sinks.v2.GraftSinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_t.root", root)
    val tbl = "orders_" + java.util.UUID.randomUUID().toString.take(8)
    feed.filter(col("op") === "r").writeTo(s"graft_t.lsm.$tbl")
      .tableProperty("buckets", "8").tableProperty("compactEvery", "100")
      .create()
    feed.filter(col("op") =!= "r").writeTo(s"graft_t.lsm.$tbl")
      .option("epoch", "1").append()
    val sink = new LsmMergeSink(s"$root/lsm/$tbl", buckets = 8,
      compactEvery = 100)
    assert(sink.committedEpoch.contains(1L))
    val before = canon(sink.view(spark))
    // replaying the committed epoch through the catalog path must be
    // skipped by the sink's replay guard — same exactly-once contract
    // as foreachBatch retries
    feed.filter(col("op") =!= "r").writeTo(s"graft_t.lsm.$tbl")
      .option("epoch", "1").append()
    assert(sink.committedEpoch.contains(1L))
    assert(canon(sink.view(spark)) == before)
    assert(before == canon(Materialize.latestState(feed)))
    // a SCHEMA-DRIFTED append fails v2 output resolution up front
    intercept[org.apache.spark.sql.AnalysisException] {
      feed.drop("ts_ms").writeTo(s"graft_t.lsm.$tbl").append()
    }
    // the scd2 namespace routes to the history sink through the same path
    val h = "hist_" + java.util.UUID.randomUUID().toString.take(8)
    feed.filter(col("op") === "r").writeTo(s"graft_t.scd2.$h")
      .tableProperty("buckets", "8").create()
    feed.filter(col("op") =!= "r").writeTo(s"graft_t.scd2.$h")
      .option("epoch", "1").append()
    val scd = new graft.streaming.Scd2Sink(s"$root/scd2/$h", buckets = 8)
    assert(scd.committedEpoch.contains(1L))
    // catalog surface: SHOW/DROP through SQL against the v2 catalog
    val listed = spark.sql(s"SHOW TABLES IN graft_t.lsm")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(listed.contains(tbl))
    spark.sql(s"DROP TABLE graft_t.lsm.$tbl")
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/lsm/$tbl")))
  }

  test("merge-on-read matches latestState before any compaction") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val sink = new LsmMergeSink(
      Files.createTempDirectory("lsink").toString, buckets = 8,
      compactEvery = 100) // never compacts in this test
    sink.merge(feed.filter(col("op") === "r"), 0L)
    sink.merge(feed.filter(col("op") =!= "r"), 1L)
    assert(sink.manifest.deltas.size == 2, "both epochs should be deltas")
    assert(sink.manifest.base.isEmpty)
    assert(canon(sink.view(spark)) == canon(Materialize.latestState(feed)))
  }

  test("compaction folds deltas into base; view unchanged; deltas cleared") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val sink = new LsmMergeSink(
      Files.createTempDirectory("lsink").toString, buckets = 8,
      compactEvery = 2)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    assert(sink.manifest.deltas.size == 1)
    sink.merge(feed.filter(col("op") =!= "r"), 1L) // triggers compaction
    val m = sink.manifest
    assert(m.deltas.isEmpty, "compaction must clear the delta list")
    assert(m.base.nonEmpty)
    assert(canon(sink.view(spark)) == canon(Materialize.latestState(feed)))
  }

  test("delta epochs leave untouched base buckets byte-identical") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "customer"), "customer")
    val sink = new LsmMergeSink(
      Files.createTempDirectory("lsink").toString, buckets = 16,
      compactEvery = 2)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    sink.merge(feed.filter(col("op") === "u"), 1L) // compacts → all base
    val m0 = sink.manifest
    assert(m0.deltas.isEmpty && m0.base.size == 16)
    // narrow delta epoch: no base rewrite at all
    val narrow = feed.filter(col("op") === "u" && col("key.c_custkey") < 20)
    assert(narrow.count() > 0)
    sink.merge(narrow, 2L)
    val m1 = sink.manifest
    assert(m1.base == m0.base, "a delta epoch must not rewrite any bucket")
    assert(m1.deltas.size == 1)
    assert(m1.deltas.head._4.nonEmpty &&
      m1.deltas.head._4.size < 16,
      s"narrow delta should touch few buckets, got ${m1.deltas.head._4.size}")
    val want = Materialize.latestState(
      feed.filter(col("op") === "r").unionAll(feed.filter(col("op") === "u")))
    assert(canon(sink.view(spark)) == canon(want))
  }

  test("state() bucket-prunes: untouched buckets scanned, never shuffled") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "customer"), "customer")
    val sink = new LsmMergeSink(
      Files.createTempDirectory("lsink").toString, buckets = 16,
      compactEvery = 2)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    sink.merge(feed.filter(col("op") === "u"), 1L) // compacts → all base
    sink.merge(
      feed.filter(col("op") === "u" && col("key.c_custkey") < 20), 2L)
    val m = sink.manifest
    val touched = m.deltas.flatMap(_._4).toSet
    val untouchedPaths =
      m.base.filterNot(kv => touched(kv._1)).values.map(_._1).toSet
    assert(untouchedPaths.nonEmpty, "narrow delta should leave cold buckets")
    val plan = sink.state(spark).get.queryExecution.sparkPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Set[String] =
      p.collect { case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
      }.flatten.toSet
    val shuffledPaths = plan.collect {
      case e: ShuffleExchangeExec => scans(e.child)
    }.flatten.toSet
    untouchedPaths.foreach { p =>
      assert(scans(plan).exists(_.endsWith(p.stripPrefix("/"))) ||
        scans(plan).exists(_.contains(p)),
        s"untouched bucket $p must still be scanned")
      assert(!shuffledPaths.exists(_.contains(p)),
        s"untouched bucket $p flowed through an Exchange")
    }
    // correctness unchanged by the pruned read path
    val want = Materialize.latestState(
      feed.filter(col("op") === "r").unionAll(feed.filter(col("op") === "u")))
    assert(canon(sink.view(spark)) == canon(want))
  }

  test("time travel: viewAt reproduces any committed epoch across deltas") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "region"), "region")
    val sink = new LsmMergeSink(
      Files.createTempDirectory("lsink").toString, buckets = 4,
      compactEvery = 100)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    sink.merge(feed, 3L)
    assert(sink.versions == Seq(0L, 3L))
    val snap = canon(sink.viewAt(spark, 0L))
    assert(snap == canon(feed.filter(col("op") === "r").select(col("after.*"))))
    assert(canon(sink.viewAt(spark, 2L)) == snap) // VERSION AS OF → still 0
    assert(canon(sink.viewAt(spark, 3L)) == canon(sink.view(spark)))
    assert(sink.stateAt(spark, -1L).isEmpty)
  }

  test("deletes tombstone through deltas and compaction") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "nation"), "nation")
    val sink = new LsmMergeSink(
      Files.createTempDirectory("lsink").toString, buckets = 4,
      compactEvery = 100)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    val dels = feed.filter(col("op") === "d")
    assert(dels.count() > 0)
    sink.merge(dels, 1L)
    assert(canon(sink.view(spark)) == canon(Materialize.latestState(
      feed.filter(col("op") === "r").unionAll(dels))))
  }

  test("vacuum keeps referenced delta and base dirs, removes folded ones") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "nation"), "nation")
    val dir = Files.createTempDirectory("lsink").toString
    val sink = new LsmMergeSink(dir, buckets = 4, compactEvery = 2)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    sink.merge(feed, 1L)  // compaction: d0,d1 folded into v1
    sink.merge(feed.filter(col("op") === "u"), 2L) // live delta d2
    val removed = sink.vacuum()
    assert(removed == 2, s"expected d0,d1 removed, got $removed")
    assert(canon(sink.view(spark)) ==
      canon(Materialize.latestState(feed)))
  }

  test("rebucket: folds deltas, preserves state, new count merges on") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val dir = Files.createTempDirectory("lsink-rb").toString
    val sink = new LsmMergeSink(dir, buckets = 8, compactEvery = 100)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    sink.merge(feed.filter(col("op") === "u"), 1L)
    val before = canon(sink.view(spark))
    val grown = sink.rebucket(spark, 32, 2L)
    assert(canon(grown.view(spark)) == before)
    // rebucket is also a full compaction: all-base manifest, no deltas
    assert(grown.manifest.deltas.isEmpty && grown.manifest.base.nonEmpty)
    // committed count follows the manifest: old count refuses cold too
    assertThrows[IllegalArgumentException] {
      new LsmMergeSink(dir, buckets = 8).merge(
        feed.filter(col("op") === "d"), 3L)
    }
    assertThrows[IllegalArgumentException] {
      sink.merge(feed.filter(col("op") === "d"), 3L)
    }
    grown.merge(feed.filter(col("op") === "d"), 3L)
    assert(canon(grown.view(spark)) == canon(Materialize.latestState(feed)))
  }

  test("heuristicBuckets: power-of-two, clamped, tracks table size") {
    import graft.streaming.CdcSink.heuristicBuckets
    assert(heuristicBuckets(0L) == 16)
    assert(heuristicBuckets(1000000L) == 16) // below the floor
    assert(heuristicBuckets(1000000000L) == 256) // 1e9/4e6=250 → 256
    assert(heuristicBuckets(1000000000000L) == 65536) // capped
    assert(heuristicBuckets(185000L, 2000L) == 128) // bench-scale target
    // 10× data → ~10× buckets (the property the r7 caveat demanded)
    assert(heuristicBuckets(1850000L, 2000L) == 1024)
  }
}
