package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2
import graft.sources.{ChangeFeedGen, Tables}

class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  test("batch history: every version intervals correctly, deletes close") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val h = Scd2.historyTable(feed).cache()
    try {
      // current rows == latest materialized state
      val current = h.filter(col("is_current"))
        .drop("valid_from_pos", "valid_to_pos", "is_current")
      assert(canon(current) ==
        canon(graft.operators.Materialize.latestState(feed)))
      // intervals are well-formed and non-overlapping per key
      val bad = h.filter(col("valid_to_pos").isNotNull &&
        col("valid_to_pos") <= col("valid_from_pos")).count()
      assert(bad == 0, "empty or inverted validity interval")
      val overlaps = h.groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("valid_from_pos")).as("d"))
        .filter(col("n") =!= col("d")).count()
      assert(overlaps == 0, "duplicate version start within a key")
    } finally { h.unpersist(); () }
  }

  test("streaming sink converges to batch history; epochs idempotent") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "supplier"), "supplier")
    val dir = java.nio.file.Files.createTempDirectory("scd2sink").toString
    val sink = new graft.streaming.Scd2Sink(dir, buckets = 8)
    // three epochs split by op (reads, then updates, then deletes —
    // strictly increasing pos across epochs for each key)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    val afterSnapshot = canon(sink.history(spark))
    sink.merge(feed.filter(col("op") === "u"), 1L)
    sink.merge(feed.filter(col("op") === "d"), 2L)
    val streamed = canon(sink.history(spark))
    assert(streamed == canon(Scd2.historyTable(feed)))
    // replaying a committed epoch must change nothing
    sink.merge(feed.filter(col("op") === "u"), 1L)
    assert(canon(sink.history(spark)) == streamed)
    // snapshot-only history had every version open
    assert(afterSnapshot.size ==
      Tables.load(spark, sfDir, "supplier").count())
    // view == latest state
    assert(canon(sink.view(spark)) ==
      canon(graft.operators.Materialize.latestState(feed)))
  }

  test("any pos-ordered epoch split converges to batch history (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "nation"), "nation").cache()
    try {
      val maxPos = feed.agg(max(col("source.pos"))).head().getLong(0)
      val want = canon(Scd2.historyTable(feed))
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(6),
        Prop.forAll(Gen.chooseNum(0L, maxPos), Gen.chooseNum(0L, maxPos)) {
          (a, b) =>
            val (c1, c2) = (math.min(a, b), math.max(a, b))
            val dir = java.nio.file.Files
              .createTempDirectory("scd2prop").toString
            val sink = new graft.streaming.Scd2Sink(dir, buckets = 4)
            sink.merge(feed.filter(col("source.pos") <= c1), 0L)
            sink.merge(feed.filter(
              col("source.pos") > c1 && col("source.pos") <= c2), 1L)
            sink.merge(feed.filter(col("source.pos") > c2), 2L)
            // vacuum must not change the current history
            sink.vacuum()
            canon(sink.history(spark)) == want
        })
      assert(res.passed, res.status.toString)
    } finally { feed.unpersist(); () }
  }

  test("hot key: per-epoch sink I/O tracks the batch, not history length") {
    // 8 keys in ONE bucket; 30 epochs each update key 1. Closed history
    // for the bucket grows to ~30 versions, but every epoch must write
    // only O(|batch| + open set) = 1 closed + 8 open rows — the e<N>
    // dir size stays flat. (The prior design re-read and re-wrote the
    // touched bucket's FULL history per epoch: linear growth exactly
    // here.)
    import spark.implicits._
    def ev(id: Long, op: String, pos: Long, v: Long) =
      (id, op, pos, v)
    def frame(rows: Seq[(Long, String, Long, Long)]) =
      rows.toDF("id", "op", "pos", "v").select(
        struct(col("id")).as("key"), col("op"),
        struct(col("id"), col("v")).as("after"),
        struct(col("pos"), lit("t").as("table")).as("source"))
    val dir = java.nio.file.Files.createTempDirectory("scd2hot")
    val sink = new graft.streaming.Scd2Sink(dir.toString, buckets = 1,
      compactEvery = 8)
    val snapshot = (1L to 8L).map(k => ev(k, "r", k, 0L))
    sink.merge(frame(snapshot), 0L)
    val epochs = 30
    val all = scala.collection.mutable.ArrayBuffer(snapshot: _*)
    for (e <- 1 to epochs) {
      val u = ev(1L, "u", 100L + e, e.toLong)
      all += u
      sink.merge(frame(Seq(u)), e.toLong)
    }
    def dirBytes(p: java.nio.file.Path): Long =
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      }
    val sizes = (5 to epochs).map(e => dirBytes(dir.resolve(s"e$e")))
    assert(sizes.max <= (sizes.min * 3) / 2,
      s"per-epoch write I/O grew with history length: $sizes")
    // and the maintained history still equals the batch computation
    val want = canon(Scd2.intervals(
      frame(all.toSeq).select(col("key"), col("op"), col("after"),
        col("source.pos").as("pos"))))
    assert(canon(sink.history(spark)
      .select(struct(col("id"), col("v")).as("after"),
        col("valid_from_pos"), col("valid_to_pos"))
      .select(struct(col("after.id")).as("key"), col("after"),
        col("valid_from_pos"), col("valid_to_pos"))) == want)
    // compaction ran (30 epochs / compactEvery=8) and bounded the
    // outstanding delta count
    assert(sink.manifest.deltas.size < 8)
  }

  test("as-of read reproduces state at any historical position") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "part"), "part")
    val h = Scd2.historyTable(feed)
    val maxK = Tables.load(spark, sfDir, "part")
      .agg(max(col("p_partkey")).cast("long")).head.getLong(0)
    // at the very last event position: equals latest state
    assert(canon(Scd2.asOf(h, maxK * 10 + 2)) ==
      canon(graft.operators.Materialize.latestState(feed)))
    // before any event: empty (key 0's read sits at pos 0)
    assert(Scd2.asOf(h, -1L).count() == 0)
  }

  test("rebucket: full history preserved, deltas folded, new count merges") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "supplier"), "supplier")
    val dir = java.nio.file.Files.createTempDirectory("scd2-rb").toString
    val sink = new graft.streaming.Scd2Sink(dir, buckets = 8,
      compactEvery = 100)
    sink.merge(feed.filter(col("op") === "r"), 0L)
    sink.merge(feed.filter(col("op") === "u"), 1L)
    val before = canon(sink.history(spark))
    val grown = sink.rebucket(spark, 32, 2L)
    assert(canon(grown.history(spark)) == before,
      "rebucket must preserve the full history (closed + open rows)")
    assert(grown.manifest.deltas.isEmpty,
      "rebucket folds outstanding closed deltas into the new base")
    assertThrows[IllegalArgumentException] {
      sink.merge(feed.filter(col("op") === "d"), 3L)
    }
    grown.merge(feed.filter(col("op") === "d"), 3L)
    // post-rebucket maintenance converges to the batch history
    assert(canon(grown.history(spark)) == canon(Scd2.historyTable(feed)))
  }
}
