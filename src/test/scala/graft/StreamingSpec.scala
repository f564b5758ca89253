package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ChangeFeedGen, Tables}
import graft.streaming.{MergeSink, StreamingMaterialize}

/** Streaming pipeline invariants: replay idempotence (P10) and batch-size
  * independence of the merge sink.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  test("gtid-set watermark window: in-window dedup, out-of-window survival") {
    import spark.implicits._
    import graft.operators.IncrementalSnapshot
    import graft.sources.wire.GtidSet
    val sid = "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"
    // chunk rows (op=r): chunk 0 holds keys 1-2, chunk 1 holds keys 5-6
    val chunkRows = Seq((1L, 10L, 0L, 100L), (2L, 20L, 0L, 110L),
      (5L, 50L, 1L, 200L), (6L, 60L, 1L, 210L))
      .toDF("k", "v", "chunk", "pos")
      .select(struct(col("k")).as("key"), lit("r").as("op"),
        struct(col("k"), col("v")).as("after"),
        struct(col("pos")).as("source"), col("chunk"))
    // stream: key 2's event gno=15 is INSIDE chunk 0's window (hi\lo =
    // 11-19); key 6's event gno=25 is OUTSIDE chunk 1's (21-22). Both
    // carry LOWER pos than their chunk rows, so window semantics are
    // observable through latest-by-pos: a discarded chunk row lets the
    // (older) stream value through; a surviving one wins on pos.
    val stream = Seq((2L, 21L, 15L, 50L), (6L, 61L, 25L, 60L))
      .toDF("k", "v", "gno", "pos")
      .select(struct(col("k")).as("key"), lit("u").as("op"),
        struct(col("k"), col("v")).as("after"),
        struct(col("pos")).as("source"),
        concat(lit(sid + ":"), col("gno")).as("gtid"))
    val windows = Seq(
      (0L, GtidSet.parse(s"$sid:1-10"), GtidSet.parse(s"$sid:1-19")),
      (1L, GtidSet.parse(s"$sid:1-20"), GtidSet.parse(s"$sid:1-22")))
    val out = IncrementalSnapshot
      .readOnlyChunkMergeGtid(chunkRows, windows, stream)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 10L, 2L -> 21L, 5L -> 50L, 6L -> 60L))
  }

  test("tx retention evicts committed state: late replays re-buffer, not re-emit") {
    import spark.implicits._
    import graft.streaming.TxReassembly
    val dir = Files.createTempDirectory("tx-retention").toString
    def writeSeg(rows: Seq[(String, Long, String, Long)]): Unit =
      rows.toDF("txId", "k", "op", "pos").coalesce(1)
        .write.mode("append").parquet(dir)
    writeSeg(Seq(("t1", 1L, "u", 10L), ("t1", -1L, "m", 99L)))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .as[TxReassembly.TxEvent]
    val name = s"txret_${System.nanoTime()}"
    val q = TxReassembly.reassemble(stream, retentionMs = 1500L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      while (spark.table(name).count() < 1 && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(spark.table(name).count() == 1, "committed event must emit")
      // let retention expire (timeout batches fire on the repeating
      // trigger), then replay an event of the evicted tx: with the commit
      // position forgotten it must re-buffer, NOT emit against pos 99
      Thread.sleep(4000)
      writeSeg(Seq(("t1", 2L, "u", 20L)))
      Thread.sleep(3000)
      assert(spark.table(name).count() == 1,
        "late event after retention expiry must not release")
    } finally q.stop()
  }

  test("event-time retention evicts abandoned txs under bounded AvailableNow") {
    import spark.implicits._
    import graft.streaming.TxReassembly
    val dir = Files.createTempDirectory("tx-evret").toString
    def writeSeg(rows: Seq[(String, Long, String, Long)]): Unit = {
      rows.toDF("txId", "k", "op", "pos").coalesce(1)
        .write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    // ta never sees its marker (abandoned, event time ~1s); tb and tc
    // commit at 60s and 120s, advancing the watermark past ta's
    // last-event + retention so the EVENT-TIME timeout fires inside the
    // bounded replay — the thing processing-time retention cannot do
    writeSeg(Seq(("ta", 1L, "u", 1000000L)))
    writeSeg(Seq(("tb", 2L, "u", 60000000L), ("tb", -1L, "m", 61000000L)))
    writeSeg(Seq(("tc", 3L, "u", 120000000L), ("tc", -1L, "m", 121000000L)))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .as[TxReassembly.TxEvent]
    val name = s"txevret_${System.nanoTime()}"
    val q = TxReassembly.reassembleEventTime(stream, "5 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(4))).toSet
    assert(rows.contains(("tb", 61000000L)) && rows.contains(("tc", 121000000L)),
      s"committed txs must release: $rows")
    assert(rows.contains(("ta", -1L)),
      s"abandoned tx must be evicted by the watermark and surfaced: $rows")
  }

  test("replaying the whole transport into an existing sink is a no-op") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val transport = Files.createTempDirectory("t").toString
    val sinkDir = Files.createTempDirectory("s").toString
    StreamingMaterialize.writeTransport(feed, transport)
    val first = canon(StreamingMaterialize.run(spark, transport, sinkDir))
    // fresh checkpoint → the stream replays from scratch into the same sink
    val second = canon(StreamingMaterialize.run(spark, transport, sinkDir))
    assert(first == second, "replay changed materialized state")
  }

  test("merge result independent of micro-batch slicing") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "customer"), "customer")
    val transport = Files.createTempDirectory("t").toString
    StreamingMaterialize.writeTransport(feed, transport, files = 6)
    val one = canon(StreamingMaterialize.run(spark, transport,
      Files.createTempDirectory("s1").toString, filesPerTrigger = 1))
    val three = canon(StreamingMaterialize.run(spark, transport,
      Files.createTempDirectory("s3").toString, filesPerTrigger = 3))
    assert(one == three, "batch slicing changed state")
    // and equals the batch-mode materialization
    val batch = canon(graft.operators.Materialize.latestState(feed))
    assert(one == batch, "streaming state != batch latestState")
  }

  test("progress listener collects per-batch notifications (P7)") {
    val collector = graft.streaming.Notifications.collect(spark)
    try {
      val feed = ChangeFeedGen.standardFeed(
        Tables.load(spark, sfDir, "nation"), "nation")
      val transport = Files.createTempDirectory("t").toString
      StreamingMaterialize.writeTransport(feed, transport)
      StreamingMaterialize.run(spark, transport,
        Files.createTempDirectory("s").toString)
      // listener delivery is async; wait briefly for the bus to drain
      spark.streams.awaitAnyTermination(1)
      val deadline = System.currentTimeMillis() + 10000
      while (collector.progress.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(collector.progress.nonEmpty, "no progress events collected")
      assert(collector.progress.map(_._3).sum > 0, "no input rows reported")
    } finally spark.streams.removeListener(collector)
  }

  test("approximate sketches track exact counts (error bounds)") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = e.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble; val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx_count_distinct off by >10%: $exact vs $approx")
    }
    val q = e.agg(
      expr("percentile(value, 0.5)").as("exact"),
      expr("percentile_approx(value, 0.5, 1000)").as("approx")).head()
    assert(math.abs(q.getDouble(0) - q.getDouble(1)) <
      math.max(1.0, q.getDouble(0) * 0.05))
  }

  test("streaming pipeline over the bucketed sink matches full-state sink") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "part"), "part")
    val transport = Files.createTempDirectory("t").toString
    StreamingMaterialize.writeTransport(feed, transport)
    val full = canon(StreamingMaterialize.run(spark, transport,
      Files.createTempDirectory("sf").toString))
    val bucketed = canon(StreamingMaterialize.run(spark, transport,
      Files.createTempDirectory("sb").toString,
      sinkFactory = d => new graft.streaming.BucketedMergeSink(d, buckets = 8)))
    assert(bucketed == full, "bucketed streaming state differs")
  }

  test("out-of-order delivery converges to the same state (pos precedence)") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "supplier"), "supplier")
    val sinkDir = Files.createTempDirectory("s").toString
    val sink = new MergeSink(sinkDir)
    // deliver the stream events FIRST, snapshot afterwards (stale writes)
    sink.merge(feed.filter(col("op") =!= "r"), 0L)
    sink.merge(feed.filter(col("op") === "r"), 1L)
    val got = canon(sink.view(spark))
    val want = canon(graft.operators.Materialize.latestState(feed))
    assert(got == want, "stale snapshot rows overwrote newer stream state")
  }
}
