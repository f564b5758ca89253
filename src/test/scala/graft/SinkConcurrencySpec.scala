package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ChangeFeedGen, Tables}
import graft.streaming.{ConcurrentEpochCommitException, LsmMergeSink, MergeSink}

/** Optimistic-concurrency epoch commit (streaming/EpochClaim,
  * CdcSink.claimEpoch/publishEpoch, GraftSinkCatalog.commitWithRetry):
  * two writers that resolve the SAME epoch — a stream's foreachBatch
  * merge racing an ad-hoc SQL statement, both computing
  * committedEpoch+1 — must never silently lose an epoch. The claim
  * serializes same-epoch writers; `merge` reports replay-drops so
  * default-epoch callers rebase on the new tip and retry; explicit
  * mismatched epochs are caught by the CAS check at the pointer swap.
  * This is the "lost epoch under concurrent commit" defect class (NOTES
  * defect taxonomy) — the reference avoids it via Connect task ownership
  * + DB transactions (`JdbcChangeEventSink.java:89-186`); Delta/Iceberg
  * via optimistic commit, which this mirrors.
  */
class SinkConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private def envBatch(markers: (Int, String)*): DataFrame = {
    import spark.implicits._
    markers.toSeq.toDF("k", "name").select(
      struct(col("k").as("n_nationkey")).as("key"),
      lit(null).cast("struct<n_nationkey:int,n_name:string>").as("before"),
      struct(col("k").as("n_nationkey"), col("name").as("n_name"),
        lit(0).as("n_regionkey")).as("after"),
      lit("c").as("op"),
      struct((col("k") + 100000).cast("long").as("pos")).as("source"),
      lit(null).cast("string").as("transaction"),
      (col("k") + 100000).cast("long").as("ts_ms"))
  }

  test("two same-epoch merges: exactly one commits, the loser is loud " +
      "or reported — never both, never silent loss") {
    for (round <- 1 to 3) {
      val dir = Files.createTempDirectory(s"race$round").toString
      val sink = new MergeSink(dir)
      assert(sink.merge(envBatch(1 -> "base"), 0L))
      val epoch = sink.committedEpoch.get + 1
      val pool = ExecutionContext.fromExecutorService(
        Executors.newFixedThreadPool(2))
      try {
        val attempts = Seq("a", "b").map { tag =>
          Future {
            try Right(sink.merge(envBatch(round * 10 -> tag), epoch))
            catch { case e: ConcurrentEpochCommitException => Left(e) }
          }(pool)
        }
        val results = attempts.map(Await.result(_, 60.seconds))
        val wins = results.count(_ == Right(true))
        assert(wins == 1, s"exactly one writer must own epoch $epoch: $results")
        // the loser was told (false = replay-dropped after the winner
        // committed; Left = claim conflict) — never a silent second swap
        assert(sink.committedEpoch.contains(epoch))
      } finally pool.shutdown()
    }
  }

  test("a failed merge releases its claim: the epoch is retryable") {
    val dir = Files.createTempDirectory("claimrel").toString
    val sink = new LsmMergeSink(dir, buckets = 4)
    assert(sink.merge(envBatch(1 -> "x"), 0L))
    // a batch missing the envelope columns fails inside the merge body
    import spark.implicits._
    intercept[Exception] {
      sink.merge(Seq((1, "bad")).toDF("a", "b"), 1L)
    }
    // claim must be gone — the same epoch commits cleanly afterwards
    assert(sink.merge(envBatch(2 -> "y"), 1L))
    assert(sink.committedEpoch.contains(1L))
  }

  test("a fresh foreign claim blocks the epoch loudly; a stale one is " +
      "broken (crashed-writer recovery)") {
    val dir = Files.createTempDirectory("claimstale").toString
    val sink = new MergeSink(dir)
    assert(sink.merge(envBatch(1 -> "x"), 0L))
    val claim = Paths.get(dir, "epoch1.claim")
    // fresh claim with no in-process owner = another process mid-commit
    Files.writeString(claim, s"other ${System.currentTimeMillis()}")
    val e = intercept[ConcurrentEpochCommitException] {
      sink.merge(envBatch(2 -> "y"), 1L)
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // stale claim (older than graft.sink.claim.stale.ms) = crashed
    // writer; the next committer breaks it and proceeds
    Files.writeString(claim,
      s"other ${System.currentTimeMillis() - EpochClaimTestHook.staleMs - 1000}")
    assert(sink.merge(envBatch(2 -> "y"), 1L))
    assert(sink.committedEpoch.contains(1L))
    assert(!Files.exists(claim), "claim must be released after commit")
  }

  test("the claim HEARTBEAT keeps a live slow owner's claim fresh: an " +
      "eager breaker with a short stale window stays loud while the " +
      "owner lives, and recovery proceeds once the beats stop") {
    val dir = Files.createTempDirectory("hb-owner").toString
    val sink = new MergeSink(dir)
    assert(sink.merge(envBatch(1 -> "x"), 0L))
    val old = sys.props.get("graft.sink.claim.stale.ms")
    // generous margins: the suite runs under heavy parallel load and a
    // starved beat thread must not read as a stale claim
    sys.props("graft.sink.claim.stale.ms") = "2500"
    try {
      // a "slow cross-process owner": a foreign-token claim file kept
      // fresh by its own heartbeat (simulated — a real foreign owner is
      // another JVM, whose EpochClaim does exactly this)
      val claim = Paths.get(dir, "epoch1.claim")
      @volatile var owner = true
      val beats = new Thread(() => {
        while (owner) {
          Files.writeString(claim, s"foreign ${System.currentTimeMillis()}")
          Thread.sleep(250)
        }
      })
      beats.setDaemon(true)
      beats.start()
      Thread.sleep(3200) // well past the 2.5 s stale window
      // the breaker must NOT break a heartbeat-fresh claim — before the
      // heartbeat, any commit slower than the window lost its claim here
      val e = intercept[ConcurrentEpochCommitException] {
        sink.merge(envBatch(2 -> "steal"), 1L)
      }
      assert(e.getMessage.contains("cross-process"), e.getMessage)
      // the owner "crashes": beats stop, the claim ages out, recovery
      // breaks it and commits
      owner = false
      beats.join()
      Thread.sleep(3000)
      assert(sink.merge(envBatch(2 -> "recovered"), 1L))
      assert(sink.committedEpoch.contains(1L))
    } finally {
      old match {
        case Some(v) => sys.props("graft.sink.claim.stale.ms") = v
        case None => sys.props -= "graft.sink.claim.stale.ms"
      }
    }
  }

  test("our own heartbeat refreshes a held claim past the stale window, " +
      "and verifyHeld fails the OWNER when its claim was re-owned " +
      "mid-commit (the swap-time token check)") {
    import graft.streaming.EpochClaim
    val dir = Files.createTempDirectory("hb-self").toString
    val old = sys.props.get("graft.sink.claim.stale.ms")
    sys.props("graft.sink.claim.stale.ms") = "1200"
    val claim = new org.apache.hadoop.fs.Path(dir, "epoch7.claim")
    try {
      EpochClaim.acquire(claim, "hb-self", 7L)
      Thread.sleep(4000) // > 3x the stale window
      val ts = Files.readString(Paths.get(dir, "epoch7.claim"))
        .trim.split("\\s+").last.toLong
      // the beat period is staleMs/3 (400 ms); < staleMs proves the
      // refresh is live even if the scheduler lagged a couple of beats
      assert(System.currentTimeMillis() - ts < 1200,
        "heartbeat must keep the claim file's timestamp fresh")
      EpochClaim.verifyHeld(claim, "hb-self", 7L) // still ours: passes
    } finally {
      EpochClaim.release(claim)
      old match {
        case Some(v) => sys.props("graft.sink.claim.stale.ms") = v
        case None => sys.props -= "graft.sink.claim.stale.ms"
      }
    }
    // re-owned mid-commit (default 60 s window: its 20 s beat cannot
    // race the assertions below): the owner's swap must fail loudly
    EpochClaim.acquire(claim, "hb-self", 7L)
    try {
      Files.writeString(Paths.get(dir, "epoch7.claim"),
        s"foreign ${System.currentTimeMillis()}")
      val e = intercept[ConcurrentEpochCommitException] {
        EpochClaim.verifyHeld(claim, "hb-self", 7L)
      }
      assert(e.getMessage.contains("broken by another writer"),
        e.getMessage)
    } finally EpochClaim.release(claim)
  }

  test("committedEpoch readers hammering a live swap loop never observe " +
      "a torn, missing, or checksum-failed pointer (regression: Hadoop's " +
      "ChecksumFs renamed the data+.crc pair in two non-atomic steps)") {
    val dir = Files.createTempDirectory("swap-hammer").toString
    val sink = new MergeSink(dir)
    assert(sink.merge(envBatch(1 -> "x"), 0L))
    val pointer = new org.apache.hadoop.fs.Path(dir, "CURRENT")
    @volatile var stop = false
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = (1 to 8).map { _ =>
      val t = new Thread(() => {
        try {
          while (!stop) {
            val e = sink.committedEpoch
            // every swap writes v<k>; a parse miss means a torn read
            if (e.isEmpty) throw new AssertionError(
              "pointer read empty or unparseable mid-swap")
          }
        } catch { case t: Throwable => errors.add(t); stop = true }
      })
      t.start(); t
    }
    // thousands of pointer swaps while the readers hammer; pre-fix this
    // crashed with ChecksumException within a few hundred iterations
    for (i <- 0 until 4000 if !stop)
      graft.streaming.SinkFs.swapPointer(pointer, s"CURRENT.tmp", s"v${i % 9}\n")
    stop = true
    readers.foreach(_.join())
    assert(errors.isEmpty, s"torn pointer read: ${errors.peek()}")
  }

  test("a replayed epoch still no-ops (exactly-once under foreachBatch " +
      "retries is unchanged by the claims)") {
    val dir = Files.createTempDirectory("replay").toString
    val sink = new MergeSink(dir)
    assert(sink.merge(envBatch(1 -> "x"), 0L))
    assert(!sink.merge(envBatch(1 -> "OVERWRITE"), 0L), "replay must no-op")
    assert(sink.view(spark).filter(col("n_name") === "OVERWRITE").count() == 0)
  }

  test("stream appends racing SQL UPDATEs: both writers' every effect " +
      "survives — no epoch is ever lost") {
    val cat = "graft_race"
    if (spark.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root",
        Files.createTempDirectory("race-cat").toString)
    }
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "nation"), "nation")
    val name = s"$cat.lsm.race_" +
      java.util.UUID.randomUUID().toString.take(8)
    feed.filter(col("op") === "r").writeTo(name)
      .tableProperty("buckets", "4").create()

    val n = 6
    val pool = ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(2))
    try {
      // writer A: default-epoch appends of NEW keys (the stream stand-in);
      // the batch conforms to the table's own envelope types by casting
      // the null bookkeeping columns to the declared shapes
      val env = spark.table(name).schema
      def declared(c: String) = env.find(_.name.equalsIgnoreCase(c)).get.dataType
      val appender = Future {
        for (i <- 0 until n)
          envBatch(1000 + i -> s"ins-$i")
            .withColumn("before", lit(null).cast(declared("before")))
            .withColumn("transaction", lit(null).cast(declared("transaction")))
            .writeTo(name).append()
      }(pool)
      // writer B: ad-hoc SQL UPDATEs on an existing key (the DML user)
      val updater = Future {
        for (j <- 0 until n)
          spark.sql(s"UPDATE $name SET after.n_name = 'race-$j' " +
            "WHERE key.n_nationkey = 3")
      }(pool)
      Await.result(appender, 300.seconds)
      Await.result(updater, 300.seconds)
    } finally pool.shutdown()

    // every append's key landed
    val inserted = spark.sql(s"SELECT key.n_nationkey FROM $name " +
      s"WHERE key.n_nationkey >= 1000 AND op <> 'd'")
      .collect().map(_.getInt(0)).toSet
    assert(inserted == (1000 until 1000 + n).toSet,
      s"lost appends: ${(1000 until 1000 + n).toSet -- inserted}")
    // the updater's LAST statement is the visible value (its statements
    // ran sequentially on one thread)
    val marked = spark.sql(s"SELECT after.n_name FROM $name " +
      "WHERE key.n_nationkey = 3").head.getString(0)
    assert(marked == s"race-${n - 1}", marked)
    // THE lost-epoch assertion: every one of the 1 + n + n commits got
    // its own epoch — nothing was silently dropped or overwritten
    val parts = name.split('.')
    val sink = graft.sinks.v2.GraftSinkCatalog.sinkFor("lsm",
      spark.conf.get(s"spark.sql.catalog.$cat.root") + s"/lsm/${parts(2)}",
      Map("buckets" -> "4"))
    assert(sink.committedEpoch.contains((2 * n).toLong),
      s"expected ${2 * n} committed epochs, got ${sink.committedEpoch}")
  }
}

/** Test-side mirror of [[graft.streaming.EpochClaim.staleMs]]'s default
  * (the property is read per acquire, so tests use the live value).
  */
object EpochClaimTestHook {
  def staleMs: Long = sys.props.get("graft.sink.claim.stale.ms")
    .flatMap(_.toLongOption).getOrElse(60000L)
}
