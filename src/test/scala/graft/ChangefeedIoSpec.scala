package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.v2.SinkChanges
import graft.streaming.{BucketedMergeSink, MergeSink, Scd2Sink}

/** `$changes` derivation cost (CdcSink.changesAt): per-epoch changefeed
  * READ I/O must track the CHANGE RATE, not the table size. The r12
  * diff derivation joined full state against full state per epoch —
  * O(versions × table) for a batch feed read at scale; the epoch-local
  * derivation reads only the epoch's own artifacts (plus, for
  * bucketed/scd2, the touched buckets' previous version). Pinned here
  * via DataFrame.inputFiles: a one-key epoch over a 16-bucket table
  * must touch ONE bucket per side, not sixteen.
  */
class ChangefeedIoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def envBatch(markers: (Int, String, String)*): DataFrame = {
    import spark.implicits._
    markers.toSeq.toDF("k", "name", "o").select(
      struct(col("k").as("n_nationkey")).as("key"),
      lit(null).cast("struct<n_nationkey:int,n_name:string>").as("before"),
      when(col("o") === "d", lit(null)
        .cast("struct<n_nationkey:int,n_name:string>"))
        .otherwise(struct(col("k").as("n_nationkey"),
          col("name").as("n_name"))).as("after"),
      col("o").as("op"),
      struct((col("k") + 100000).cast("long").as("pos")).as("source"),
      lit(null).cast("string").as("transaction"),
      (col("k") + 100000).cast("long").as("ts_ms"))
  }

  /** Distinct `_bucket=` leaf dirs under `version` that `files` touch. */
  private def bucketsTouched(files: Seq[String], version: String): Set[String] =
    files.filter(_.contains(s"/$version/"))
      .flatMap(_.split("/").find(_.startsWith("_bucket="))).toSet

  test("bucketed $changes of a one-key epoch reads ONE bucket per side, " +
      "never the full table") {
    val dir = Files.createTempDirectory("cfio-b").toString
    val sink = new BucketedMergeSink(dir, buckets = 16)
    // snapshot: 64 keys spread over the 16 buckets
    assert(sink.merge(envBatch((1 to 64).map(k =>
      (k, s"n$k", "r")): _*), 0L))
    // epoch 1 touches exactly one key
    assert(sink.merge(envBatch((7, "updated", "u")).withColumn("source",
      struct(lit(900000L).as("pos"))), 1L))

    val cf = SinkChanges.changesFor(spark, "bucketed", dir, Map.empty,
      epoch = 1L, prev = Some(0L))
    val rows = cf.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("op") == "u" &&
      rows.head.getAs[String]("key_json").contains("7"), rows.mkString(";"))
    val files = cf.inputFiles.toSeq
    assert(bucketsTouched(files, "v1").size == 1,
      s"epoch side must read 1 bucket: $files")
    assert(bucketsTouched(files, "v0").size == 1,
      s"prev side must read only the touched bucket, not all 16: $files")
  }

  test("scd2 $changes of a one-update-one-delete epoch reads the epoch " +
      "dir + touched prev open buckets only; tombstone at true closing pos") {
    val dir = Files.createTempDirectory("cfio-s").toString
    val sink = new Scd2Sink(dir, buckets = 16)
    assert(sink.merge(envBatch((1 to 64).map(k =>
      (k, s"n$k", "r")): _*), 0L))
    // epoch 1: update key 7 (pos 900007), delete key 9 (pos 900009)
    val b = envBatch((7, "updated", "u"), (9, null, "d"))
      .withColumn("source",
        struct((col("key.n_nationkey") + 900000L).as("pos")))
    assert(sink.merge(b, 1L))

    val cf = SinkChanges.changesFor(spark, "scd2", dir, Map.empty,
      epoch = 1L, prev = Some(0L))
    val rows = cf.collect().sortBy(_.getAs[String]("key_json"))
    assert(rows.length == 2, rows.mkString(";"))
    val upd = rows.find(_.getAs[String]("op") == "r").get
    assert(upd.getAs[String]("key_json").contains("7") &&
      upd.getAs[Long]("pos") == 900007L &&
      upd.getAs[String]("after_json").contains("updated"))
    val del = rows.find(_.getAs[String]("op") == "d").get
    assert(del.getAs[String]("key_json").contains("9") &&
      del.getAs[Long]("pos") == 900009L &&
      del.getAs[String]("after_json") == null)

    // I/O bound: nothing outside e1/ and the touched buckets' prev open
    // sets may be read — in particular NOT the closed history and NOT
    // the 14+ untouched open buckets
    val files = cf.inputFiles.toSeq
    val offenders = files.filterNot(f =>
      f.contains("/e1/") || f.contains("/e0/_closed=false/"))
    assert(offenders.isEmpty, s"reads outside the epoch artifacts: $offenders")
    val prevOpen = files.filter(_.contains("/e0/_closed=false/"))
      .flatMap(_.split("/").find(_.startsWith("_bucket="))).toSet
    assert(prevOpen.size <= 2,
      s"prev open reads must be bounded by touched buckets: $prevOpen")
  }

  test("full-kind $changes with changefeed=true reads ONLY the epoch's " +
      "change-delta sidecar, and matches the diff fallback row-for-row") {
    val dir = Files.createTempDirectory("cfio-f").toString
    val sink = new MergeSink(dir, changefeedDelta = true)
    assert(sink.merge(envBatch((1 to 64).map(k =>
      (k, s"n$k", "r")): _*), 0L))
    // epoch 1: one update, one delete
    val b = envBatch((7, "updated", "u"), (9, null, "d"))
      .withColumn("source",
        struct((col("key.n_nationkey") + 900000L).as("pos")))
    assert(sink.merge(b, 1L))

    val fastDf = SinkChanges.changesFor(spark, "full", dir,
      Map("changefeed" -> "true"), epoch = 1L, prev = Some(0L))
    // I/O bound: the per-epoch derivation must read the c1/ sidecar and
    // NOTHING else — in particular neither full state version
    val files = fastDf.inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("/c1/")),
      s"full-kind fast path must read only c1/: $files")
    val fast = fastDf.collect().map(_.toString).sorted
    // the reference result: the state-vs-state diff + droppedAt (what a
    // table WITHOUT the sidecar opt-in pays)
    val plain = new MergeSink(dir)
    val cur = plain.stateAt(spark, 1L).get
    val prev = plain.stateAt(spark, 0L).get
    val slow = cur.join(
        prev.select(col("key"), col("pos").as("__p")), Seq("key"), "left")
      .filter(col("__p").isNull || col("__p") =!= col("pos"))
      .drop("__p")
      .select(lit(1L).as("epoch"), col("op"), col("pos"),
        to_json(col("key")).as("key_json"),
        to_json(col("after")).as("after_json"))
      .collect().map(_.toString).sorted
    assert(fast.toSeq == slow.toSeq,
      s"fast=${fast.mkString("|")} slow=${slow.mkString("|")}")
  }

  test("full-kind vacuum erodes the feed to a tip snapshot — an " +
      "incremental sidecar must NOT serve as the first retained epoch") {
    val dir = Files.createTempDirectory("cfio-fv").toString
    val sink = new MergeSink(dir, changefeedDelta = true)
    assert(sink.merge(envBatch((1 to 20).map(k =>
      (k, s"n$k", "r")): _*), 0L))
    assert(sink.merge(envBatch((3, "u3", "u")).withColumn("source",
      struct(lit(900000L).as("pos"))), 1L))
    assert(sink.vacuum() >= 1)
    // only the tip is retained; its c1/ sidecar holds ONE row, but the
    // feed's first retained epoch must be the full snapshot — the guard
    // in MergeSink.changesAt forces the diff fallback (prev=None)
    val feed = SinkChanges.allChanges(spark, "full", dir,
      Map("changefeed" -> "true"), asOf = None)
    assert(feed.count() == 20L,
      "post-vacuum feed must snapshot the whole retained state")
    assert(feed.filter(col("key_json").contains("\"n_nationkey\":3"))
      .head.getAs[String]("after_json").contains("u3"))
  }

  test("bucketed/scd2 with changefeed=true serve $changes from the " +
      "epoch's sidecar alone — no bucket or open-set reads") {
    for ((kind, mk) <- Seq(
        "bucketed" -> ((d: String) =>
          new BucketedMergeSink(d, buckets = 16, changefeedDelta = true)
            : graft.streaming.CdcSink),
        "scd2" -> ((d: String) =>
          new Scd2Sink(d, buckets = 16, changefeedDelta = true)
            : graft.streaming.CdcSink))) {
      val dir = Files.createTempDirectory(s"cfio-cf-$kind").toString
      val sink = mk(dir)
      assert(sink.merge(envBatch((1 to 64).map(k =>
        (k, s"n$k", "r")): _*), 0L))
      val b = envBatch((7, "updated", "u"), (9, null, "d"))
        .withColumn("source",
          struct((col("key.n_nationkey") + 900000L).as("pos")))
      assert(sink.merge(b, 1L))
      val cf = SinkChanges.changesFor(spark, kind, dir,
        Map("changefeed" -> "true"), epoch = 1L, prev = Some(0L))
      val rows = cf.collect().sortBy(_.getAs[String]("key_json"))
      assert(rows.length == 2, s"$kind: ${rows.mkString(";")}")
      val upd = rows.find(_.getAs[String]("op") == "u").get
      assert(upd.getAs[String]("key_json").contains("7") &&
        upd.getAs[Long]("pos") == 900007L &&
        upd.getAs[String]("after_json").contains("updated"), s"$kind: $upd")
      val del = rows.find(_.getAs[String]("op") == "d").get
      assert(del.getAs[String]("key_json").contains("9") &&
        del.getAs[Long]("pos") == 900009L &&
        del.getAs[String]("after_json") == null, s"$kind: $del")
      val files = cf.inputFiles.toSeq
      assert(files.nonEmpty && files.forall(_.contains("/c1/")),
        s"$kind sidecar path must read only c1/: $files")
    }
  }

  test("an EMPTY epoch's change-delta sidecar (update-mode statement " +
      "matching nothing) must not poison subsequent $changes reads") {
    // full kind: update-mode merge whose keys are all absent commits an
    // epoch with an empty c<epoch>/ sidecar — every later feed read
    // crosses it and must not throw on schema inference
    val dir = Files.createTempDirectory("cfio-empty-f").toString
    val sink = new MergeSink(dir, changefeedDelta = true)
    assert(sink.merge(envBatch((1 to 5).map(k => (k, s"n$k", "r")): _*), 0L))
    assert(sink.merge(envBatch((99, "ghost", "u")).withColumn("source",
      struct(lit(900000L).as("pos"))), 1L, mode = "update"))
    assert(sink.merge(envBatch((2, "u2", "u")).withColumn("source",
      struct(lit(900001L).as("pos"))), 2L))
    val feed = SinkChanges.allChanges(spark, "full", dir,
      Map("changefeed" -> "true"), asOf = None)
    assert(feed.filter(col("epoch") === 1L).count() == 0L)
    assert(feed.count() == 6L, "5 snapshot rows + the epoch-2 update")

    // bucketed: an all-reduced-away batch leaves an empty sidecar too
    val bdir = Files.createTempDirectory("cfio-empty-b").toString
    val bsink = new BucketedMergeSink(bdir, buckets = 4,
      changefeedDelta = true)
    assert(bsink.merge(envBatch((1 to 5).map(k => (k, s"n$k", "r")): _*), 0L))
    assert(bsink.merge(envBatch().withColumn("source",
      struct(lit(900000L).as("pos"))), 1L))
    val bfeed = SinkChanges.allChanges(spark, "bucketed", bdir,
      Map("changefeed" -> "true"), asOf = None)
    assert(bfeed.filter(col("epoch") === 1L).count() == 0L)
    assert(bfeed.count() == 5L)
  }

  test("a resuming $changes stream whose frontier predates a full-kind " +
      "vacuum fails loudly; a fresh stream serves a snapshot") {
    import graft.sinks.v2.{EpochOffset, SinkChangesMicroBatchStream, SinkChangesPartition, SinkChangesPartitionReader}
    val dir = Files.createTempDirectory("cfio-fl").toString
    val props = Map("changefeed" -> "true")
    val sink = new MergeSink(dir, changefeedDelta = true)
    assert(sink.merge(envBatch((1 to 20).map(k => (k, s"n$k", "r")): _*), 0L))
    assert(sink.merge(envBatch((3, "u3", "u")).withColumn("source",
      struct(lit(900000L).as("pos"))), 1L))
    assert(sink.merge(envBatch((5, "u5", "u")).withColumn("source",
      struct(lit(900001L).as("pos"))), 2L))
    assert(sink.vacuum() >= 1) // floor = 2: epochs 0,1 eroded
    val ckpt = Files.createTempDirectory("cfio-fl-ck").toString
    val st = new SinkChangesMicroBatchStream("full", dir, props, ckpt)

    // frontier 0 → epoch 1 was committed but is no longer enumerable:
    // loud, never a silent skip
    val e = intercept[IllegalStateException] {
      st.planInputPartitions(EpochOffset(0L), EpochOffset(2L))
    }
    assert(e.getMessage.contains("erosion floor"), e.getMessage)

    // frontier floor-1 is fine (nothing between it and the floor)
    assert(st.planInputPartitions(EpochOffset(1L), EpochOffset(2L)).nonEmpty)

    // a FRESH stream admits the retained tip as one snapshot batch
    val parts = st.planInputPartitions(EpochOffset(-1L), EpochOffset(2L))
    val n = parts.map { p =>
      val r = new SinkChangesPartitionReader(
        p.asInstanceOf[SinkChangesPartition])
      try Iterator.continually(r.next()).takeWhile(identity).size
      finally r.close()
    }.sum
    assert(n == 20, s"fresh stream must snapshot all 20 keys, got $n")

    // batch feed pinned below the floor: gone is loud, not empty
    val e2 = intercept[IllegalStateException] {
      SinkChanges.allChanges(spark, "full", dir, props, asOf = Some(0L))
    }
    assert(e2.getMessage.contains("erosion floor"), e2.getMessage)
  }

  test("fromEpoch/toEpoch read options bound the batch $changes feed " +
      "(Delta CDF startingVersion analog); eroded starts fail loudly") {
    val root = Files.createTempDirectory("cfio-opt").toString
    if (spark.conf.getOption("spark.sql.catalog.graft_cfo").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft_cfo",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_cfo.root", root)
    }
    val cat = spark.conf.get("spark.sql.catalog.graft_cfo.root")
    val sink = new graft.streaming.LsmMergeSink(s"$cat/lsm/t",
      buckets = 4, compactEvery = 100)
    assert(sink.merge(envBatch((1 to 20).map(k =>
      (k, s"n$k", "r")): _*), 0L))
    assert(sink.merge(envBatch((3, "u3", "u")).withColumn("source",
      struct(lit(900000L).as("pos"))), 1L))
    assert(sink.merge(envBatch((5, "u5", "u")).withColumn("source",
      struct(lit(900001L).as("pos"))), 2L))
    Files.writeString(java.nio.file.Paths.get(s"$cat/lsm/t/_table.ddl"),
      spark.createDataFrame(spark.sparkContext.emptyRDD[
        org.apache.spark.sql.Row],
        envBatch((1, "x", "r")).schema).schema.toDDL): Unit
    val tbl = "graft_cfo.lsm.`t$changes`"
    def epochs(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("epoch").collect().map(_.getLong(0)).sorted.toSeq
    // unbounded: snapshot + both increments
    assert(epochs(spark.table(tbl)) == Seq.fill(20)(0L) ++ Seq(1L, 2L))
    // fromEpoch=1: the increments ONLY — epoch 1 serves its own one-row
    // delta, never a snapshot (the consumer has the earlier state)
    val from1 = spark.read.option("fromEpoch", "1").table(tbl)
    assert(epochs(from1) == Seq(1L, 2L), epochs(from1).toString)
    assert(from1.filter(col("epoch") === 1L).head
      .getAs[String]("after_json").contains("u3"))
    // toEpoch composes: [1, 1]
    assert(epochs(spark.read.option("fromEpoch", "1")
      .option("toEpoch", "1").table(tbl)) == Seq(1L))
    // bad value is loud
    val e = intercept[Exception] {
      spark.read.option("fromEpoch", "soon").table(tbl).collect()
    }
    assert(e.getMessage.contains("numeric epoch"), e.getMessage)
    // a fromEpoch below a full-kind erosion floor is loud, not partial
    val fdir = Files.createTempDirectory("cfio-opt-f").toString
    val fsink = new MergeSink(fdir, changefeedDelta = true)
    assert(fsink.merge(envBatch((1 to 8).map(k =>
      (k, s"n$k", "r")): _*), 0L))
    assert(fsink.merge(envBatch((2, "u2", "u")).withColumn("source",
      struct(lit(900000L).as("pos"))), 1L))
    assert(fsink.vacuum() >= 1)
    val e2 = intercept[IllegalStateException] {
      SinkChanges.allChanges(spark, "full", fdir,
        Map("changefeed" -> "true"), asOf = None, fromEpoch = Some(0L))
    }
    assert(e2.getMessage.contains("erosion floor"), e2.getMessage)
  }

  test("scd2 fast path matches the diff fallback row-for-row") {
    val dir = Files.createTempDirectory("cfio-eq").toString
    val sink = new Scd2Sink(dir, buckets = 4)
    assert(sink.merge(envBatch((1 to 20).map(k =>
      (k, s"n$k", "r")): _*), 0L))
    val b = envBatch((3, "u3", "u"), (4, null, "d"), (77, "new", "c"))
      .withColumn("source",
        struct((col("key.n_nationkey") + 500000L).as("pos")))
    assert(sink.merge(b, 1L))
    val fast = SinkChanges.changesFor(spark, "scd2", dir, Map.empty, 1L,
      Some(0L)).collect().map(_.toString).sorted
    // the reference result: the diff derivation (state-vs-state on key
    // + droppedAt tombstones), invoked directly
    val sink2 = new Scd2Sink(dir, buckets = 4)
    val cur = sink2.stateAt(spark, 1L).get
    val prev = sink2.stateAt(spark, 0L).get
    val diffChanged = cur.join(
        prev.select(col("key"), col("pos").as("__p")), Seq("key"), "left")
      .filter(col("__p").isNull || col("__p") =!= col("pos"))
      .drop("__p")
      .select(lit(1L).as("epoch"), col("op"), col("pos"),
        to_json(col("key")).as("key_json"),
        to_json(col("after")).as("after_json"))
    val dropped = sink2.droppedAt(spark, 1L, 0L).get
      .select(lit(1L).as("epoch"), lit("d").as("op"), col("pos"),
        to_json(col("key")).as("key_json"),
        lit(null).cast("string").as("after_json"))
    val slow = diffChanged.unionByName(dropped)
      .collect().map(_.toString).sorted
    assert(fast.toSeq == slow.toSeq,
      s"fast=${fast.mkString("|")} slow=${slow.mkString("|")}")
  }
}
