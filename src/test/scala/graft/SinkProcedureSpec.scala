package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ChangeFeedGen, Tables}
import graft.streaming.LsmMergeSink

/** SQL table-maintenance surface (`CALL graft.system.<proc>` — Spark 4
  * ProcedureCatalog, sinks/v2/SinkProcedures): compact folds LSM deltas
  * on demand, vacuum reclaims unreferenced artifacts (and erodes time
  * travel LOUDLY, never silently wrong), rebucket rewrites the layout
  * AND the stored `buckets` property so the table keeps loading.
  */
class SinkProcedureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private lazy val cat: String = {
    val c = "graft_pr"
    if (spark.conf.getOption(s"spark.sql.catalog.$c").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$c",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$c.root",
        Files.createTempDirectory("pr-cat").toString)
    }
    c
  }
  private def catRoot = spark.conf.get(s"spark.sql.catalog.$cat.root")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  /** Snapshot epoch 0 + update/delete epoch 1 through writeTo. */
  private def freshTable(kind: String,
                         props: Map[String, String]): String = {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val name = s"${kind}_" + java.util.UUID.randomUUID().toString.take(8)
    val w = feed.filter(col("op") === "r").writeTo(s"$cat.$kind.$name")
    props.foldLeft(w) { case (w, (k, v)) => w.tableProperty(k, v) }.create()
    feed.filter(col("op") =!= "r").writeTo(s"$cat.$kind.$name")
      .option("epoch", "1").append()
    name
  }

  test("CALL compact folds outstanding lsm deltas as a fresh epoch; " +
      "state is unchanged; a second CALL is a no-op") {
    val name = freshTable("lsm",
      Map("buckets" -> "8", "compactEvery" -> "100"))
    val before = canon(spark.sql(
      s"SELECT after.* FROM $cat.lsm.$name WHERE op <> 'd'"))
    val sink = new LsmMergeSink(s"$catRoot/lsm/$name", buckets = 8,
      compactEvery = 100)
    assert(sink.manifest.deltas.nonEmpty, "setup must leave deltas")

    val res = spark.sql(
      s"CALL $cat.system.compact(table => 'lsm.$name')").collect()
    assert(res.length == 1 && res(0).getBoolean(0) &&
      res(0).getLong(1) == 2L, res.toSeq.toString)
    assert(sink.manifest.deltas.isEmpty, "deltas must be folded")
    assert(sink.committedEpoch.contains(2L))
    assert(canon(spark.sql(
      s"SELECT after.* FROM $cat.lsm.$name WHERE op <> 'd'")) == before)

    // nothing outstanding: no-op, no epoch committed
    val res2 = spark.sql(
      s"CALL $cat.system.compact(table => 'lsm.$name')").collect()
    assert(res2.length == 1 && !res2(0).getBoolean(0) && res2(0).isNullAt(1))
    assert(sink.committedEpoch.contains(2L))
  }

  test("CALL vacuum reclaims unreferenced artifacts; eroded time travel " +
      "fails loudly; current read unchanged") {
    val name = freshTable("lsm",
      Map("buckets" -> "8", "compactEvery" -> "100"))
    spark.sql(s"CALL $cat.system.compact(table => 'lsm.$name')").collect()
    val before = canon(spark.sql(
      s"SELECT after.* FROM $cat.lsm.$name WHERE op <> 'd'"))

    val res = spark.sql(
      s"CALL $cat.system.vacuum(table => 'lsm.$name')").collect()
    assert(res.length == 1 && res(0).getInt(0) >= 2,
      s"compacted-away d0/d1 must be reclaimed: ${res.toSeq}")
    assert(canon(spark.sql(
      s"SELECT after.* FROM $cat.lsm.$name WHERE op <> 'd'")) == before)
    // epoch 0's manifest references vacuumed deltas: loud, not wrong
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.lsm.$name VERSION AS OF 0").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("vacuum"),
      s"expected a vacuumed-data error, got: ${e.getMessage}")
  }

  test("CALL vacuum on a full-kind table prunes versions below the tip; " +
      "eroded VERSION AS OF fails loudly, never an empty frame") {
    val name = freshTable("full", Map.empty)
    val dir = Paths.get(s"$catRoot/full/$name")
    assert(Files.isDirectory(dir.resolve("v0")))
    val before = canon(spark.sql(
      s"SELECT after.* FROM $cat.full.$name WHERE op <> 'd'"))
    val res = spark.sql(
      s"CALL $cat.system.vacuum(table => 'full.$name')").collect()
    assert(res.length == 1 && res(0).getInt(0) == 1, res.toSeq.toString)
    assert(!Files.exists(dir.resolve("v0")) &&
      Files.isDirectory(dir.resolve("v1")))
    assert(canon(spark.sql(
      s"SELECT after.* FROM $cat.full.$name WHERE op <> 'd'")) == before)
    // the version dirs ARE the full kind's history: epoch 0 existed and
    // was reclaimed — serving an empty frame would be silently wrong
    // (the other kinds' manifestAt raises the same way)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.full.$name VERSION AS OF 0").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("vacuum"),
      s"expected a vacuumed-data error, got: ${e.getMessage}")
  }

  test("CALL vacuum with retain_feed_epochs reclaims old changefeed " +
      "sidecars on bucketed/scd2; a predating feed read fails loudly; " +
      "retained epochs and the table read stay intact") {
    for (kind <- Seq("bucketed", "scd2")) {
      val name = freshTable(kind,
        Map("buckets" -> "8", "changefeed" -> "true"))
      val feed = ChangeFeedGen.standardFeed(
        Tables.load(spark, sfDir, "orders"), "orders")
      // two more sidecar-writing epochs beyond freshTable's 0 and 1
      for (e <- 2 to 3)
        feed.filter(col("op") === "u").limit(5).writeTo(s"$cat.$kind.$name")
          .option("epoch", e.toString).append()
      val dir = Paths.get(s"$catRoot/$kind/$name")
      assert((0 to 3).forall(e => Files.isDirectory(dir.resolve(s"c$e"))),
        s"$kind setup: all four sidecars must exist")
      val before = canon(spark.sql(
        s"SELECT after.* FROM $cat.$kind.$name WHERE op <> 'd'"))

      val res = spark.sql(s"CALL $cat.system.vacuum(" +
        s"table => '$kind.$name', retain_feed_epochs => 2)").collect()
      assert(res.length == 1 && res(0).getInt(1) == 2,
        s"$kind: c0+c1 must be reclaimed, got ${res.toSeq}")
      assert(!Files.exists(dir.resolve("c0")) &&
        !Files.exists(dir.resolve("c1")) &&
        !Files.exists(dir.resolve("c1.ddl")) &&
        Files.isDirectory(dir.resolve("c2")) &&
        Files.isDirectory(dir.resolve("c3")), s"$kind: wrong reclaim set")
      // the FEED floor file, not the version vacuum's `_floor`: feed
      // retention must not masquerade as version erosion (r15)
      assert(Files.readString(dir.resolve("_feed_floor")).trim == "2")
      assert(!Files.exists(dir.resolve("_floor")),
        s"$kind: feed-only vacuum must not write the version floor")

      // the retention promise is LOUD: a feed read starting below the
      // floor refuses (eroded), one at the floor serves epochs 2..3
      val tbl = s"$cat.$kind.`$name$$changes`"
      val e1 = intercept[Exception] {
        spark.read.option("fromEpoch", "1").table(tbl).collect()
      }
      assert(e1.getMessage.contains("erosion floor"), s"$kind: ${e1.getMessage}")
      val served = spark.read.option("fromEpoch", "2").table(tbl)
        .select("epoch").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(served == Seq(2L, 3L), s"$kind: $served")

      // a RESUMING stream whose frontier predates the floor is loud too
      val ckpt = Files.createTempDirectory(s"feedvac-$kind").toString
      val st = new graft.sinks.v2.SinkChangesMicroBatchStream(kind,
        dir.toString, Map("changefeed" -> "true"), ckpt)
      val e2 = intercept[IllegalStateException] {
        st.planInputPartitions(graft.sinks.v2.EpochOffset(0L),
          graft.sinks.v2.EpochOffset(3L))
      }
      assert(e2.getMessage.contains("erosion floor"), s"$kind: ${e2.getMessage}")

      // the TABLE read (state, not feed) is untouched by feed retention
      assert(canon(spark.sql(
        s"SELECT after.* FROM $cat.$kind.$name WHERE op <> 'd'")) == before)
      // idempotent: nothing further to reclaim
      val res2 = spark.sql(s"CALL $cat.system.vacuum(" +
        s"table => '$kind.$name', retain_feed_epochs => 2)").collect()
      assert(res2(0).getInt(1) == 0, s"$kind: ${res2.toSeq}")
    }
    // lsm refuses the argument: its deltas are state, not sidecars
    val lsm = freshTable("lsm", Map("buckets" -> "8"))
    val e3 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.vacuum(table => 'lsm.$lsm', " +
        "retain_feed_epochs => 2)").collect()
    }
    assert(e3.getMessage.contains("retain_feed_epochs does not apply"),
      e3.getMessage)
  }

  test("CALL rebucket rewrites the layout AND the stored buckets " +
      "property — the table keeps loading and merging afterwards") {
    val name = freshTable("bucketed", Map("buckets" -> "16"))
    val before = canon(spark.sql(
      s"SELECT after.* FROM $cat.bucketed.$name WHERE op <> 'd'"))
    val res = spark.sql(
      s"CALL $cat.system.rebucket(table => 'bucketed.$name', " +
        "buckets => 4)").collect()
    assert(res.length == 1 && res(0).getInt(0) == 16 &&
      res(0).getInt(1) == 4 && res(0).getLong(2) == 2L, res.toSeq.toString)
    // stored property follows the layout (without this, the next load's
    // layout check refuses the table)
    val meta = Files.readString(
      Paths.get(s"$catRoot/bucketed/$name/_table.ddl"))
    assert(meta.contains("buckets=4") && !meta.contains("buckets=16"), meta)
    assert(canon(spark.sql(
      s"SELECT after.* FROM $cat.bucketed.$name WHERE op <> 'd'")) == before)
    // and the table still ACCEPTS epochs under the new layout
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    feed.filter(col("op") === "u").limit(50)
      .writeTo(s"$cat.bucketed.$name").append()
    assert(spark.table(s"$cat.bucketed.$name").count() > 0)
  }

  test("ALTER TABLE SET TBLPROPERTIES flips the changefeed sidecar on " +
      "for an existing table; buckets and unknown keys are refused") {
    val name = freshTable("full", Map.empty)
    val dir = Paths.get(s"$catRoot/full/$name")
    assert(!Files.isDirectory(dir.resolve("c1")),
      "setup: no sidecars before the flip")
    spark.sql(s"ALTER TABLE $cat.full.$name " +
      "SET TBLPROPERTIES ('changefeed' = 'true')")
    // visible to the catalog surface
    assert(spark.sql(s"SHOW TBLPROPERTIES $cat.full.$name").collect()
      .exists(r => r.getString(0) == "changefeed" &&
        r.getString(1) == "true"))
    // the NEXT epoch (SQL DML rides sink.merge) writes its sidecar —
    // earlier epochs keep serving the diff fallback, Delta-CDF style
    spark.sql(s"UPDATE $cat.full.$name SET after.o_orderpriority = 'CF' " +
      "WHERE key.o_orderkey % 97 = 1")
    val tip = new graft.streaming.MergeSink(dir.toString)
      .committedEpoch.get
    assert(Files.isDirectory(dir.resolve(s"c$tip")),
      s"epoch $tip must have a change-delta sidecar after the flip")
    val cf = graft.sinks.v2.SinkChanges.changesFor(spark, "full",
      dir.toString, Map("changefeed" -> "true"), tip, Some(tip - 1))
    assert(cf.inputFiles.forall(_.contains(s"/c$tip/")),
      cf.inputFiles.mkString(";"))
    // UNSET turns the sidecar write back off
    spark.sql(s"ALTER TABLE $cat.full.$name " +
      "UNSET TBLPROPERTIES ('changefeed')")
    spark.sql(s"UPDATE $cat.full.$name SET after.o_orderpriority = 'NO' " +
      "WHERE key.o_orderkey % 97 = 2")
    assert(!Files.isDirectory(dir.resolve(s"c${tip + 1}")))
    // layout and unknown keys stay refused, loudly
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.full.$name " +
        "SET TBLPROPERTIES ('buckets' = '64')")
    }
    assert(e1.getMessage.contains("rebucket"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.full.$name " +
        "SET TBLPROPERTIES ('nope' = '1')")
    }
    assert(e2.getMessage.contains("settable"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.full.$name " +
        "SET TBLPROPERTIES ('changefeed' = 'maybe')")
    }
    assert(e3.getMessage.contains("true or false"), e3.getMessage)
  }

  test("procedure errors are loud and name the contract") {
    val name = freshTable("full", Map.empty)
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact(table => 'full.$name')").collect()
    }
    assert(e1.getMessage.contains("lsm"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.rebucket(table => 'full.$name', " +
        "buckets => 8)").collect()
    }
    assert(e2.getMessage.contains("bucket layout"), e2.getMessage)
    // Spark wraps an unresolvable procedure as FAILED_TO_LOAD_ROUTINE;
    // the catalog's message (naming the known procedures) is the cause
    val e3 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.nope(table => 'full.$name')").collect()
    }
    assert(e3.getMessage.contains("FAILED_TO_LOAD_ROUTINE"), e3.getMessage)
    assert(Iterator.iterate[Throwable](e3)(_.getCause).takeWhile(_ != null)
      .take(5).exists(c => Option(c.getMessage).exists(_.contains("vacuum"))),
      s"cause chain must name the known procedures: ${e3.getCause}")
    val e4 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.vacuum(table => 'lsm.missing')").collect()
    }
    assert(e4.getMessage.toLowerCase.contains("table"), e4.getMessage)
  }
}
