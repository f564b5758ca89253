package graft

import java.nio.file.Files
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Materialize
import graft.sources.{ChangeFeedGen, Tables}

/** DSv2 READ path of the sink catalog (sinks/v2/GraftSinkCatalog): a
  * sink table reads back as the latest envelope per key (log-compacted-
  * topic semantics), `VERSION AS OF` time-travels via the sinks'
  * retained manifests, pruning reaches the scan, and the strict write
  * contract rejects drifted feeds up front.
  */
class SinkCatalogReadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  private lazy val cat: String = {
    val c = "graft_rd"
    if (spark.conf.getOption(s"spark.sql.catalog.$c").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$c",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$c.root",
        Files.createTempDirectory("rd-cat").toString)
    }
    c
  }
  private def catRoot = spark.conf.get(s"spark.sql.catalog.$cat.root")

  private def freshTable(kind: String, table: String = "orders",
                         props: Map[String, String] =
                           Map("buckets" -> "8", "compactEvery" -> "100"))
      : (String, org.apache.spark.sql.DataFrame) = {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, table), table)
    val name = s"$cat.$kind.${table}_" +
      java.util.UUID.randomUUID().toString.take(8)
    val w = feed.filter(col("op") === "r").writeTo(name)
    props.foldLeft(w) { case (w, (k, v)) => w.tableProperty(k, v) }.create()
    feed.filter(col("op") =!= "r").writeTo(name).option("epoch", "1").append()
    (name, feed)
  }

  test("spark.table reads latest envelope per key; after.*/op<>'d' == view") {
    val (name, feed) = freshTable("lsm")
    val read = spark.table(name)
    assert(read.schema.fieldNames.toSeq ==
      Seq("key", "before", "after", "op", "source", "transaction", "ts_ms"))
    // live rows through SQL == the sink's own view == the oracle state
    val live = spark.sql(s"SELECT after.* FROM $name WHERE op <> 'd'")
    assert(canon(live) == canon(Materialize.latestState(feed)))
    // tombstones stay visible as op='d' (log-compacted-topic semantics)
    val dels = read.filter(col("op") === "d")
    assert(dels.count() > 0)
    assert(dels.filter(col("after").isNotNull).count() == 0,
      "delete rows must keep after NULL (struct conform must not " +
        "resurrect a null struct as a struct of nulls)")
    // source.pos survived the merge; other provenance reads null
    assert(read.filter(col("source.pos").isNull).count() == 0)
    assert(read.filter(col("source.connector").isNotNull).count() == 0)
    // the READ schema must be deep-nullable regardless of the stored
    // DDL's nullability: merged state carries nulls in columns the feed
    // declared NOT NULL (ts_ms, op on the feed side), and the zero-copy
    // bridge performs no runtime null checks — a non-nullable read
    // schema would let the scan projection read garbage instead of null
    def allNullable(st: org.apache.spark.sql.types.StructType): Boolean =
      st.fields.forall(f => f.nullable && (f.dataType match {
        case s: org.apache.spark.sql.types.StructType => allNullable(s)
        case _ => true
      }))
    assert(allNullable(read.schema), s"non-nullable read field in ${read.schema}")
    // ts_ms is NOT NULL in the stored DDL but unset in merged state: it
    // must read as NULL, not as a garbage zero
    assert(read.filter(col("ts_ms").isNotNull).count() == 0)
  }

  test("SQL aggregation over a sink table plans a pruned v1 scan") {
    import org.apache.spark.sql.execution.{RowDataSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val (name, _) = freshTable("lsm")
    val agg = spark.sql(
      s"SELECT op, count(*) AS n FROM $name GROUP BY op")
    val total = agg.collect().map(_.getLong(1)).sum // finalize the AQE plan
    def scans(p: SparkPlan): Seq[Seq[String]] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: RowDataSourceScanExec => Seq(s.output.map(_.name))
      case other => other.children.flatMap(scans)
    }
    val sc = scans(agg.queryExecution.executedPlan)
    assert(sc.nonEmpty, "expected the v1 read bridge scan")
    assert(sc.head == Seq("op"),
      s"scan must prune to the queried column, got ${sc.head}")
    assert(total == spark.table(name).count())
  }

  test("VERSION AS OF reproduces the snapshot epoch (lsm + full kinds)") {
    for (kind <- Seq("lsm", "full")) {
      val (name, feed) = freshTable(kind, "region")
      val snap = spark.sql(
        s"SELECT after.* FROM $name VERSION AS OF 0 WHERE op <> 'd'")
      assert(canon(snap) ==
        canon(feed.filter(col("op") === "r").select(col("after.*"))),
        s"kind=$kind VERSION AS OF 0 must be the snapshot")
      // epoch between commits resolves to the newest committed <= it
      assert(canon(spark.sql(
        s"SELECT after.* FROM $name VERSION AS OF 1 WHERE op <> 'd'")) ==
        canon(Materialize.latestState(feed)), s"kind=$kind at tip")
      // a pinned table refuses writes
      val e = intercept[Exception] {
        feed.writeTo(s"$name VERSION AS OF 0").append()
      }
      assert(e.getMessage != null)
    }
  }

  test("scd2 tables read current rows; VERSION AS OF re-opens the past") {
    val (name, feed) = freshTable("scd2", "nation",
      Map("buckets" -> "4", "compactEvery" -> "100"))
    val read = spark.table(name)
    // current state: open versions only, op='r', after = live payload
    assert(canon(read.filter(col("op") =!= "d").select(col("after.*"))) ==
      canon(Materialize.latestState(feed)))
    // as of the snapshot commit every key was open at its read image
    assert(canon(spark.sql(
      s"SELECT after.* FROM $name VERSION AS OF 0")) ==
      canon(feed.filter(col("op") === "r").select(col("after.*"))))
  }

  test("filter pushdown: predicates reach the scan and drop rows inside " +
      "the bridge; residual/nested filters stay post-scan") {
    val (name, feed) = freshTable("lsm", "customer")
    val q = spark.sql(
      s"SELECT key, op FROM $name WHERE op <> 'd' AND after.c_custkey >= 0")
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    // the top-level op predicate is pushed into the v1 scan; the nested
    // after.c_custkey one is not translatable and stays post-scan
    assert(p.contains("PushedFilters"), s"no pushdown marker in:\n$p")
    assert(p.replaceAll("\\s", "").contains("Not(EqualTo(op,d))"),
      s"op filter not pushed:\n$p")
    assert(!p.replaceAll("\\s", "").contains("PushedFilters:[].*c_custkey"),
      "nested filter must not be claimed as pushed")
    // pushdown == post-scan filtering, row for row
    val want = Materialize.latestState(feed).count()
    assert(q.count() == want)
    // a key-range read returns exactly the ranged slice
    val ranged = spark.sql(
      s"SELECT after.c_custkey AS k FROM $name " +
        "WHERE op <> 'd' AND ts_ms IS NULL")
    assert(ranged.count() == want) // ts_ms reads null on state rows
  }

  test("scd2 $history metadata table: full history via SQL, as-of composes") {
    val (name, feed) = freshTable("scd2", "orders",
      Map("buckets" -> "8", "compactEvery" -> "100"))
    val ident = name.split('.').last
    val hist = s"$cat.scd2.`$ident$$history`"
    // full history through SQL == the batch history-table operator
    assert(canon(spark.sql(s"SELECT * FROM $hist")) ==
      canon(graft.operators.Scd2.historyTable(feed)))
    // as of the snapshot commit: every key one open version at its read
    val h0 = spark.sql(s"SELECT * FROM $hist VERSION AS OF 0")
    assert(h0.filter(col("is_current") === false).count() == 0)
    assert(canon(h0.drop("valid_from_pos", "valid_to_pos", "is_current")) ==
      canon(feed.filter(col("op") === "r").select(col("after.*"))))
    // pruning: history is read-only and metadata suffixes stay scoped
    intercept[AnalysisException] {
      spark.table(s"$cat.lsm.`${ident}$$history`")
    }
    intercept[AnalysisException] {
      spark.table(s"$cat.scd2.`${ident}$$snapshots`")
    }
    // malformed '$' shapes are NoSuchTableException, never a silent
    // fallback to the base table: a trailing '$' (Java split would drop
    // the empty suffix) and a multi-'$' name (would skip validation)
    intercept[AnalysisException] {
      spark.table(s"$cat.scd2.`$ident$$`")
    }
    intercept[AnalysisException] {
      spark.table(s"$cat.scd2.`$ident$$history$$x`")
    }
  }

  test("strict write contract: extra and retyped columns fail analysis") {
    val (name, feed) = freshTable("lsm", "nation",
      Map("buckets" -> "4", "compactEvery" -> "100"))
    val extra = intercept[AnalysisException] {
      feed.withColumn("bogus", lit(1)).writeTo(name).append()
    }
    assert(extra.getMessage.contains("bogus"))
    val retyped = intercept[AnalysisException] {
      feed.withColumn("ts_ms", col("ts_ms").cast("string"))
        .writeTo(name).append()
    }
    assert(retyped.getMessage.contains("ts_ms"))
    // nested payload evolution (K4) still flows through: an ADDED after
    // field is not drift — the table stays writable
    val evolved = feed.filter(col("op") === "u").withColumn("after",
      when(col("after").isNull, lit(null).cast(
        feed.schema("after").dataType.asInstanceOf[
          org.apache.spark.sql.types.StructType].add("n_extra", "int")))
        .otherwise(struct(col("after.*"), lit(7).as("n_extra"))))
      .withColumn("before", lit(null).cast(
        feed.schema("before").dataType.asInstanceOf[
          org.apache.spark.sql.types.StructType].add("n_extra", "int")))
    evolved.writeTo(name).option("epoch", "2").append()
    assert(spark.sql(s"SELECT count(*) FROM $name").head.getLong(0) > 0)
  }

  test("streaming foreachBatch drives catalog epochs exactly-once; " +
      "a restarted stream replays harmlessly") {
    import graft.streaming.StreamingMaterialize
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "nation"), "nation")
    val tmp = Files.createTempDirectory("wt-stream")
    val transport = s"$tmp/transport"
    StreamingMaterialize.writeTransport(feed, transport, files = 4)
    val tbl = "nation_" + java.util.UUID.randomUUID().toString.take(8)
    val name = s"$cat.lsm.$tbl"
    // the catalog table must exist before the stream appends epochs
    feed.limit(0).writeTo(name).tableProperty("buckets", "4").create()
    val schema = spark.read.parquet(transport).schema
    def runStream(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(transport)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, e: Long) =>
          // epoch = batchId + 1: the create() wrote epoch 0
          batch.writeTo(name).option("epoch", (e + 1).toString).append()
          ()
        }
        .start()
      q.awaitTermination()
    }
    runStream(s"$tmp/ckpt")
    val after = canon(spark.sql(s"SELECT after.* FROM $name WHERE op <> 'd'"))
    assert(after == canon(Materialize.latestState(feed)))
    // a FULL replay from a fresh checkpoint re-delivers every epoch;
    // the sink's replay guard drops them all — state unchanged
    runStream(s"$tmp/ckpt2")
    assert(canon(spark.sql(s"SELECT after.* FROM $name WHERE op <> 'd'")) ==
      after)
  }

  test("$changes: batch changefeed reconstructs the table; VERSION AS OF " +
      "bounds the feed; every kind serves it") {
    val (name, feed) = freshTable("lsm")
    val ident = name.split('.').last
    val chg = spark.sql(s"SELECT * FROM $cat.lsm.`$ident$$changes`")
    assert(chg.schema.fieldNames.toSeq ==
      Seq("epoch", "op", "pos", "key_json", "after_json"))
    assert(chg.select(col("epoch")).distinct().count() == 2)
    // applying latest-by-pos over the full feed == the table's batch read
    def materialized(df: org.apache.spark.sql.DataFrame,
                     ofTable: String = name) = {
      val keySchema = spark.table(ofTable).schema("key").dataType
      val afterSchema = spark.table(ofTable).schema("after").dataType
      graft.expressions.GraftFunctions.register(spark)
      df.select(from_json(col("key_json"), keySchema).as("key"),
          from_json(col("after_json"), afterSchema).as("after"),
          col("op"), col("pos"))
        .groupBy(col("key"))
        .agg(graft.expressions.GraftFunctions.latestByPos(
          struct(col("after"), col("op")), col("pos")).as("e"))
        .filter(col("e.op") =!= "d").select(col("e.after.*"))
    }
    assert(canon(materialized(chg)) == canon(Materialize.latestState(feed)))
    // pinned feed: only the snapshot epoch's changes
    val chg0 = spark.sql(
      s"SELECT * FROM $cat.lsm.`$ident$$changes` VERSION AS OF 0")
    assert(canon(materialized(chg0)) ==
      canon(feed.filter(col("op") === "r").select(col("after.*"))))
    // the generic (diff-based) derivation: full + bucketed + scd2 kinds
    Seq("full", "bucketed", "scd2").foreach { kind =>
      val (n2, f2) = freshTable(kind, "region")
      val i2 = n2.split('.').last
      val c2 = spark.sql(s"SELECT * FROM $cat.$kind.`$i2$$changes`")
      assert(canon(materialized(c2, n2)) ==
        canon(Materialize.latestState(f2)),
        s"kind $kind changefeed did not reconstruct the table")
    }
  }

  test("$changes streaming spool rides the Hadoop FS API: an explicit " +
      "file: URI checkpoint works and the spool lands under it") {
    import org.apache.spark.sql.streaming.Trigger
    val (name, _) = freshTable("lsm")
    val ident = name.split('.').last
    // an explicitly URI-form checkpoint (what a cluster passes for
    // hdfs://…/s3a://… locations; java.nio Paths would choke on it)
    val ckptUri = "file:" +
      Files.createTempDirectory("chg-hfs").toString + "/ckpt"
    val qn = s"cfh_${System.nanoTime()}"
    val q = spark.readStream.table(s"$cat.lsm.`$ident$$changes`")
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", ckptUri)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // delivered rows == the batch table read
    assert(canon(spark.table(qn)) ==
      canon(spark.sql(s"SELECT * FROM $cat.lsm.`$ident$$changes`")))
    // Hadoop Path round trip: the spool landed under the URI checkpoint
    // (Spark hands the stream its per-source subdir, <ckpt>/sources/<i>)
    val root = new org.apache.hadoop.fs.Path(ckptUri)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(root, true)
    var spooled = Vector.empty[String]
    while (it.hasNext) {
      val p = it.next().getPath.toString
      if (p.contains("/graft-changes/e")) spooled :+= p
    }
    assert(spooled.nonEmpty, s"no spool files under $ckptUri")
  }

  test("$changes: streaming read delivers one micro-batch per epoch and " +
      "resumes at the epoch frontier across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val (name, feed) = freshTable("lsm")
    val ident = name.split('.').last
    val tmp = Files.createTempDirectory("chg-stream").toString
    val gotRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def runStream(): Unit = {
      // foreachBatch (checkpoint-recoverable, unlike the memory sink):
      // accumulate every delivered change row
      val q = spark.readStream.table(s"$cat.lsm.`$ident$$changes`")
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          canon(batch).foreach(gotRows.add)
          ()
        }
        .start()
      q.awaitTermination()
    }
    runStream()
    import scala.jdk.CollectionConverters._
    assert(gotRows.asScala.nonEmpty)
    // delivered rows == the batch table read (the oracle shape)
    val batchChg = spark.sql(s"SELECT * FROM $cat.lsm.`$ident$$changes`")
    assert(gotRows.asScala.toSeq.sorted == canon(batchChg))
    // a NEW epoch after the first drain arrives ALONE on restart (exact
    // resume at the epoch frontier, no re-delivery of epochs 0/1)
    val sizeAfterFirst = gotRows.size()
    val extra = feed.filter(col("op") === "d")
    extra.writeTo(name).option("epoch", "7").append()
    runStream()
    val resumed = gotRows.asScala.toSeq.drop(sizeAfterFirst)
    // canon sorts columns: (after_json, epoch, key_json, op, pos)
    assert(resumed.nonEmpty &&
      resumed.forall(_.split("\\|")(1) == "7"),
      s"resume must deliver only epoch 7 rows, got: ${resumed.take(3)}")
    assert(resumed.size == extra.select(col("key")).distinct().count())
    // and a third run with nothing new delivers nothing
    val sizeAfterSecond = gotRows.size()
    runStream()
    assert(gotRows.size() == sizeAfterSecond)
  }

  test("SQL DELETE tombstones matched rows as a new epoch; TRUNCATE " +
      "empties; time travel and the changefeed still see prior state") {
    val (name, feed) = freshTable("lsm")
    val tipBefore = spark.sql(s"SELECT max(source.pos) FROM $name")
      .head.getLong(0)
    // nested key + payload refs push into deleteWhere, incl. disjunction
    spark.sql(s"DELETE FROM $name WHERE key.o_orderkey < 500 " +
      "OR after.o_orderstatus = 'P'")
    val live = spark.sql(s"SELECT after.* FROM $name WHERE op <> 'd'")
    val want = Materialize.latestState(feed)
      .filter(!(col("o_orderkey") < 500 || col("o_orderstatus") === "P"))
    assert(canon(live) == canon(want))
    // the delete is an EPOCH: VERSION AS OF 1 still reads pre-delete
    // state, and its tombstones carry a position past the old tip
    assert(canon(spark.sql(
      s"SELECT after.* FROM $name VERSION AS OF 1 WHERE op <> 'd'")) ==
      canon(Materialize.latestState(feed)))
    val ident = name.split('.').last
    val chg = spark.sql(s"SELECT * FROM $cat.lsm.`$ident$$changes` " +
      s"WHERE epoch = 2")
    assert(chg.filter(col("op") =!= "d").count() == 0)
    assert(chg.filter(col("pos") <= tipBefore).count() == 0,
      "tombstones must outrank every live row's position")
    // repeated DELETE of the same predicate adds no new tombstones
    val epochs = spark.sql(s"SELECT max(epoch) FROM $cat.lsm.`$ident$$changes`")
      .head.getLong(0)
    spark.sql(s"DELETE FROM $name WHERE key.o_orderkey < 500")
    assert(spark.sql(s"SELECT max(epoch) FROM $cat.lsm.`$ident$$changes`")
      .head.getLong(0) == epochs,
      "re-deleting already-tombstoned keys must not commit an epoch")
    // TRUNCATE = DELETE of everything (AlwaysTrue through SupportsDelete)
    spark.sql(s"TRUNCATE TABLE $name")
    assert(spark.sql(s"SELECT * FROM $name WHERE op <> 'd'").count() == 0)
    // a pinned (time-travel) table refuses deletes
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $name VERSION AS OF 1 WHERE op <> 'x'")
    }
    assert(e.getMessage.toLowerCase.contains("version as of") ||
      e.getMessage.toLowerCase.contains("time travel"), e.getMessage)
  }

  test("DELETE predicates outside the pushable shape run ROW-LEVEL with " +
      "full semantics — never a narrowed metadata delete") {
    // r11 pinned these as errors; r12 implements UPDATE/MERGE/row-level
    // DELETE via SupportsRowLevelOperations (SinkDmlSpec covers them).
    // What must STILL hold: a partially-convertible predicate is never
    // narrowed — Spark's own v2->v1 bridge would silently drop the
    // unconvertible disjunct (measured in r11). With the row-level path
    // the statement now succeeds and applies BOTH disjuncts exactly.
    val (name, _) = freshTable("lsm", "nation")
    val liveBefore = spark.sql(s"SELECT * FROM $name WHERE op <> 'd'").count()
    assert(liveBefore > 0)
    spark.sql(s"DELETE FROM $name " +
      "WHERE key.n_nationkey % 2 = 0 OR key.n_nationkey >= 0")
    // % 2 = 0 OR >= 0 covers every nation key: all rows tombstoned
    assert(spark.sql(s"SELECT * FROM $name WHERE op <> 'd'").count() == 0,
      "both disjuncts must apply — narrowing would leave rows live")
  }

  test("ALTER TABLE ADD COLUMN after.<c>: metadata-only payload " +
      "evolution — old rows read null, DML fills it, the rest is refused") {
    val (name, _) = freshTable("lsm")
    spark.sql(s"ALTER TABLE $name ADD COLUMNS (after.note STRING)")
    // stored DDL evolved; existing state conforms — the new column reads
    // null with zero data rewrite (Delta ADD COLUMN semantics)
    val vals = spark.sql(s"SELECT after.note FROM $name WHERE op <> 'd'")
      .collect()
    assert(vals.nonEmpty && vals.forall(_.isNullAt(0)))
    // the evolved column is writable through the DML path
    spark.sql(s"UPDATE $name SET after.note = 'evolved' " +
      "WHERE key.o_orderkey = 32")
    val got = spark.sql(s"SELECT after.note FROM $name " +
      "WHERE key.o_orderkey = 32").collect()
    assert(got.length == 1 && got.head.getString(0) == "evolved")
    // duplicate add fails with the column named
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE $name ADD COLUMNS (after.note STRING)")
    }
    assert(dup.getMessage.contains("note"), dup.getMessage)
    // everything else stays pinned-refused: top-level adds, bookkeeping
    // structs, drops and renames follow the feed
    for (stmt <- Seq(
        s"ALTER TABLE $name ADD COLUMNS (extra STRING)",
        s"ALTER TABLE $name ADD COLUMNS (source.x INT)",
        s"ALTER TABLE $name DROP COLUMN op",
        s"ALTER TABLE $name RENAME COLUMN op TO operation")) {
      val e = intercept[Exception] { spark.sql(stmt) }
      assert(e.getMessage.contains("schema follows the feed") ||
        e.getMessage.toLowerCase.contains("unsupported"),
        s"$stmt => ${e.getMessage}")
    }
  }

  test("catalog ergonomics: SHOW NAMESPACES / SHOW TABLES / DESCRIBE") {
    val (name, _) = freshTable("lsm", "region")
    val ident = name.split('.').last
    // the namespaces are exactly the sink kinds
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).sorted.toSeq ==
      Seq("bucketed", "full", "lsm", "scd2"))
    // SHOW TABLES lists created tables in the kind
    val listed = spark.sql(s"SHOW TABLES IN $cat.lsm").collect()
      .map(_.getString(1))
    assert(listed.contains(ident), s"missing $ident in ${listed.toSeq}")
    // an unknown kind is an analysis error, not an empty listing
    intercept[AnalysisException] {
      spark.sql(s"SHOW TABLES IN $cat.nope").collect()
    }
    // DESCRIBE surfaces the envelope columns
    val desc = spark.sql(s"DESCRIBE TABLE $name").collect()
      .map(_.getString(0))
    Seq("key", "before", "after", "op", "source").foreach(c =>
      assert(desc.contains(c), s"DESCRIBE missing $c: ${desc.toSeq}"))
    // DESCRIBE NAMESPACE carries the kind's strategy comment
    val nsDesc = spark.sql(s"DESCRIBE NAMESPACE $cat.lsm").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nsDesc.get("Comment").exists(_.contains("merge-on-read")),
      nsDesc.toString)
  }

  test("TIMESTAMP AS OF resolves commit times to epochs") {
    val (name, feed) = freshTable("lsm", "region")
    val dir = java.nio.file.Paths.get(catRoot, "lsm", name.split('.').last)
    // pin deterministic commit times: epoch 0 at 22:13:20Z, epoch 1 a
    // minute later. The PERSISTED sidecar is the commit time of record;
    // mtimes are set to garbage to prove a copy/restore (which rewrites
    // every mtime) cannot remap TIMESTAMP AS OF to wrong epochs.
    val t0 = 1700000000000L
    // overwrite through SinkFs, not java.nio: the sink wrote these
    // through Hadoop's checksummed local FS, so a raw overwrite would
    // leave a stale .crc sidecar and fail the next read's checksum
    graft.streaming.SinkFs.writeString(new org.apache.hadoop.fs.Path(
      dir.toString, "m0.manifest.committs"), t0.toString)
    graft.streaming.SinkFs.writeString(new org.apache.hadoop.fs.Path(
      dir.toString, "m1.manifest.committs"), (t0 + 60000L).toString)
    Seq("m0.manifest", "m1.manifest").foreach { mf =>
      java.nio.file.Files.setLastModifiedTime(dir.resolve(mf),
        java.nio.file.attribute.FileTime.fromMillis(t0 + 9999999999L))
    }
    // between the two commits -> the snapshot epoch
    val mid = spark.sql(s"SELECT after.* FROM $name " +
      "TIMESTAMP AS OF '2023-11-14 22:13:30' WHERE op <> 'd'")
    assert(canon(mid) ==
      canon(feed.filter(col("op") === "r").select(col("after.*"))))
    // after both -> the tip
    assert(canon(spark.sql(s"SELECT after.* FROM $name " +
      "TIMESTAMP AS OF '2023-11-14 22:15:00' WHERE op <> 'd'")) ==
      canon(Materialize.latestState(feed)))
    // before the first commit -> error
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $name TIMESTAMP AS OF '2023-11-14 22:13:00'")
        .collect()
    }
    assert(e.getMessage.contains("no version"),
      s"unexpected: ${e.getMessage}")
  }

  test("uncommitted versions are invisible: a manifest/dir written past " +
      "the CURRENT pointer (swap-crash window) never time-travels") {
    import graft.streaming.{LsmMergeSink, MergeSink}
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "region"), "region")
    // LSM: fake a crash between manifest write and pointer swap by
    // copying the committed manifest to a higher epoch number
    val ldir = Files.createTempDirectory("crash-lsm")
    val lsm = new LsmMergeSink(ldir.toString, buckets = 4)
    lsm.merge(feed.filter(col("op") === "r"), 0L)
    Files.copy(ldir.resolve("m0.manifest"), ldir.resolve("m7.manifest"))
    assert(lsm.versions == Seq(0L), s"got ${lsm.versions}")
    assert(lsm.committedEpoch.contains(0L))
    // full sink: an orphaned v<epoch> dir past the pointer is not a version
    val mdir = Files.createTempDirectory("crash-full")
    val full = new MergeSink(mdir.toString)
    full.merge(feed.filter(col("op") === "r"), 0L)
    Files.createDirectories(mdir.resolve("v9"))
    assert(full.versions == Seq(0L), s"got ${full.versions}")
    assert(full.stateAt(spark, 9L).get.count() ==
      full.state(spark).get.count(), "stateAt(9) must resolve to epoch 0")
  }

  test("create-time validation: bad properties and reserved names fail " +
      "at CREATE; an empty scd2 table and its $history read as empty") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "region"), "region")
    def create(n: String, prop: (String, String)): Unit =
      feed.limit(0).writeTo(s"$cat.lsm.$n")
        .tableProperty(prop._1, prop._2).create()
    intercept[Exception] { create("bad0_" + System.nanoTime(), "buckets" -> "0") }
    intercept[Exception] {
      create("badbig_" + System.nanoTime(), "buckets" -> "99999999999") }
    intercept[Exception] {
      feed.limit(0).writeTo(s"$cat.lsm.`bad$$history`").create() }
    // empty scd2 table: both the table and its $history read as empty
    val t = "empty_" + java.util.UUID.randomUUID().toString.take(8)
    feed.limit(0).writeTo(s"$cat.scd2.$t").create()
    assert(spark.table(s"$cat.scd2.$t").count() == 0)
    assert(spark.sql(s"SELECT * FROM $cat.scd2.`$t$$history`").count() == 0)
    // rename cannot produce a metadata-suffix name
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.scd2.$t RENAME TO scd2.`$t$$history`")
    }
  }

  test("catalog contract: unknown namespaces no-op on DROP, not-found on read") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.badns.t") // must not throw
    val e = intercept[AnalysisException] { spark.table(s"$cat.badns.t") }
    assert(e.getCondition != null &&
      e.getCondition.contains("TABLE_OR_VIEW_NOT_FOUND"))
    val e2 = intercept[AnalysisException] { spark.table(s"$cat.lsm.nope_missing") }
    assert(e2.getCondition != null &&
      e2.getCondition.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }
}
