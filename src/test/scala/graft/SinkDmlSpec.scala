package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ChangeFeedGen, Tables}

/** SQL UPDATE / MERGE INTO / row-level DELETE on catalog tables
  * (sinks/v2/RowLevelDml): the statement's delta commits as ONE NEW
  * EPOCH of envelopes through the sink merge — op synthesized from the
  * operation kind, before always null (the sinks' reduced state drops
  * pre-images — synthesizing one would cost a key-join only for the
  * merge to discard it), source.pos past the tip (tombstones at tip+1,
  * data rows at tip+2) — so DML composes with time travel and the
  * changefeed instead of rewriting state in place.
  */
class SinkDmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private lazy val cat: String = {
    val c = "graft_dml"
    if (spark.conf.getOption(s"spark.sql.catalog.$c").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$c",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$c.root",
        Files.createTempDirectory("dml-cat").toString)
    }
    c
  }

  private def freshTable(kind: String = "lsm", table: String = "nation")
      : String = {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, table), table)
    val name = s"$cat.$kind.${table}_" +
      java.util.UUID.randomUUID().toString.take(8)
    feed.filter(col("op") === "r").writeTo(name)
      .tableProperty("buckets", "8").create()
    feed.filter(col("op") =!= "r").writeTo(name)
      .option("epoch", "1").append()
    name
  }

  test("UPDATE with nested SET commits an op='u' epoch; prior version " +
      "still reads the old value") {
    val name = freshTable()
    val before = spark.sql(
      s"SELECT after.n_name FROM $name WHERE key.n_nationkey = 3 " +
        "AND op <> 'd'").collect().map(_.getString(0))
    assert(before.length == 1 && before.head != "dml-updated")
    val versions = spark.sql(s"SELECT * FROM $name VERSION AS OF 1")

    spark.sql(s"UPDATE $name SET after.n_name = 'dml-updated' " +
      "WHERE key.n_nationkey = 3")

    val row = spark.sql(
      s"SELECT op, after.n_name AS a, source.pos " +
        s"FROM $name WHERE key.n_nationkey = 3").collect()
    assert(row.length == 1)
    assert(row.head.getString(0) == "u")
    assert(row.head.getString(1) == "dml-updated")
    // other keys untouched
    val others = spark.sql(
      s"SELECT count(*) FROM $name WHERE after.n_name = 'dml-updated'")
      .head.getLong(0)
    assert(others == 1)
    // time travel: the pre-statement version still reads the old value
    val old = spark.sql(
      s"SELECT after.n_name FROM $name VERSION AS OF 1 " +
        "WHERE key.n_nationkey = 3 AND op <> 'd'").head.getString(0)
    assert(old == before.head)
    assert(versions.count() > 0)
  }

  test("row-level DELETE handles predicates the metadata path cannot " +
      "(no silent narrowing, full semantics)") {
    val name = freshTable()
    val live = spark.sql(s"SELECT key.n_nationkey AS k FROM $name " +
      "WHERE op <> 'd'").collect().map(_.getInt(0)).toSet
    val evens = live.filter(_ % 2 == 0)
    assert(evens.nonEmpty)
    // % is outside the pushable v2-predicate shape -> row-level path
    spark.sql(s"DELETE FROM $name WHERE key.n_nationkey % 2 = 0")
    val after = spark.sql(s"SELECT key.n_nationkey AS k FROM $name " +
      "WHERE op <> 'd'").collect().map(_.getInt(0)).toSet
    assert(after == live -- evens)
    // deleted keys read back as tombstones, not vanished rows
    val tomb = spark.sql(s"SELECT key.n_nationkey AS k FROM $name " +
      "WHERE op = 'd'").collect().map(_.getInt(0)).toSet
    assert(evens.subsetOf(tomb))
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert " +
      "commit as one epoch") {
    val name = freshTable()
    val maxKey = spark.sql(s"SELECT max(key.n_nationkey) FROM $name")
      .head.getInt(0)
    spark.range(3).select(
      (col("id") + lit(maxKey - 1)).cast("int").as("nk"),
      concat(lit("merged-"), col("id")).as("cmt"))
      .createOrReplaceTempView("dml_src")

    spark.sql(
      s"""MERGE INTO $name t USING dml_src s
         |ON t.key.n_nationkey = s.nk
         |WHEN MATCHED AND s.nk = $maxKey THEN DELETE
         |WHEN MATCHED THEN UPDATE SET t.after.n_name = s.cmt
         |WHEN NOT MATCHED THEN INSERT (key, after) VALUES
         |  (named_struct('n_nationkey', s.nk),
         |   named_struct('n_nationkey', s.nk, 'n_name', s.cmt,
         |                'n_regionkey', CAST(0 AS INT)))
         |""".stripMargin)

    val got = spark.sql(
      s"SELECT key.n_nationkey AS k, op, after.n_name AS c FROM $name " +
        s"WHERE key.n_nationkey >= ${maxKey - 1} ORDER BY k").collect()
    assert(got.length == 3, got.mkString(";"))
    // maxKey-1: matched, updated
    assert(got(0).getString(1) == "u" && got(0).getString(2) == "merged-0")
    // maxKey: matched, deleted
    assert(got(1).getString(1) == "d")
    // maxKey+1: not matched, inserted
    assert(got(2).getString(1) == "c" && got(2).getString(2) == "merged-2")
  }

  test("key-changing UPDATE is a re-key: tombstone(old) + op='c'(new)") {
    val name = freshTable()
    val maxKey = spark.sql(s"SELECT max(key.n_nationkey) FROM $name")
      .head.getInt(0)
    val newKey = maxKey + 100
    spark.sql(s"UPDATE $name SET key.n_nationkey = $newKey, " +
      s"after.n_nationkey = $newKey WHERE key.n_nationkey = 1")
    val oldRow = spark.sql(
      s"SELECT op FROM $name WHERE key.n_nationkey = 1").collect()
    assert(oldRow.length == 1 && oldRow.head.getString(0) == "d",
      "old key must be tombstoned")
    val newRow = spark.sql(
      s"SELECT op, after.n_nationkey FROM $name " +
        s"WHERE key.n_nationkey = $newKey").collect()
    assert(newRow.length == 1 && newRow.head.getString(0) == "c")
    assert(newRow.head.getInt(1) == newKey)
  }

  test("DML epochs ride the changefeed and bump the version index") {
    val name = freshTable()
    val versionsBefore = spark.sql(
      s"SELECT count(DISTINCT pos) FROM ${changes(name)}").head.getLong(0)
    spark.sql(s"UPDATE $name SET after.n_name = 'cf' " +
      "WHERE key.n_nationkey = 2")
    val cf = spark.sql(
      s"SELECT op, key_json FROM ${changes(name)} WHERE epoch = 2")
      .collect()
    assert(cf.length == 1 && cf.head.getString(0) == "u" &&
      cf.head.getString(1).contains("2"), cf.mkString(";"))
    assert(versionsBefore > 0)
  }

  private def changes(name: String): String = {
    val parts = name.split('.')
    s"${parts(0)}.${parts(1)}.`${parts(2)}$$changes`"
  }

  test("the UPDATE's WHERE pushes into the DML scan (100 TB shape: " +
      "scan a predicate, not a table)") {
    val name = freshTable()
    // plan WITHOUT executing: the WriteDelta's child scan must carry
    // the pushable disjunct-free predicate
    val parsed = spark.sessionState.sqlParser.parsePlan(
      s"UPDATE $name SET after.n_name = 'x' WHERE key.n_nationkey = 3")
    val physical =
      spark.sessionState.executePlan(parsed).executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.replaceAll("\\s", "").matches(
        "(?s).*PushedFilters:\\[[^\\]]*n_nationkey[^\\]]*\\].*"),
      s"UPDATE predicate not pushed:\n$physical")
  }

  test("INSERT INTO appends an epoch when the query matches the " +
      "envelope by name; a drifted shape fails analysis (strict contract)") {
    val name = freshTable()
    spark.sql(
      s"""INSERT INTO $name
         |SELECT named_struct('n_nationkey', CAST(900 AS INT)) AS key,
         |       before,
         |       named_struct('n_nationkey', CAST(900 AS INT),
         |                    'n_name', 'ins',
         |                    'n_regionkey', after.n_regionkey) AS after,
         |       'c' AS op, source, `transaction`, ts_ms
         |FROM $name WHERE key.n_nationkey = 1
         |""".stripMargin)
    val row = spark.sql(s"SELECT op, after.n_name FROM $name " +
      "WHERE key.n_nationkey = 900").collect()
    assert(row.length == 1 && row.head.getString(0) == "c" &&
      row.head.getString(1) == "ins", row.mkString(";"))
    // missing envelope columns fail analysis — INSERT INTO rides the
    // same strict write contract as writeTo.append
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $name SELECT key, after FROM $name")
    }
    assert(e.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE") ||
      e.getMessage.contains("CANNOT_FIND_DATA") ||
      e.getMessage.toLowerCase.contains("not enough data columns"),
      e.getMessage)
  }

  test("scd2 $changes emits delete tombstones at the true closing " +
      "position — latest-by-pos over the feed reconstructs the table") {
    val name = freshTable("scd2")
    spark.sql(s"DELETE FROM $name WHERE key.n_nationkey = 4")
    val cf = spark.table(changes(name))
      .select(col("epoch"), col("op"), col("pos"),
        get_json_object(col("key_json"), "$.n_nationkey").cast("int")
          .as("k"))
    // the delete epoch carries an op='d' row for the key (scd2's state
    // has no row for it — the tombstone is synthesized from the closed
    // interval, at its true valid_to_pos)
    val dels = cf.filter(col("op") === "d" && col("k") === 4).collect()
    assert(dels.length == 1, cf.collect().mkString(";"))
    // reconstruction: latest-by-pos over the whole feed == batch live keys
    val reconstructed = cf
      .groupBy(col("k"))
      .agg(max_by(col("op"), col("pos")).as("last_op"))
      .filter(col("last_op") =!= "d")
      .collect().map(_.getInt(0)).toSet
    val live = spark.sql(s"SELECT key.n_nationkey FROM $name " +
      "WHERE op <> 'd'").collect().map(_.getInt(0)).toSet
    assert(reconstructed == live, s"feed=$reconstructed table=$live")
    assert(!reconstructed.contains(4))
  }

  test("DML after a delete-at-tip outranks the delete (scd2 tipPos " +
      "includes closing positions)") {
    val name = freshTable("scd2")
    // delete is the newest event; its closing position is the true tip
    spark.sql(s"DELETE FROM $name WHERE key.n_nationkey = 2")
    // re-insert the key via MERGE; its epoch pos must exceed the
    // delete's closing pos or pos-ordered consumers keep it deleted
    spark.range(1).select(lit(2).cast("int").as("nk"))
      .createOrReplaceTempView("dml_tip_src")
    spark.sql(
      s"""MERGE INTO $name t USING dml_tip_src s
         |ON t.key.n_nationkey = s.nk AND t.op <> 'd'
         |WHEN NOT MATCHED THEN INSERT (key, after) VALUES
         |  (named_struct('n_nationkey', s.nk),
         |   named_struct('n_nationkey', s.nk, 'n_name', 'back',
         |                'n_regionkey', CAST(0 AS INT)))
         |""".stripMargin)
    val cf = spark.table(changes(name))
      .select(col("op"), col("pos"),
        get_json_object(col("key_json"), "$.n_nationkey").cast("int")
          .as("k"))
      .filter(col("k") === 2)
    val last = cf.orderBy(col("pos").desc).limit(1).collect()
    assert(last.head.getString(0) != "d",
      s"re-insert lost the pos race: ${cf.collect().mkString(";")}")
  }

  test("a key-SWAPPING update (X<->Y) is deterministic: the statement's " +
      "creates outrank its tombstones (tip+2 vs tip+1)") {
    val name = freshTable()
    val pre = spark.sql(
      s"SELECT key.n_nationkey AS k, after.n_name AS n FROM $name " +
        "WHERE key.n_nationkey IN (1, 2) AND op <> 'd'").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(pre.keySet == Set(1, 2))
    // one statement swaps the two keys: each row emits a tombstone for
    // its OLD key and an op='c' for its NEW key — every key gets BOTH a
    // delete and a create from the same statement
    spark.sql(
      s"""UPDATE $name SET
         |  key.n_nationkey = CASE WHEN key.n_nationkey = 1 THEN 2 ELSE 1 END,
         |  after.n_nationkey = CASE WHEN key.n_nationkey = 1 THEN 2 ELSE 1 END
         |WHERE key.n_nationkey IN (1, 2)""".stripMargin)
    val got = spark.sql(
      s"SELECT key.n_nationkey AS k, op, after.n_name AS n FROM $name " +
        "WHERE key.n_nationkey IN (1, 2) ORDER BY k").collect()
    assert(got.length == 2, got.mkString(";"))
    // both keys must be LIVE creates (not tombstones) with swapped payloads
    assert(got.forall(_.getString(1) == "c"), got.mkString(";"))
    assert(got(0).getString(2) == pre(2) && got(1).getString(2) == pre(1),
      s"payloads not swapped: ${got.mkString(";")} vs $pre")
  }

  test("a pinned time-travel view refuses DML") {
    val name = freshTable()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $name VERSION AS OF 1 SET after.n_name = 'x' " +
        "WHERE key.n_nationkey = 1")
    }
    assert(e.getMessage.toLowerCase.contains("time-travel") ||
      e.getMessage.toLowerCase.contains("version as of"), e.getMessage)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE deletes/updates unreferenced " +
      "rows — the full three-way merge") {
    val name = freshTable()
    // source = keys 1..3; everything else in the table is "not matched
    // by source" and gets tombstoned
    spark.range(1, 4).select(col("id").cast("int").as("nk"))
      .createOrReplaceTempView("dml_nmbs_src")
    spark.sql(
      s"""MERGE INTO $name t USING dml_nmbs_src s
         |ON t.key.n_nationkey = s.nk AND t.op <> 'd'
         |WHEN MATCHED THEN UPDATE SET t.after.n_name = 'kept'
         |WHEN NOT MATCHED BY SOURCE AND t.op <> 'd' THEN DELETE
         |""".stripMargin)
    val live = spark.sql(s"SELECT key.n_nationkey AS k, after.n_name " +
      s"FROM $name WHERE op <> 'd' ORDER BY k").collect()
    assert(live.map(_.getInt(0)).toSeq == Seq(1, 2, 3), live.mkString(";"))
    assert(live.forall(_.getString(1) == "kept"))
  }

  test("DML over the bucketed sink kind commits through the same path") {
    val name = freshTable("bucketed")
    spark.sql(s"UPDATE $name SET after.n_name = 'bk' " +
      "WHERE key.n_nationkey = 7")
    val row = spark.sql(s"SELECT op, after.n_name FROM $name " +
      "WHERE key.n_nationkey = 7").collect()
    assert(row.length == 1 && row.head.getString(0) == "u" &&
      row.head.getString(1) == "bk", row.mkString(";"))
  }

  test("UPDATE with an IN-subquery condition") {
    val name = freshTable()
    spark.range(2, 5).select(col("id").cast("int").as("sk"))
      .createOrReplaceTempView("dml_sub_src")
    // delta-based row-level plans support subqueries in the condition
    // (the rewrite joins the scan against the subquery result); pin it
    // either way so a Spark behavior change surfaces here
    try {
      spark.sql(s"UPDATE $name SET after.n_name = 'subq' " +
        "WHERE key.n_nationkey IN (SELECT sk FROM dml_sub_src)")
      val got = spark.sql(s"SELECT key.n_nationkey AS k FROM $name " +
        "WHERE after.n_name = 'subq' ORDER BY k").collect()
      assert(got.map(_.getInt(0)).toSeq == Seq(2, 3, 4), got.mkString(";"))
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        // acceptable pinned alternative: a clear analysis error, never
        // a wrong result
        assert(e.getMessage.toLowerCase.contains("subquer"), e.getMessage)
    }
  }

  test("UPDATE on full and scd2 sinks commits the same epoch shape") {
    // full presents the update's op; scd2 presents every current row as
    // a synthetic read (op='r', Scd2Sink.state) but opens a NEW VERSION
    // for the updated key — the $history table shows the closed one
    for (kind <- Seq("full", "scd2")) {
      val name = freshTable(kind)
      spark.sql(s"UPDATE $name SET after.n_name = 'k-$kind' " +
        "WHERE key.n_nationkey = 5")
      val row = spark.sql(s"SELECT op, after.n_name FROM $name " +
        "WHERE key.n_nationkey = 5").collect()
      val expectOp = if (kind == "scd2") "r" else "u"
      assert(row.length == 1 && row.head.getString(0) == expectOp &&
        row.head.getString(1) == s"k-$kind", s"$kind: ${row.mkString}")
      if (kind == "scd2") {
        val parts = name.split('.')
        val hist = spark.sql(
          s"SELECT is_current, n_name FROM " +
            s"${parts(0)}.${parts(1)}.`${parts(2)}$$history` " +
            "WHERE n_nationkey = 5 ORDER BY valid_from_pos").collect()
        assert(hist.length >= 2, hist.mkString(";"))
        assert(hist.last.getBoolean(0) &&
          hist.last.getString(1) == "k-scd2")
        assert(!hist.head.getBoolean(0))
      }
    }
  }
}
