package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{OrderKey, OrderPayload}
import graft.serde.ChangeEvents
import graft.sources.{ChangeFeedGen, Tables}

/** Typed ChangeEvent serde (SURVEY §2.8, ref DebeziumSerdes). */
class SerdeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private def feed(tomb: Boolean = false) =
    ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders",
      tombstonesOnDelete = tomb)

  test("events: typed view matches envelope row counts and unwrap semantics") {
    val df = feed()
    val ev = ChangeEvents.events[OrderKey, OrderPayload](df)
    assert(ev.count() == df.count())
    // deletes carry a before image and no value
    val del = ev.filter(_.op == "d").head()
    assert(del.value.isEmpty && del.before.nonEmpty && del.after.isEmpty)
    // updates mutated o_orderstatus to U
    val upd = ev.filter(_.op == "u").head()
    assert(upd.value.exists(_.o_orderstatus == "U"))
    assert(upd.before.exists(_.o_orderkey == upd.key.o_orderkey))
  }

  test("tombstones unwrap to None and are flagged") {
    val ev = ChangeEvents.events[OrderKey, OrderPayload](feed(tomb = true))
    val tombs = ev.filter(_.isTombstone)
    assert(tombs.count() > 0)
    assert(tombs.head().value.isEmpty)
  }

  test("values() equals drop-mode unwrap row count") {
    val df = feed()
    val vals = ChangeEvents.values[OrderKey, OrderPayload](df)
    val expected = df.filter(col("op").isin("r", "c", "u")).count()
    assert(vals.count() == expected)
  }

  test("toEnvelope roundtrips to the envelope column shape") {
    val back = ChangeEvents.toEnvelope(
      ChangeEvents.events[OrderKey, OrderPayload](feed()))
    assert(back.columns.toSeq ==
      Seq("key", "before", "after", "op", "source", "transaction", "ts_ms"))
    assert(back.filter(col("op") === "d").count() ==
      feed().filter(col("op") === "d").count())
  }
}
