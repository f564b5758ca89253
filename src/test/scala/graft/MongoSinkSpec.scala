package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.MongoChangeEventSink
import graft.sources.{ChangeFeedGen, Tables}
import graft.tools.MongoSinkServer

/** MongoDB sink over the live wire: write-model semantics (replaceOne
  * upsert / deleteOne), per-partition sessions, field projections, and
  * the server's shape validation.
  */
class MongoSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  lazy val feed = ChangeFeedGen.standardFeed(
    Tables.load(spark, sfDir, "supplier"), "supplier").cache()

  test("upsert + delete write models materialize the latest state") {
    val (port, store, stats, server) = MongoSinkServer.serve()
    try {
      val cfg = MongoChangeEventSink.Config("127.0.0.1", port)
      MongoChangeEventSink.write(feed, "supplier", cfg, numPartitions = 4)
      val got = MongoChangeEventSink.readCollection(spark, cfg, "supplier")
      val want = graft.operators.Materialize.latestState(feed)
      assert(got.count() == want.count())
      // updated rows carry the mutated balance; deleted keys are gone
      val dKey = want.agg(max("s_suppkey")).head.getLong(0)
      assert(store.get("supplier").size() == want.count())
      assert(stats.upserts.get() > 0 && stats.updates.get() > 0 &&
        stats.deletes.get() > 0, s"all three write-model paths must fire")
      // one wire session per NON-EMPTY partition, plus the reader
      assert(stats.connections.get() >= 3)
      val gotBal = got.agg(round(sum("s_acctbal"), 2)).head.getDouble(0)
      val wantBal = want.agg(round(sum("s_acctbal"), 2)).head.getDouble(0)
      assert(gotBal == wantBal)
    } finally server.close()
  }

  test("field include/exclude lists project the sink document") {
    val (port, store, _, server) = MongoSinkServer.serve()
    try {
      val cfg = MongoChangeEventSink.Config("127.0.0.1", port,
        fieldExclude = Set("s_nationkey"))
      MongoChangeEventSink.write(feed.filter(col("op") === "r"),
        "sup2", cfg, numPartitions = 2)
      val got = MongoChangeEventSink.readCollection(spark, cfg, "sup2")
      assert(!got.columns.contains("s_nationkey"))
      assert(got.columns.toSet.contains("s_acctbal"))
    } finally server.close()
  }

  test("an ObjectId _id round-trips the sink unchanged (extended JSON " +
      "string -> BSON ObjectId on the wire -> extended JSON on read)") {
    import org.apache.spark.sql.types._
    val (port, store, _, server) = MongoSinkServer.serve()
    try {
      import spark.implicits._
      val oid = "65e0a1b2c3d4e5f6a7b80001"
      val docSchema = StructType(Seq(StructField("_id", StringType),
        StructField("label", StringType)))
      val env = Seq((s"""{"$$oid":"$oid"}""", "doc_one", 1L))
        .toDF("_id", "label", "pos")
        .select(
          struct(col("_id")).as("key"),
          lit(null).cast(docSchema).as("before"),
          struct(col("_id"), col("label")).as("after"),
          lit("c").as("op"), struct(col("pos")).as("source"),
          lit(null).cast("string").as("transaction"),
          col("pos").as("ts_ms"))
      val cfg = MongoChangeEventSink.Config("127.0.0.1", port)
      MongoChangeEventSink.write(env, "typed", cfg, numPartitions = 1)
      // the STORED _id is a typed BSON ObjectId, not a string
      val stored = store.get("typed")
      assert(stored.size() == 1)
      val key = stored.keySet().iterator().next()
      assert(key == graft.serde.Bson.BObjectId(oid), s"stored key: $key")
      // and the read-back render is the same extended JSON wrapper
      val got = MongoChangeEventSink.readCollection(spark, cfg, "typed")
      assert(got.select(col("_id.`$oid`")).head.getString(0) == oid)
      // with parseExtendedJson=false the same string stays a string
      MongoChangeEventSink.write(env,
        "verbatim", cfg.copy(parseExtendedJson = false), numPartitions = 1)
      val key2 = store.get("verbatim").keySet().iterator().next()
      assert(key2 == graft.serde.Bson.BStr(s"""{"$$oid":"$oid"}"""))
    } finally server.close()
  }

  test("the server rejects malformed write models like a real mongod") {
    import graft.serde.Bson._
    import graft.sources.net.MongoWireClient
    val (port, _, _, server) = MongoSinkServer.serve()
    try {
      val s1 = new MongoWireClient.CommandSession("127.0.0.1", port)
      // non-upsert replace is not a sink write model — server must refuse
      intercept[Exception] {
        s1.command(BDoc(Seq(
          "update" -> BStr("c"),
          "updates" -> BArr(Seq(BDoc(Seq(
            "q" -> BDoc(Seq("_id" -> BInt64(1))),
            "u" -> BDoc(Seq("_id" -> BInt64(1), "v" -> BStr("x")))))))
          , "$db" -> BStr("sink"))))
      }
      val s2 = new MongoWireClient.CommandSession("127.0.0.1", port)
      // replacement _id differing from the filter _id is rejected
      intercept[Exception] {
        s2.command(BDoc(Seq(
          "update" -> BStr("c"),
          "updates" -> BArr(Seq(BDoc(Seq(
            "q" -> BDoc(Seq("_id" -> BInt64(1))),
            "u" -> BDoc(Seq("_id" -> BInt64(2))),
            "upsert" -> BBool(true)))))
          , "$db" -> BStr("sink"))))
      }
    } finally server.close()
  }
}
