package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StreamingMaterialize, TxReassembly}

/** SURVEY P9/§7.4.5: the in-flight transaction buffer runs on the RocksDB
  * state-store provider (the reference's Infinispan/Ehcache spill path is a
  * Spark config, not code) — same results as the default HDFS-backed store.
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("tx reassembly under RocksDB state store matches default store") {
    val sfDir = "/root/testdata/sf0.001"
    val feed = graft.sources.ChangeFeedGen.standardFeed(
      spark.read.parquet(s"$sfDir/orders.parquet"), "orders")
      .filter(col("op") =!= "r")
    val events = feed.select(col("source.txId").as("txId"),
      col("key.o_orderkey").cast("long").as("k"), col("op"),
      col("source.pos").as("pos"))
    val markers = events.select(col("txId"),
      floor(col("k") / 100).cast("long").as("t")).distinct()
      .select(col("txId"), lit(-1L).as("k"), lit("m").as("op"),
        ((col("t") * 100 + 99) * 10 + 9).as("pos"))
    val transport = Files.createTempDirectory("rocks-wire").toString
    StreamingMaterialize.writeTransport(
      events.unionByName(markers), transport, orderCol = "pos")

    def runWith(provider: Option[String]): Seq[String] = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val df = TxReassembly.runOnTransport(spark, transport)
        df.collect().map(_.mkString("|")).sorted.toSeq
      } finally {
        prev match {
          case Some(p) => spark.conf.set(key, p)
          case None => spark.conf.unset(key)
        }
      }
    }

    val default = runWith(None)
    val rocks = runWith(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    assert(rocks.nonEmpty)
    assert(rocks == default, "RocksDB-backed state diverged from default")
  }

  test("long transaction spanning many micro-batches completes under RocksDB") {
    // one transaction far larger than any micro-batch: its buffer must
    // grow across batches in the state store (the spill path the
    // reference delegates to Infinispan/Ehcache) and release only at the
    // commit marker (SURVEY §7.4.5)
    val n = 60000L
    val events = spark.range(n).select(
      lit("txBIG").as("txId"), col("id").as("k"), lit("u").as("op"),
      (col("id") * 2).as("pos"))
    val marker = spark.range(1).select(
      lit("txBIG").as("txId"), lit(-1L).as("k"), lit("m").as("op"),
      lit(n * 2 + 1).as("pos"))
    val transport = Files.createTempDirectory("rocks-bigtx").toString
    StreamingMaterialize.writeTransport(
      events.unionByName(marker), transport, files = 8, orderCol = "pos")

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = TxReassembly.runOnTransport(spark, transport,
        filesPerTrigger = 2)
      assert(out.count() == n, "every buffered event must release at commit")
      val cps = out.select("commitPos").distinct()
        .collect().map(_.getLong(0)).toSeq
      assert(cps == Seq(n * 2 + 1), s"wrong commit position(s): $cps")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }
}
