package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.v2.ChangeLogSource
import graft.streaming.{ChangeLogPipeline, MergeSink}

/** Chaos/restart semantics of the DSv2 source + MERGE sink: stop after the
  * first segment, append more segments, resume from the SAME checkpoint —
  * no event is lost or double-applied (SURVEY §5 restart tests; the S3/P10
  * invariant at the transport level).
  */
class RestartResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  test("stop → append segments → resume from checkpoint: exactly-once state") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val feed = graft.sources.ChangeFeedGen.standardFeed(orders, "orders")
    val keySchema = org.apache.spark.sql.types.StructType(
      Seq(orders.schema("o_orderkey")))

    // segment the wire: snapshot first, stream events appended "later"
    val wire = Files.createTempDirectory("wire").toString
    val seg1 = Files.createTempDirectory("seg1").toString
    val seg2 = Files.createTempDirectory("seg2").toString
    ChangeLogPipeline.writeWire(feed.filter(col("op") === "r"), seg1)
    ChangeLogPipeline.writeWire(feed.filter(col("op") =!= "r"), seg2)
    def copySeg(src: String, prefix: String): Unit =
      Files.list(Paths.get(src)).filter(p =>
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith(".")).forEach { p =>
        Files.copy(p, Paths.get(wire, prefix + p.getFileName.toString))
      }
    copySeg(seg1, "a-")

    val sinkDir = Files.createTempDirectory("sink").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val sink = new MergeSink(sinkDir)
    def runOnce(): Unit = {
      val q = spark.readStream.format(classOf[ChangeLogSource].getName)
        .option("path", wire).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
          val env = batch.select(
            from_json(col("key_json"), keySchema).as("key"),
            lit(null).cast(orders.schema).as("before"),
            from_json(col("payload_json"), orders.schema).as("after"),
            col("op"), struct(col("pos")).as("source"),
            lit(null).cast("string").as("transaction"),
            col("pos").as("ts_ms"))
          sink.merge(env, epoch): Unit
        }.start()
      q.awaitTermination()
    }

    runOnce() // consumes snapshot only, then "crashes" (stops)
    val afterSnapshot = canon(sink.view(spark))
    assert(afterSnapshot == canon(orders), "snapshot phase state wrong")

    copySeg(seg2, "b-") // stream events arrive while down
    runOnce() // resume from the same checkpoint

    val want = canon(graft.operators.Materialize.latestState(feed))
    assert(canon(sink.view(spark)) == want,
      "resume lost or double-applied events")
  }

  test("kill → restart with checkpoint AND sink root on explicit file: " +
      "URIs: exactly-once through the Hadoop-FS commit layer with the " +
      "claim/heartbeat machinery active (P10 on the new FS layer)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val feed = graft.sources.ChangeFeedGen.standardFeed(orders, "orders")
    val keySchema = org.apache.spark.sql.types.StructType(
      Seq(orders.schema("o_orderkey")))

    val wire = Files.createTempDirectory("wire-uri").toString
    val seg1 = Files.createTempDirectory("seg1-uri").toString
    val seg2 = Files.createTempDirectory("seg2-uri").toString
    ChangeLogPipeline.writeWire(feed.filter(col("op") === "r"), seg1)
    ChangeLogPipeline.writeWire(feed.filter(col("op") =!= "r"), seg2)
    def copySeg(src: String, prefix: String): Unit =
      Files.list(Paths.get(src)).filter(p =>
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith(".")).forEach { p =>
        Files.copy(p, Paths.get(wire, prefix + p.getFileName.toString))
      }
    copySeg(seg1, "a-")

    // BOTH durable roots as explicit file: URIs — the checkpoint rides
    // Spark's own Hadoop layer, the sink root rides SinkFs; the LSM
    // kind exercises claims + heartbeats + manifest swap every epoch
    val sinkRoot = "file://" + Files.createTempDirectory("sink-uri").toString
    val ckpt = "file://" + Files.createTempDirectory("ckpt-uri").toString
    val sink = new graft.streaming.LsmMergeSink(sinkRoot, buckets = 4,
      compactEvery = 3)
    def runOnce(): Unit = {
      val q = spark.readStream.format(classOf[ChangeLogSource].getName)
        .option("path", wire).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
          val env = batch.select(
            from_json(col("key_json"), keySchema).as("key"),
            lit(null).cast(orders.schema).as("before"),
            from_json(col("payload_json"), orders.schema).as("after"),
            col("op"), struct(col("pos")).as("source"),
            lit(null).cast("string").as("transaction"),
            col("pos").as("ts_ms"))
          sink.merge(env, epoch): Unit
        }.start()
      q.awaitTermination()
    }

    runOnce() // dies after the snapshot segment
    val tipAfterFirst = sink.committedEpoch
    assert(tipAfterFirst.nonEmpty, "first run must commit through the URI root")
    copySeg(seg2, "b-") // stream events arrive while down
    runOnce() // restart from the same checkpoint
    // replaying the first run's epochs must have no-opped (the replay
    // guard reads the pointer through the same FS layer)
    assert(sink.committedEpoch.exists(_ > tipAfterFirst.get),
      s"restart must advance the tip (was $tipAfterFirst, " +
        s"now ${sink.committedEpoch})")
    val want = canon(graft.operators.Materialize.latestState(feed))
    assert(canon(sink.view(spark)) == want,
      "restart through file: URIs lost or double-applied events")
  }
}
