package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.v2._

/** Offset/partition mechanics of the DSv2 change-log source. */
class ChangeLogSourceSpec extends AnyFunSuite {

  def mkWire(lines: Seq[Seq[String]]): String = {
    val dir = Files.createTempDirectory("wire").toString
    lines.zipWithIndex.foreach { case (ls, i) =>
      Files.writeString(Paths.get(dir, f"part-$i%05d.log"),
        ls.mkString("", "\n", "\n"))
    }
    dir
  }

  def line(pos: Long): String = s"orders\tr\t$pos\t{}\t{}"

  test("latestOffset counts all records across files") {
    val dir = mkWire(Seq(Seq(line(1), line(2)), Seq(line(3))))
    val s = new ChangeLogMicroBatchStream(dir)
    assert(s.initialOffset() == ChangeLogOffset(0))
    assert(s.latestOffset() == ChangeLogOffset(3))
    assert(s.deserializeOffset("2") == ChangeLogOffset(2))
  }

  test("planInputPartitions slices ranges across file boundaries") {
    val dir = mkWire(Seq(Seq(line(1), line(2)), Seq(line(3), line(4), line(5))))
    val s = new ChangeLogMicroBatchStream(dir)
    val parts = s.planInputPartitions(ChangeLogOffset(1), ChangeLogOffset(4))
      .map(_.asInstanceOf[ChangeLogInputPartition])
    // record 1 (second line of file 0) + records 2,3 (lines 0,1 of file 1)
    assert(parts.length == 2)
    assert(parts(0).startLine == 1 && parts(0).endLine == 2)
    assert(parts(1).startLine == 0 && parts(1).endLine == 2)
    // empty range → no partitions
    assert(s.planInputPartitions(ChangeLogOffset(4), ChangeLogOffset(4)).isEmpty)
  }

  test("reader returns exactly the sliced lines") {
    val dir = mkWire(Seq(Seq(line(10), line(20), line(30))))
    val part = ChangeLogInputPartition(
      ChangeLogSource.logFiles(dir).head.toString, 1, 3)
    val r = new ChangeLogPartitionReader(part)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (r.next()) seen += r.get().getLong(2)
    r.close()
    assert(seen.toSeq == Seq(20L, 30L))
  }

  test("admission control caps each batch at maxRecordsPerTrigger") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkWire(Seq(Seq(line(1), line(2), line(3), line(4), line(5))))
    val s = new ChangeLogMicroBatchStream(dir, Some(2L))
    assert(s.getDefaultReadLimit.toString == ReadLimit.maxRows(2).toString)
    val b1 = s.latestOffset(ChangeLogOffset(0), s.getDefaultReadLimit)
    assert(b1 == ChangeLogOffset(2))
    val b2 = s.latestOffset(b1, s.getDefaultReadLimit)
    assert(b2 == ChangeLogOffset(4))
    val b3 = s.latestOffset(b2, s.getDefaultReadLimit)
    assert(b3 == ChangeLogOffset(5), "final partial batch")
  }

  test("streaming with maxRecordsPerTrigger consumes everything in small batches") {
    val spark = SparkTestSession.get
    val dir = mkWire(Seq((1L to 7L).map(line)))
    val name = s"adm_${System.nanoTime()}"
    val q = spark.readStream
      .format(classOf[graft.sources.v2.ChangeLogSource].getName)
      .option("path", dir).option("maxRecordsPerTrigger", "3")
      .load()
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(name).count() == 7)
  }

  test("DSv2 batch write + batch read round-trips the wire format") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val dir = Files.createTempDirectory("wire-w").toString
    val rows = Seq(
      ("orders", "r", 10L, """{"k":1}""", """{"v":1}"""),
      ("orders", "u", 11L, """{"k":1}""", """{"v":2}"""),
      ("orders", "d", 12L, """{"k":2}""", "null"))
    rows.toDF("table", "op", "pos", "key_json", "payload_json")
      .repartition(2)
      .write.format(classOf[graft.sources.v2.ChangeLogSource].getName)
      .option("path", dir).mode("append").save()
    val back = spark.read
      .format(classOf[graft.sources.v2.ChangeLogSource].getName)
      .option("path", dir).load()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    assert(back == rows.toSet, s"round-trip mismatch: $back")
    // no staging leftovers after commit
    import scala.jdk.CollectionConverters._
    val leftovers = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".staged"))
    assert(leftovers == 0)
  }

  test("streaming write: stream in one wire dir, out another, exactly-once") {
    val spark = SparkTestSession.get
    val src = mkWire(Seq((1L to 6L).map(line)))
    val dst = Files.createTempDirectory("wire-out").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", src).option("maxRecordsPerTrigger", "2").load()
        .writeStream
        .format(classOf[graft.sources.v2.ChangeLogSource].getName)
        .option("path", dst).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    // re-run from the same checkpoint: nothing new, nothing duplicated
    runOnce()
    val out = spark.read
      .format(classOf[graft.sources.v2.ChangeLogSource].getName)
      .option("path", dst).load()
    assert(out.count() == 6, s"expected 6 records, got ${out.count()}")
    assert(out.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 6L).toSeq)
  }

  test("new log segments extend the offset (tail behavior)") {
    val dir = mkWire(Seq(Seq(line(1))))
    val s = new ChangeLogMicroBatchStream(dir)
    assert(s.latestOffset() == ChangeLogOffset(1))
    Files.writeString(Paths.get(dir, "part-99999.log"), line(2) + "\n")
    assert(s.latestOffset() == ChangeLogOffset(2))
  }
}
