package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.v2._

/** Offset/partition mechanics of the DSv2 change-log source
  * (segment-frontier offsets: metadata-only, whole-segment reads).
  */
class ChangeLogSourceSpec extends AnyFunSuite {

  /** Foreign segments (no count in name — exercises the fallback). */
  def mkWire(lines: Seq[Seq[String]]): String = {
    val dir = Files.createTempDirectory("wire").toString
    lines.zipWithIndex.foreach { case (ls, i) =>
      Files.writeString(Paths.get(dir, f"part-$i%05d.log"),
        ls.mkString("", "\n", "\n"))
    }
    dir
  }

  def line(pos: Long): String = s"orders\tr\t$pos\t{}\t{}"

  def fileNames(dir: String): Seq[String] =
    ChangeLogSource.logFiles(dir).map(_.getFileName.toString)

  test("latestOffset is the newest segment name — metadata only") {
    val dir = mkWire(Seq(Seq(line(1), line(2)), Seq(line(3))))
    val s = new ChangeLogMicroBatchStream(dir)
    assert(s.initialOffset() == ChangeLogOffset(""))
    assert(s.latestOffset() == ChangeLogOffset("part-00001.log"))
    val off = ChangeLogOffset("part-00042.log")
    assert(s.deserializeOffset(off.json()) == off)
  }

  test("planInputPartitions selects whole segments in (start, end]") {
    val dir = mkWire(Seq(Seq(line(1)), Seq(line(2)), Seq(line(3))))
    val s = new ChangeLogMicroBatchStream(dir)
    val parts = s.planInputPartitions(
      ChangeLogOffset("part-00000.log"), ChangeLogOffset("part-00002.log"))
      .map(_.asInstanceOf[ChangeLogInputPartition])
    assert(parts.length == 2)
    assert(parts.map(p => Paths.get(p.file).getFileName.toString).toSeq ==
      Seq("part-00001.log", "part-00002.log"))
    assert(s.planInputPartitions(ChangeLogOffset("part-00002.log"),
      ChangeLogOffset("part-00002.log")).isEmpty)
  }

  test("reader returns every record of its segment") {
    val dir = mkWire(Seq(Seq(line(10), line(20), line(30))))
    val part = ChangeLogInputPartition(
      ChangeLogSource.logFiles(dir).head.toString)
    val r = new ChangeLogPartitionReader(part)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (r.next()) seen += r.get().getLong(2)
    r.close()
    assert(seen.toSeq == Seq(10L, 20L, 30L))
  }

  test("admission control admits whole segments up to the record cap") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkWire(Seq(
      Seq(line(1), line(2)), Seq(line(3), line(4)), Seq(line(5), line(6), line(7))))
    val s = new ChangeLogMicroBatchStream(dir, Some(4L))
    assert(s.getDefaultReadLimit.toString == ReadLimit.maxRows(4).toString)
    val b1 = s.latestOffset(ChangeLogOffset(""), s.getDefaultReadLimit)
    assert(b1 == ChangeLogOffset("part-00001.log"), "two 2-record segments fit in 4")
    val b2 = s.latestOffset(b1, s.getDefaultReadLimit)
    assert(b2 == ChangeLogOffset("part-00002.log"), "final segment")
    // an oversize FIRST segment is still admitted — progress over strictness
    val tight = new ChangeLogMicroBatchStream(dir, Some(1L))
    val t1 = tight.latestOffset(ChangeLogOffset(""), tight.getDefaultReadLimit)
    assert(t1 == ChangeLogOffset("part-00000.log"))
  }

  test("committed segment names carry record counts and sort by generation") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val dir = Files.createTempDirectory("wire-gen").toString
    def writeBatch(rows: Seq[(String, String, Long, String, String)]): Unit =
      rows.toDF("table", "op", "pos", "key_json", "payload_json")
        .coalesce(1)
        .write.format(classOf[ChangeLogSource].getName)
        .option("path", dir).mode("append").save()
    writeBatch(Seq(("orders", "r", 1L, "{}", "{}"), ("orders", "r", 2L, "{}", "{}")))
    writeBatch(Seq(("orders", "u", 3L, "{}", "{}")))
    val names = fileNames(dir)
    assert(names.length == 2)
    assert(names.forall(_.matches("""part-g\d{12}-b-p\d{5}-n\d+\.log""")), names)
    // counts baked into names match the actual contents
    ChangeLogSource.logFiles(dir).foreach { p =>
      assert(ChangeLogSource.countFromName(p.getFileName.toString)
        .contains(ChangeLogSource.countLines(p)))
    }
    // second write's generation sorts strictly after the first — arrival
    // order == lexicographic order even across jobs
    assert(names == names.sorted && names.head < names.last)
    assert(ChangeLogSource.countFromName(names.head).contains(2L))
    assert(ChangeLogSource.countFromName(names.last).contains(1L))
  }

  test("streaming with maxRecordsPerTrigger consumes everything") {
    val spark = SparkTestSession.get
    val dir = mkWire(Seq((1L to 4L).map(line), (5L to 7L).map(line)))
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
      .count(_.getFileName.toString.startsWith(".stage"))
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
    assert(s.latestOffset() == ChangeLogOffset("part-00000.log"))
    Files.writeString(Paths.get(dir, "part-99999.log"), line(2) + "\n")
    assert(s.latestOffset() == ChangeLogOffset("part-99999.log"))
  }

  test("restart: segments appended while down resume exactly from the frontier") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val dir = Files.createTempDirectory("wire-restart").toString
    def writeBatch(pos: Seq[Long]): Unit =
      pos.map(p => ("orders", "r", p, "{}", "{}"))
        .toDF("table", "op", "pos", "key_json", "payload_json")
        .coalesce(1)
        .write.format(classOf[ChangeLogSource].getName)
        .option("path", dir).mode("append").save()
    writeBatch(Seq(1L, 2L))
    val s = new ChangeLogMicroBatchStream(dir, Some(2L))
    val consumed = s.latestOffset(ChangeLogOffset(""), s.getDefaultReadLimit)
    // "crash"; two more commits land while the stream is down — their
    // generations sort strictly after the consumed frontier
    writeBatch(Seq(3L))
    writeBatch(Seq(4L, 5L))
    val s2 = new ChangeLogMicroBatchStream(dir) // fresh stream, same dir
    val end = s2.latestOffset(consumed,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    val parts = s2.planInputPartitions(consumed, end)
      .map(_.asInstanceOf[ChangeLogInputPartition])
    val seen = parts.flatMap { p =>
      val r = new ChangeLogPartitionReader(p)
      val b = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) b += r.get().getLong(2)
      r.close(); b
    }.sorted.toSeq
    assert(seen == Seq(3L, 4L, 5L), s"resume lost or duplicated records: $seen")
  }

  test("concurrent committers serialize on the dir lock: unique generations") {
    val dir = Files.createTempDirectory("wire-conc").toString
    val nThreads = 4; val commitsEach = 8
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        try {
          (0 until commitsEach).foreach { c =>
            val staged = Files.createTempFile("staged", ".log")
            Files.writeString(staged, line(t * 100L + c) + "\n")
            ChangeLogCommit.commit(dir,
              Array(StagedLogFile(staged.toString, partitionId = 0, count = 1L)),
              epochId = None)
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"commit failed: ${errors.peek()}")
    val names = fileNames(dir)
    assert(names.size == nThreads * commitsEach,
      s"lost segments: ${names.size} of ${nThreads * commitsEach}")
    val gens = names.map(_.split("-")(1).stripPrefix("g").toLong)
    assert(gens.distinct.size == gens.size,
      s"duplicate generation claimed under concurrency: ${gens.sorted}")
    assert(!Files.exists(Paths.get(dir, "_commit.lock")), "lock leaked")
  }
}
