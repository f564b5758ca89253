package graft.sources.v2

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._
import scala.util.Using
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch streaming source for a change-log transport (the
  * engine's stand-in for a binlog/WAL tail — SURVEY S8/S9's Spark shape:
  * "custom DSv2 MicroBatchStream; offset = log position").
  *
  * Wire format: a directory of `*.log` text files, one record per line,
  * TAB-separated: `table \t op \t pos \t keyJson \t payloadJson`. Segments
  * are immutable once visible and consumed in lexicographic name order.
  *
  * The stream offset is the SEGMENT FRONTIER — the name of the last fully
  * consumed segment. Everything the driver needs is file metadata:
  *   - `latestOffset` lists the directory (no content reads — at 100 TB of
  *     log the driver never touches record data);
  *   - the writer embeds each segment's record count in its committed name
  *     (`-n<count>.log`), so record-capped admission control is also pure
  *     name arithmetic (counting lines is a cached fallback for foreign
  *     files only);
  *   - readers consume whole segments — no prefix re-streaming, no seeks.
  * Restart resumes at the frontier exactly (reference offset semantics:
  * `BinlogOffsetContext`/`PostgresOffsetContext`).
  *
  * Commit assigns each segment a monotonic generation number
  * (`part-g<gen>-...`), so arrival order == lexicographic order even when
  * batch and streaming writers interleave on one directory.
  *
  * Usage: `spark.readStream.format(classOf[ChangeLogSource].getName)
  *   .option("path", dir).load()`
  */
class ChangeLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeLogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeLogTable(properties.get("path"))
}

object ChangeLogSource {
  val schema: StructType = StructType(Seq(
    StructField("table", StringType),
    StructField("op", StringType),
    StructField("pos", LongType),
    StructField("key_json", StringType),
    StructField("payload_json", StringType)))

  /** Sorted data files of the transport directory (stream closed). */
  def logFiles(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) Seq.empty
    else Using.resource(Files.list(d)) { s =>
      s.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        }
        .toSeq
    }.sortBy(_.getFileName.toString)
  }

  def countLines(p: Path): Long =
    Using.resource(Files.lines(p))(_.count())

  /** Record count of a segment of any wire format (fallback when the
    * committed name carries no `-n<count>` — foreign files only).
    */
  def countRecords(p: Path): Long = {
    val n = p.getFileName.toString
    if (n.endsWith(".pgo"))
      graft.sources.wire.PgOutput.segmentRows(Files.readAllBytes(p)).size.toLong
    else if (n.endsWith(".pbo"))
      graft.sources.wire.PgProtoDecoder
        .segmentRows(Files.readAllBytes(p)).size.toLong
    else if (n.endsWith(".blog"))
      graft.sources.wire.MySqlBinlog.segmentRows(
        Files.readAllBytes(p), Map.empty).size.toLong
    else if (n.endsWith(".olr"))
      graft.sources.wire.OlrDecoder
        .segmentRows(Files.readAllBytes(p)).size.toLong
    else if (n.endsWith(".cs"))
      Using.resource(Files.lines(p))(s =>
        graft.sources.wire.MongoChangeStream
          .segmentRows(s.iterator().asScala).size.toLong)
    else countLines(p)
  }

  private val CountInName = """.*-n(\d+)\.(?:log|pgo|pbo|blog|cs|olr)$""".r
  private val GenInName = """^part-g(\d+)-.*""".r

  /** Record count from the committed segment name, if our writer named it. */
  def countFromName(name: String): Option[Long] = name match {
    case CountInName(n) => Some(n.toLong)
    case _ => None
  }

  /** Next commit generation: max over `part-g<gen>-*` names + 1 (metadata
    * only; one listing per commit).
    */
  def nextGeneration(dir: String): Long = {
    val gens = logFiles(dir).map(_.getFileName.toString).collect {
      case GenInName(g) => g.toLong
    }
    if (gens.isEmpty) 1L else gens.max + 1L
  }

  def segmentName(gen: Long, epochId: Option[Long], partitionId: Int,
                  count: Long): String = {
    val mid = epochId.map(e => f"e$e%06d").getOrElse("b")
    f"part-g$gen%012d-$mid-p$partitionId%05d-n$count.log"
  }

  /** Token identifying a streaming (epoch, partition) in a committed name —
    * the replay-idempotence check.
    */
  def epochToken(epochId: Long, partitionId: Int): String =
    f"-e$epochId%06d-p$partitionId%05d-"
}

class ChangeLogTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"changelog($path)"
  override def schema(): StructType = ChangeLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      // schema-history DDL for positional binlog segments (see
      // MySqlBinlog.schemasFromDdl); empty → c<i>/col-0-key defaults
      private val binlogDdl = Option(options.get("binlogDdl")).getOrElse("")
      override def readSchema(): StructType = ChangeLogSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangeLogMicroBatchStream(path,
          Option(options.get("maxRecordsPerTrigger")).map(_.toLong), binlogDdl)
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val stream = new ChangeLogMicroBatchStream(path, None, binlogDdl)
          stream.planInputPartitions(ChangeLogOffset(""),
            stream.latestOffset())
        }
        override def createReaderFactory(): PartitionReaderFactory =
          (p: InputPartition) =>
            new ChangeLogPartitionReader(p.asInstanceOf[ChangeLogInputPartition])
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ChangeLogBatchWrite(path)
        override def toStreaming: StreamingWrite = new ChangeLogStreamingWrite(path)
      }
    }
}

/** Driver-side commit: assign the next generation, name segments with
  * their record counts, rename staged files into place. Streaming epochs
  * are idempotent — a partition already committed under this epoch (name
  * carries the epoch token) discards its staged replay.
  */
object ChangeLogCommit {
  /** Serialize commits to one wire directory across JVMs: the generation
    * assignment is a read-modify-write (list names → max gen + 1 → rename),
    * so two drivers committing concurrently could claim the same
    * generation and interleave their segments in partition-id order
    * rather than arrival order. An atomic `_commit.lock` create
    * (O_EXCL — a filesystem CAS) makes list+claim+rename one critical
    * section; underscore names are invisible to readers. The lock is held
    * only for driver-side metadata work (a listing plus O(partitions)
    * renames), never while data is written, so it does not serialize the
    * distributed write path.
    */
  private def withDirLock[T](dir: String)(body: => T): T = {
    Files.createDirectories(Paths.get(dir))
    val lock = Paths.get(dir, "_commit.lock")
    var acquired = false
    var waitedMs = 0L
    while (!acquired) {
      try { Files.createFile(lock); acquired = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          waitedMs += 5
          if (waitedMs > 30000) throw new IllegalStateException(
            s"commit lock $lock held > 30s — concurrent committer hung, " +
              "or a crashed driver left a stale lock (delete it to recover)")
          Thread.sleep(5)
      }
    }
    try body finally Files.deleteIfExists(lock)
  }

  def commit(dir: String, messages: Array[WriterCommitMessage],
             epochId: Option[Long]): Unit = {
    val staged = messages.collect {
      case s: StagedLogFile if s.staged.nonEmpty => s
    }.sortBy(_.partitionId)
    if (staged.isEmpty) return
    withDirLock(dir) { commitLocked(dir, staged, epochId) }
  }

  private def commitLocked(dir: String, staged: Array[StagedLogFile],
                           epochId: Option[Long]): Unit = {
    val existing = ChangeLogSource.logFiles(dir).map(_.getFileName.toString)
    val gen = ChangeLogSource.nextGeneration(dir)
    staged.foreach { m =>
      val replayed = epochId.exists(e =>
        existing.exists(_.contains(ChangeLogSource.epochToken(e, m.partitionId))))
      if (replayed) Files.deleteIfExists(Paths.get(m.staged))
      else Files.move(Paths.get(m.staged),
        Paths.get(dir, ChangeLogSource.segmentName(gen, epochId,
          m.partitionId, m.count)),
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case StagedLogFile(staged, _, _) if staged.nonEmpty =>
        Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

class ChangeLogStreamingWrite(path: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    ChangeLogStreamingWriterFactory(path)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    ChangeLogCommit.commit(path, messages, Some(epochId))

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    ChangeLogCommit.abort(messages)
}

class ChangeLogBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ChangeLogWriterFactory(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    ChangeLogCommit.commit(path, messages, None)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    ChangeLogCommit.abort(messages)
}

/** @param count records in the staged segment (the writer knows — commit
  *   bakes it into the segment name so readers never have to count)
  */
case class StagedLogFile(staged: String, partitionId: Int, count: Long)
  extends WriterCommitMessage

case class ChangeLogStreamingWriterFactory(path: String)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new ChangeLogDataWriter(path, partitionId, taskId, Some(epochId))
}

case class ChangeLogWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ChangeLogDataWriter(path, partitionId, taskId)
}

class ChangeLogDataWriter(dir: String, partitionId: Int, taskId: Long,
                          epochId: Option[Long] = None)
  extends DataWriter[InternalRow] {
  // staged name is task-unique (speculative retries cannot collide); the
  // final name is assigned at commit time by the driver
  private val staged = Paths.get(dir,
    f".stage-p$partitionId%05d-t$taskId-e${epochId.getOrElse(-1L)}")
  private var out: java.io.BufferedWriter = _
  private var n = 0L

  override def write(r: InternalRow): Unit = {
    if (out == null) {
      Files.createDirectories(Paths.get(dir))
      out = Files.newBufferedWriter(staged)
    }
    out.write(s"${r.getUTF8String(0)}\t${r.getUTF8String(1)}\t${r.getLong(2)}" +
      s"\t${r.getUTF8String(3)}\t${r.getUTF8String(4)}\n")
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) StagedLogFile("", partitionId, 0L)
    else { out.close(); StagedLogFile(staged.toString, partitionId, n) }
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}

/** Offset = segment frontier: every segment with name <= `file` is fully
  * consumed ("" = nothing consumed). Pure metadata — no content position.
  */
case class ChangeLogOffset(file: String) extends Offset {
  override def json(): String = s"""{"file":"$file"}"""
}

object ChangeLogOffset {
  private val FromJson = """\{"file":"(.*)"\}""".r
  def fromJson(json: String): ChangeLogOffset = json.trim match {
    case FromJson(f) => ChangeLogOffset(f)
    case other => throw new IllegalArgumentException(
      s"not a changelog offset: $other")
  }
}

/** @param maxRecordsPerTrigger admission control — the reference's
  *   `max.batch.size` analog (`CommonConnectorConfig.java:641`): a
  *   micro-batch admits whole segments until the record cap is reached
  *   (always at least one segment, so an oversize segment still makes
  *   progress). Counts come from segment names; foreign files fall back
  *   to one cached line count.
  */
class ChangeLogMicroBatchStream(path: String,
                                maxRecordsPerTrigger: Option[Long] = None,
                                binlogDdl: String = "")
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {
  // fallback line counts for foreign (non-engine-written) segments —
  // immutable once visible, so cache forever
  private val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  @volatile private var availableNowTarget: Option[String] = None

  private def countOf(p: Path): Long =
    ChangeLogSource.countFromName(p.getFileName.toString).getOrElse(
      counts.computeIfAbsent(p.toString, _ => ChangeLogSource.countRecords(p)))

  /** Visible segments, capped at the Trigger.AvailableNow target if set. */
  private def visible(): Seq[Path] = {
    val fs = ChangeLogSource.logFiles(path)
    availableNowTarget match {
      case Some(t) => fs.filter(_.getFileName.toString <= t)
      case None => fs
    }
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = ChangeLogSource.logFiles(path).lastOption
      .map(_.getFileName.toString).orElse(Some(""))

  override def initialOffset(): Offset = ChangeLogOffset("")

  override def latestOffset(): Offset =
    visible().lastOption.map(p => ChangeLogOffset(p.getFileName.toString))
      .getOrElse(ChangeLogOffset(""))

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ChangeLogOffset].file
    val pending = visible().filter(_.getFileName.toString > s)
    limit match {
      case m: ReadMaxRows =>
        var admitted = s
        var total = 0L
        var first = true
        pending.foreach { p =>
          val c = countOf(p)
          if (first || total + c <= m.maxRows()) {
            admitted = p.getFileName.toString
            total += c
            first = false
          }
        }
        ChangeLogOffset(admitted)
      case _ =>
        pending.lastOption.map(p => ChangeLogOffset(p.getFileName.toString))
          .getOrElse(start.asInstanceOf[ChangeLogOffset])
    }
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    ChangeLogOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** One partition per segment in (start, end] — readers consume whole
    * immutable segments, never a sliced range.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChangeLogOffset].file
    val e = end.asInstanceOf[ChangeLogOffset].file
    ChangeLogSource.logFiles(path)
      .map(_.toString)
      .filter { p =>
        val n = Paths.get(p).getFileName.toString
        n > s && n <= e
      }
      .map(ChangeLogInputPartition(_, binlogDdl): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val part = partition.asInstanceOf[ChangeLogInputPartition]
      new ChangeLogPartitionReader(part)
    }
}

case class ChangeLogInputPartition(file: String, binlogDdl: String = "")
  extends InputPartition

/** Whole-segment reader, format by extension: `.log` = TSV text, `.pgo` =
  * recorded pgoutput frames (self-describing — Relation messages carry
  * names and key flags), `.blog` = recorded binlog events (positional —
  * column names default `c<i>`, key = column 0; name resolution belongs
  * to the schema-history layer, as in the reference). Each segment decodes
  * independently inside its own Spark task — the binary parse is
  * distributed with the data, never on the driver.
  */
class ChangeLogPartitionReader(part: ChangeLogInputPartition)
  extends PartitionReader[InternalRow] {
  private val path = Paths.get(part.file)
  private val name = path.getFileName.toString

  private var lines: java.util.stream.Stream[String] = _
  private val it: Iterator[InternalRow] =
    if (name.endsWith(".pgo"))
      graft.sources.wire.PgOutput.segmentRows(Files.readAllBytes(path))
        .map(wireRow)
    else if (name.endsWith(".pbo"))
      graft.sources.wire.PgProtoDecoder
        .segmentRows(Files.readAllBytes(path)).map(wireRow)
    else if (name.endsWith(".blog")) {
      val (names, keys) =
        if (part.binlogDdl.nonEmpty)
          graft.sources.wire.MySqlBinlog.schemasFromDdl(part.binlogDdl)
        else (Map.empty[String, Seq[String]], Map.empty[String, Seq[Int]])
      graft.sources.wire.MySqlBinlog.segmentRows(
        Files.readAllBytes(path), names, keys).map(wireRow)
    }
    else if (name.endsWith(".olr"))
      graft.sources.wire.OlrDecoder
        .segmentRows(Files.readAllBytes(path)).map(wireRow)
    else if (name.endsWith(".cs")) {
      lines = Files.lines(path)
      graft.sources.wire.MongoChangeStream
        .segmentRows(lines.iterator().asScala).map(wireRow)
    }
    else {
      lines = Files.lines(path)
      lines.iterator().asScala.map { l =>
        val f = l.split("\t", 5)
        InternalRow(
          UTF8String.fromString(f(0)), UTF8String.fromString(f(1)),
          f(2).toLong,
          UTF8String.fromString(f(3)), UTF8String.fromString(f(4)))
      }
    }
  private var current: InternalRow = _

  private def wireRow(r: graft.sources.wire.PgOutput.WireRow): InternalRow =
    InternalRow(
      UTF8String.fromString(r.table), UTF8String.fromString(r.op), r.pos,
      UTF8String.fromString(r.keyJson), UTF8String.fromString(r.payloadJson))

  override def next(): Boolean = {
    if (!it.hasNext) return false
    current = it.next()
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (lines != null) lines.close()
}
