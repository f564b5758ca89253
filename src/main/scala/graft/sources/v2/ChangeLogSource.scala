package graft.sources.v2

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
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
  * TAB-separated: `table \t op \t pos \t keyJson \t payloadJson`. Files are
  * consumed in lexicographic order; the stream offset is the global record
  * index, so restarts resume exactly and replays are deterministic
  * (reference offset semantics: `BinlogOffsetContext`/`PostgresOffsetContext`).
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

  /** Sorted data files of the transport directory. */
  def logFiles(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }
      .toSeq.sortBy(_.getFileName.toString)
  }

  def countLines(p: Path): Long =
    Files.lines(p).count()
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
      override def readSchema(): StructType = ChangeLogSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangeLogMicroBatchStream(path,
          Option(options.get("maxRecordsPerTrigger")).map(_.toLong))
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val stream = new ChangeLogMicroBatchStream(path)
          stream.planInputPartitions(ChangeLogOffset(0L), stream.latestOffset())
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

/** Streaming write: one log segment per (epoch, partition, task), staged
  * then committed by rename. Re-committing a replayed epoch is a no-op
  * (destination exists ⇒ discard stage) — idempotent sink semantics.
  */
class ChangeLogStreamingWrite(path: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    ChangeLogStreamingWriterFactory(path)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case StagedLogFile(staged, dest) if staged.nonEmpty =>
        if (Files.exists(Paths.get(dest))) Files.deleteIfExists(Paths.get(staged))
        else Files.move(Paths.get(staged), Paths.get(dest),
          StandardCopyOption.ATOMIC_MOVE)
      case _ => ()
    }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case StagedLogFile(staged, _) if staged.nonEmpty =>
        Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

/** Batch write: tasks stage `part-*.log.staged` files; commit renames them
  * into place atomically (per-file), abort deletes the staging leftovers.
  */
class ChangeLogBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ChangeLogWriterFactory(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case StagedLogFile(staged, dest) if staged.nonEmpty =>
        Files.move(Paths.get(staged), Paths.get(dest),
          StandardCopyOption.ATOMIC_MOVE)
      case _ => ()
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case StagedLogFile(staged, _) if staged.nonEmpty =>
        Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

case class StagedLogFile(staged: String, dest: String) extends WriterCommitMessage

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
  private val stem = epochId match {
    case Some(e) => f"part-e$e%06d-$partitionId%05d" // epoch-keyed: replays collide
    case None => f"part-$partitionId%05d-$taskId"
  }
  private val dest = Paths.get(dir, s"$stem.log")
  private val staged = Paths.get(dir, s".$stem-$taskId.staged")
  private var out: java.io.BufferedWriter = _

  override def write(r: InternalRow): Unit = {
    if (out == null) {
      Files.createDirectories(Paths.get(dir))
      out = Files.newBufferedWriter(staged)
    }
    out.write(s"${r.getUTF8String(0)}\t${r.getUTF8String(1)}\t${r.getLong(2)}" +
      s"\t${r.getUTF8String(3)}\t${r.getUTF8String(4)}\n")
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) StagedLogFile("", "")
    else { out.close(); StagedLogFile(staged.toString, dest.toString) }
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}

/** Offset = number of records consumed so far (global, file-order). */
case class ChangeLogOffset(recordIndex: Long) extends Offset {
  override def json(): String = recordIndex.toString
}

/** @param maxRecordsPerTrigger admission control — the reference's
  *   `max.batch.size` (default 2048) analog: a micro-batch admits at most
  *   this many records (`CommonConnectorConfig.java:641`).
  */
class ChangeLogMicroBatchStream(path: String,
                                maxRecordsPerTrigger: Option[Long] = None)
  extends MicroBatchStream with SupportsAdmissionControl {
  // file line counts are immutable once written (append-only log segments)
  private val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def fileCounts: Seq[(Path, Long)] =
    ChangeLogSource.logFiles(path).map { p =>
      (p, counts.computeIfAbsent(p.toString, _ => ChangeLogSource.countLines(p)))
    }

  override def initialOffset(): Offset = ChangeLogOffset(0L)
  override def latestOffset(): Offset =
    ChangeLogOffset(fileCounts.map(_._2).sum)

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val available = fileCounts.map(_._2).sum
    val s = start.asInstanceOf[ChangeLogOffset].recordIndex
    limit match {
      case m: ReadMaxRows => ChangeLogOffset(math.min(available, s + m.maxRows()))
      case _ => ChangeLogOffset(available)
    }
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    ChangeLogOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChangeLogOffset].recordIndex
    val e = end.asInstanceOf[ChangeLogOffset].recordIndex
    var base = 0L
    val parts = Seq.newBuilder[InputPartition]
    fileCounts.foreach { case (p, n) =>
      val fileStart = math.max(s - base, 0L)
      val fileEnd = math.min(e - base, n)
      if (fileEnd > fileStart)
        parts += ChangeLogInputPartition(p.toString, fileStart, fileEnd)
      base += n
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val part = partition.asInstanceOf[ChangeLogInputPartition]
      new ChangeLogPartitionReader(part)
    }
}

case class ChangeLogInputPartition(file: String, startLine: Long, endLine: Long)
  extends InputPartition

class ChangeLogPartitionReader(part: ChangeLogInputPartition)
  extends PartitionReader[InternalRow] {
  private val lines = Files.lines(Paths.get(part.file))
  private val it = lines.skip(part.startLine)
    .limit(part.endLine - part.startLine).iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val f = it.next().split("\t", 5)
    current = InternalRow(
      UTF8String.fromString(f(0)), UTF8String.fromString(f(1)),
      f(2).toLong,
      UTF8String.fromString(f(3)), UTF8String.fromString(f(4)))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
