package graft.sinks.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** CHANGEFEED of a catalog sink table — the Delta CDF / Iceberg
  * incremental-read analog over the MERGE sinks' epoch manifests. Each
  * committed epoch is one batch of envelope change rows `(epoch, op,
  * pos, key_json, after_json)`; deletes appear as `op='d'` tombstone
  * rows, so applying latest-by-pos over the feed from epoch 0
  * reconstructs exactly the table's batch read (spec + oracle pinned).
  *
  * Read either as a batch table (`graft.lsm.`orders$changes``, all
  * retained epochs, `VERSION AS OF` bounds the tip) or as a STREAM
  * (`spark.readStream.table(...)`): the micro-batch offset is the
  * committed epoch — restart resumes at the exact epoch frontier, and
  * new `writeTo(...).append()` epochs arrive as new micro-batches.
  *
  * Per-epoch change derivation:
  *   - every kind has an EPOCH-LOCAL fast path (LSM delta dirs,
  *     bucketed touched-bucket versions, scd2 epoch partitions, the
  *     full kind's opt-in `changefeed=true` change-delta sidecars):
  *     I/O tracks the CHANGE RATE, never the table;
  *   - the fallback (full tables without the sidecar opt-in, vacuumed
  *     artifacts) diffs the epoch's state against the previous retained
  *     version on `key`: a row changed iff its merge position moved.
  *     Both derivations converge to the same
  *     state under latest-by-pos consumption (a delta row that lost the
  *     pos race to existing state appears in the feed but never in the
  *     reduced result — standard at-least-once CDC semantics).
  *
  * Streaming transport: rows must cross to executors as InternalRows,
  * so `planInputPartitions` spools each admitted epoch's change frame
  * (driver-planned, executor-computed Spark write) as JSON lines under
  * the query's CHECKPOINT dir, keyed by epoch and reused on replay —
  * the same pattern as the engine's wire-segment transport, sized by
  * the change rate of the admitted epochs, cleaned with the checkpoint.
  */
object SinkChanges {

  val schema: StructType = StructType(Seq(
    StructField("epoch", LongType),
    StructField("op", StringType),
    StructField("pos", LongType),
    StructField("key_json", StringType),
    StructField("after_json", StringType)))

  /** Envelope change rows of `epoch` (committed), rendered to the feed
    * shape. `prev` is the previous RETAINED version, None for the first.
    *
    * Derivation order: the sink's EPOCH-LOCAL fast path first
    * ([[graft.streaming.CdcSink.changesAt]] — LSM delta dirs, bucketed
    * touched-bucket versions, scd2 epoch partitions; tombstones
    * included, I/O tracks the change rate); state-vs-state diff on
    * `key` + [[graft.streaming.CdcSink.droppedAt]] tombstones only as
    * the fallback (full-rewrite tables, vacuumed epoch artifacts).
    */
  def changesFor(spark: SparkSession, kind: String, path: String,
                 props: Map[String, String], epoch: Long,
                 prev: Option[Long]): DataFrame = {
    val sink = GraftSinkCatalog.sinkFor(kind, path, props)
    sink.changesAt(spark, epoch, prev) match {
      case Some(raw) => render(raw, epoch)
      case None =>
        val cur = sink.stateAt(spark, epoch).getOrElse(
          throw new IllegalStateException(s"no committed state at $epoch"))
        val raw = prev match {
          case None => cur
          case Some(p) => sink.stateAt(spark, p) match {
            case None => cur
            case Some(pr) =>
              // changed == the merge position moved (pos is the total
              // order; equal pos means the row did not change at `epoch`)
              cur.join(pr.select(col("key"), col("pos").as("__prev_pos")),
                  Seq("key"), "left_outer")
                .filter(col("__prev_pos").isNull ||
                  col("__prev_pos") =!= col("pos"))
                .drop("__prev_pos")
          }
        }
        val changed = render(raw, epoch)
        // keys that VANISHED from state between versions (scd2: a delete
        // closes the open version, leaving no row for the diff to see)
        // ride as synthesized tombstones at their TRUE closing position —
        // without them, latest-by-pos over the feed would keep deleted
        // keys alive
        prev.flatMap(p => sink.droppedAt(spark, epoch, p)) match {
          case None => changed
          case Some(gone) =>
            changed.unionByName(gone.select(
              lit(epoch).as("epoch"),
              lit(graft.model.Envelope.OpDelete).as("op"), col("pos"),
              to_json(col("key")).as("key_json"),
              lit(null).cast("string").as("after_json")))
        }
    }
  }

  /** Raw changed envelope rows (key, after, op, pos) → the feed shape. */
  private def render(raw: DataFrame, epoch: Long): DataFrame =
    raw.select(
      lit(epoch).as("epoch"), col("op"), col("pos"),
      to_json(col("key")).as("key_json"),
      to_json(col("after")).as("after_json"))

  /** All retained epochs' changes as one frame (the batch table read);
    * `asOf` bounds the feed's TIP at a pinned epoch, `fromEpoch` bounds
    * its START (the Delta CDF startingVersion analog — incremental
    * batch consumption). The first included epoch keeps its TRUE
    * predecessor for derivation: a `fromEpoch` cut must serve that
    * epoch's own changes, never degrade it to a snapshot.
    */
  def allChanges(spark: SparkSession, kind: String, path: String,
                 props: Map[String, String], asOf: Option[Long],
                 fromEpoch: Option[Long] = None): DataFrame = {
    val sink = GraftSinkCatalog.sinkFor(kind, path, props)
    // a feed bounded below the erosion floor would read as empty or
    // partial — it is not empty, it is GONE; loud like the stream guard
    sink.changefeedFloor.foreach { floor =>
      if (asOf.exists(_ < floor))
        throw new IllegalStateException(
          s"$path $$changes VERSION AS OF ${asOf.get} predates the vacuum " +
            s"erosion floor $floor — those epochs were reclaimed")
      if (fromEpoch.exists(_ < floor))
        throw new IllegalStateException(
          s"$path $$changes fromEpoch=${fromEpoch.get} predates the vacuum " +
            s"erosion floor $floor — epochs in between were reclaimed and " +
            "cannot be served; start at the floor or re-snapshot")
    }
    val versions = sink.versions
    val pairs = versions.zip(None +: versions.map(Some(_)))
      .filter { case (e, _) =>
        asOf.forall(e <= _) && fromEpoch.forall(e >= _) }
    if (pairs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    pairs
      .map { case (e, prev) => changesFor(spark, kind, path, props, e, prev) }
      .reduce(_.unionByName(_))
  }
}

/** Offset = committed-epoch frontier (every epoch ≤ it is consumed;
  * -1 = nothing consumed).
  */
case class EpochOffset(epoch: Long) extends Offset {
  override def json(): String = s"""{"epoch":$epoch}"""
}

object EpochOffset {
  private val FromJson = """\{"epoch":(-?\d+)\}""".r
  def fromJson(json: String): EpochOffset = json.trim match {
    case FromJson(e) => EpochOffset(e.toLong)
    case other => throw new IllegalArgumentException(
      s"not an epoch offset: $other")
  }
}

class SinkChangesMicroBatchStream(kind: String, path: String,
                                  props: Map[String, String],
                                  checkpointLocation: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @volatile private var availableNowTarget: Option[Long] = None

  private def sink = GraftSinkCatalog.sinkFor(kind, path, props)

  private def committedTip: Long =
    sink.committedEpoch.getOrElse(-1L)

  override def initialOffset(): Offset = EpochOffset(-1L)

  override def latestOffset(): Offset =
    EpochOffset(availableNowTarget.getOrElse(committedTip))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(committedTip)

  // admission control (SupportsAdmissionControl via TriggerAvailableNow):
  // epochs are the admission unit; one trigger drains to the tip
  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read
                              .streaming.ReadLimit): Offset =
    latestOffset()

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    EpochOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Spool dir of one epoch's change rows under the query checkpoint —
    * stable across restarts, so a replayed batch reuses the files. The
    * checkpoint location is whatever the query's cluster uses
    * (`file:`, `hdfs://`, `s3a://`): all spool I/O goes through the
    * Hadoop FileSystem API, so a non-local checkpoint works — driver
    * writes/lists via the resolved FS, executors re-open the files
    * with the shipped conf subset (see [[SinkChangesPartitionReader]]).
    */
  private def spoolDir(epoch: Long): HPath =
    new HPath(checkpointLocation, s"graft-changes/e$epoch")

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EpochOffset].epoch
    val e = end.asInstanceOf[EpochOffset].epoch
    val theSink = sink
    // RETENTION-EROSION guard (the Kafka OffsetOutOfRange /
    // Delta-CDF-vacuumed analog): a RESUMING stream whose frontier
    // predates a vacuum must fail loudly — the eroded epochs are no
    // longer enumerable, and admitting only the retained ones would
    // silently skip committed changes. A FRESH stream (frontier -1) is
    // fine: its first retained epoch serves as a snapshot batch.
    theSink.changefeedFloor.foreach { floor =>
      if (s >= 0 && s + 1 < floor)
        throw new IllegalStateException(
          s"$path $$changes: the stream's epoch frontier $s predates the " +
            s"vacuum erosion floor $floor — epochs in between were " +
            "reclaimed and cannot be replayed; reset the checkpoint to " +
            "re-snapshot, or vacuum less aggressively")
    }
    val versions = theSink.versions
    val admitted = versions.filter(v => v > s && v <= e)
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    val shipped = InternalRowParquet.shippableConf(hconf)
    admitted.flatMap { epoch =>
      val dir = spoolDir(epoch)
      val fs = dir.getFileSystem(hconf)
      if (!fs.exists(new HPath(dir, "_SUCCESS"))) {
        val prev = versions.filter(_ < epoch).lastOption
        SinkChanges.changesFor(spark, kind, path, props, epoch, prev)
          .toJSON.write.mode("overwrite").text(dir.toString)
      }
      fs.listStatus(dir).toSeq
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .map(st => SinkChangesPartition(st.getPath.toString,
          shipped): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new SinkChangesPartitionReader(
        partition.asInstanceOf[SinkChangesPartition])
}

case class SinkChangesPartition(file: String,
                                confProps: Map[String, String])
    extends InputPartition

/** JSON-lines reader for a spooled change segment (fixed feed schema).
  * Opens the segment through the Hadoop FS resolved from the shipped
  * conf subset — works for `file:`, HDFS and object-store checkpoints
  * alike (Configuration itself is not serializable, so the partition
  * carries only the relevant `fs.*`/`dfs.*` keys).
  */
class SinkChangesPartitionReader(part: SinkChangesPartition)
    extends PartitionReader[InternalRow] {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val stream = {
    val conf = new org.apache.hadoop.conf.Configuration()
    part.confProps.foreach { case (k, v) => conf.set(k, v) }
    val p = new HPath(part.file)
    p.getFileSystem(conf).open(p)
  }
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(stream, java.nio.charset.StandardCharsets.UTF_8))
  private val it = Iterator.continually(reader.readLine())
    .takeWhile(_ != null).filter(_.nonEmpty)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val node = mapper.readTree(it.next())
    def str(f: String): UTF8String = {
      val v = node.get(f)
      // toJSON omits null fields; a missing after_json is a tombstone
      if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
    }
    current = InternalRow(
      node.get("epoch").asLong(), str("op"), node.get("pos").asLong(),
      str("key_json"), str("after_json"))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
