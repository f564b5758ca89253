package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Control-plane signals (SURVEY P6/S13): a second small stream of command
  * records interpreted into engine actions (reference signal table channel
  * `pipeline/signal/channels/SourceSignalChannel.java:36,57`, actions under
  * `pipeline/signal/actions/`, processor loop `SignalProcessor.java`).
  *
  * A signal row is (id, type, data-json). Supported actions mirror the
  * reference: execute-snapshot, stop-snapshot, pause-snapshot,
  * resume-snapshot, log, schema-changes.
  */
object Signals {

  val KnownTypes: Seq[String] = Seq("execute-snapshot", "stop-snapshot",
    "pause-snapshot", "resume-snapshot", "log", "schema-changes")

  /** Parse raw signal rows into typed action rows; unknown types map to
    * action='ignore' (the reference logs-and-drops them).
    */
  def parse(signals: DataFrame, idCol: String = "id", typeCol: String = "type",
            dataCol: String = "data"): DataFrame =
    signals.select(
      col(idCol).as("signal_id"),
      when(col(typeCol).isin(KnownTypes: _*), col(typeCol))
        .otherwise(lit("ignore")).as("action"),
      get_json_object(col(dataCol), "$.data-collections[0]").as("collection"),
      get_json_object(col(dataCol), "$.type").as("snapshot_type"))

  /** Actions that start/affect a backfill, in signal order. */
  def snapshotCommands(parsed: DataFrame): DataFrame =
    parsed.filter(col("action").isin("execute-snapshot", "stop-snapshot",
      "pause-snapshot", "resume-snapshot"))

  /** Signal-line schema of the file channel (ref `FileSignalChannel
    * .java:36-43`): one JSON object per line — id STRING, type STRING,
    * data STRING (itself JSON, passed to the action).
    */
  val fileSchema: StructType =
    StructType.fromDDL("id STRING, type STRING, data STRING")

  /** File signal channel, batch read (ref
    * `pipeline/signal/channels/FileSignalChannel.java:93`): parse every
    * JSONL signal currently in `path` (a file or a directory of signal
    * files) into typed action rows.
    */
  def fromFile(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.schema(fileSchema).json(path))

  /** File signal channel as a STREAM: tail a signal directory — each
    * new file's lines surface as action rows in arrival order, the
    * `SignalProcessor` poll loop as a Structured Streaming source (no
    * driver-side tailing thread; files admit per micro-batch).
    */
  def fileChannel(spark: SparkSession, dir: String): DataFrame =
    parse(spark.readStream.schema(fileSchema).json(dir))
}
