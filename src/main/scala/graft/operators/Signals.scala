package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
