package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Notifications (SURVEY P7; reference
  * `pipeline/notification/{Notification.java, IncrementalSnapshotNotificationService.java}`):
  * progress records for snapshots and streams. Two halves:
  *   - snapshot notifications derived deterministically from the chunked
  *     backfill (started / one in-progress per chunk / completed)
  *   - a StreamingQueryListener collecting micro-batch progress rows
  *     (the reference's JMX/log channels → a queryable table)
  */
object Notifications {

  /** Deterministic snapshot progress records for a chunked backfill. */
  def snapshotNotifications(chunked: DataFrame): DataFrame = {
    val perChunk = chunked.groupBy(col("chunk"))
      .agg(count(lit(1)).as("row_count"))
      .select(lit("snapshot-in-progress").as("notification_type"),
        col("chunk"), col("row_count"))
    val total = chunked.agg(count(lit(1)).as("row_count"))
      .select(lit("snapshot-completed").as("notification_type"),
        lit(-1L).as("chunk"), col("row_count"))
    val started = chunked.sparkSession.range(1)
      .select(lit("snapshot-started").as("notification_type"),
        lit(-1L).as("chunk"), lit(0L).as("row_count"))
    started.unionAll(perChunk).unionAll(total)
  }

  /** Listener capturing per-batch progress (query name, batch id, rows).
    * The listener bus appends from its own thread; read through
    * [[ProgressCollector.progress]] (a synchronized snapshot) — the
    * buffer itself stays private so no unsynchronized read can race the
    * bus (JMM visibility).
    */
  final class ProgressCollector extends StreamingQueryListener {
    private val buf = mutable.ArrayBuffer.empty[(String, Long, Long)]
    def progress: Seq[(String, Long, Long)] = buf.synchronized(buf.toList)
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      buf.synchronized {
        buf += ((Option(e.progress.name).getOrElse(""),
          e.progress.batchId, e.progress.numInputRows))
      }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /** Attach a collector to the session (caller removes it when done). */
  def collect(spark: SparkSession): ProgressCollector = {
    val c = new ProgressCollector
    spark.streams.addListener(c)
    c
  }
}
