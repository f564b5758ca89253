package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.IncrementalSnapshot

/** Signal-driven incremental-snapshot coordinator (SURVEY P3/P6/S3):
  * interprets the control-plane actions — execute-snapshot /
  * pause-snapshot / resume-snapshot / stop-snapshot — over a chunked
  * backfill whose chunks merge into the sink interleaved with the live
  * stream (reference `ChangeEventSourceCoordinator.java:208-226` +
  * `SignalProcessor`/`ExecuteSnapshot`).
  *
  * The driver-side loop only iterates CHUNK INDICES (each chunk's rows stay
  * distributed); between chunks it applies any stream batches scheduled at
  * that point, exactly like the reference's watermark windows.
  */
object SnapshotCoordinator {

  sealed trait Action
  case object ExecuteSnapshot extends Action
  case object PauseSnapshot extends Action
  case object ResumeSnapshot extends Action
  case object StopSnapshot extends Action
  /** a live-stream batch arriving between chunks */
  final case class StreamBatch(batch: DataFrame) extends Action

  final case class Progress(chunksDone: Seq[Long], aborted: Boolean)

  /** Run the script of actions. `chunkEnvelopes` must carry a `chunk`
    * column (from IncrementalSnapshot.chunked over the envelope frame).
    * Returns the progress log; state lands in `sink`.
    *
    * The epoch counter seeds from the sink's committed version, not 0: the
    * sinks' replay guard silently drops any epoch ≤ committed, so a second
    * coordinator run over an existing sink dir (a re-snapshot after a
    * crash, or a fresh snapshot into a long-lived table) must number its
    * merges above what the sink already holds.
    *
    * The chunk frame is hash-repartitioned by `chunk` and persisted before
    * the loop: each per-chunk merge then reads the cache with batch-level
    * min/max pruning on `chunk` instead of rescanning the source frame —
    * O(chunks × full scan) → one materialization + pruned cache reads,
    * the keyset-pagination shape of the reference's chunk loop
    * (`AbstractChunkQueryBuilder.java:49`) in cache form.
    */
  def run(chunkEnvelopes: DataFrame, sink: CdcSink,
          actions: Seq[Action]): Progress = {
    val byChunk = chunkEnvelopes.repartition(col("chunk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val chunkIds = byChunk.select(col("chunk")).distinct()
        .orderBy(col("chunk")).collect().map(_.getLong(0))
      var pending = chunkIds.toList
      var paused = false
      var started = false
      var aborted = false
      var epoch = sink.committedEpoch.map(_ + 1L).getOrElse(0L)
      val done = Seq.newBuilder[Long]

      def mergeNextChunk(): Unit = pending match {
        case c :: rest if started && !paused && !aborted =>
          sink.merge(byChunk.filter(col("chunk") === c).drop("chunk"), epoch)
          epoch += 1; done += c; pending = rest
        case _ => ()
      }

      actions.foreach {
        case ExecuteSnapshot => started = true; mergeNextChunk()
        case PauseSnapshot   => paused = true
        case ResumeSnapshot  => paused = false; mergeNextChunk()
        case StopSnapshot    => aborted = true; pending = Nil
        case StreamBatch(b)  => sink.merge(b, epoch); epoch += 1
      }
      // drain whatever remains runnable after the script
      while (pending.nonEmpty && started && !paused && !aborted) mergeNextChunk()
      Progress(done.result(), aborted)
    } finally byChunk.unpersist()
  }
}
