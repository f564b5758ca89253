package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** In-flight transaction reassembly — buffer a transaction's events until
  * its commit marker arrives, then emit them together (the reference's
  * Oracle LogMiner buffered mode: reference
  * `logminer/buffered/BufferedLogMinerStreamingChangeEventSource.java` and
  * `TransactionCommitConsumer.java`). State is per-txId via
  * flatMapGroupsWithState; with the RocksDB state-store provider this is
  * the spill-to-disk cache the reference gets from Infinispan/Ehcache.
  */
object TxReassembly {

  /** One streamed event on the tx-reassembly wire. op == "m" is the commit
    * marker for its txId.
    */
  case class TxEvent(txId: String, k: Long, op: String, pos: Long)

  case class TxBuffer(events: Seq[TxEvent], committedPos: Option[Long])

  /** Buffered events are held until the marker; emitted events carry their
    * commit position.
    */
  case class Committed(txId: String, k: Long, op: String, pos: Long,
                       commitPos: Long)

  /** Order-insensitive within the at-least-once transport: events arriving
    * after their tx's marker (file-source batch order ties are not
    * deterministic) release immediately against the remembered commit
    * position, so the emitted set is independent of micro-batch slicing.
    *
    * With `retentionMs > 0` state is bounded (processing time): a
    * committed tx's remembered commit position is dropped once no late
    * event has arrived for the window, and an uncommitted tx that never
    * sees its marker is evicted the same way — the reference's
    * abandoned-transaction retention
    * (`log.mining.transaction.retention.ms`). Without it a long-running
    * stream accumulates one state entry per txId forever. Retention
    * requires a repeating trigger: under a bounded AvailableNow replay,
    * pending processing-time timeouts make Spark schedule batches until
    * they fire, so bounded harnesses pass 0 (no timeout).
    */
  def reassemble(events: Dataset[TxEvent],
                 retentionMs: Long = 0L): Dataset[Committed] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (retentionMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.txId)
      .flatMapGroupsWithState[TxBuffer, Committed](
        OutputMode.Append(), timeoutConf) {
        (txId: String, batch: Iterator[TxEvent], state: GroupState[TxBuffer]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = handleBatch(txId, batch.toSeq, state)
            if (retentionMs > 0) state.setTimeoutDuration(retentionMs)
            out
          }
      }
  }

  /** Event carrying its event time (derived from the log position — the
    * wire's total order IS the event-time axis for a change log).
    */
  case class TxEventTs(txId: String, k: Long, op: String, pos: Long,
                       ets: java.sql.Timestamp)

  /** Event-time retention variant: state eviction is driven by the
    * WATERMARK, not the wall clock, so it also runs to completion under
    * bounded AvailableNow replays (processing-time timeouts cannot — they
    * need the stream to stay up; see `reassemble`'s caveat). A tx whose
    * marker never arrives is evicted once the watermark passes its last
    * event + `retention`, and its buffered events are emitted with
    * `commitPos = -1` — the reference's abandoned-transaction path
    * (`log.mining.transaction.retention.ms`), made observable instead of
    * silently logged.
    */
  def reassembleEventTime(events: Dataset[TxEvent],
                          retention: String): Dataset[Committed] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ets", timestamp_micros(col("pos")))
      .as[TxEventTs]
      .withWatermark("ets", retention)
      .groupByKey(_.txId)
      .flatMapGroupsWithState[TxBuffer, Committed](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (txId: String, batch: Iterator[TxEventTs], state: GroupState[TxBuffer]) =>
          if (state.hasTimedOut) {
            val abandoned = state.getOption.toSeq.flatMap(_.events)
            state.remove()
            abandoned.sortBy(_.pos).iterator
              .map(e => Committed(txId, e.k, e.op, e.pos, -1L))
          } else {
            val incoming = batch.map(e => TxEvent(e.txId, e.k, e.op, e.pos)).toSeq
            val maxTsMs = incoming.map(_.pos).max / 1000L // µs → ms
            val out = handleBatch(txId, incoming, state)
            state.setTimeoutTimestamp(maxTsMs, retention)
            out
          }
      }
  }

  /** Shared marker/buffer logic of both retention modes. */
  private def handleBatch(txId: String, incoming: Seq[TxEvent],
                          state: GroupState[TxBuffer]): Iterator[Committed] = {
    val (markers, data) = incoming.partition(_.op == "m")
    val prev = state.getOption.getOrElse(TxBuffer(Seq.empty, None))
    val buffered = prev.events ++ data
    val commitPos = (markers.map(_.pos) ++ prev.committedPos).reduceOption(_ max _)
    commitPos match {
      case Some(cp) =>
        state.update(TxBuffer(Seq.empty, Some(cp)))
        buffered.sortBy(_.pos).iterator
          .map(e => Committed(txId, e.k, e.op, e.pos, cp))
      case None =>
        state.update(TxBuffer(buffered, None))
        Iterator.empty
    }
  }

  /** Batch-mode harness: run the reassembly over a transport directory as
    * an AvailableNow stream, collecting committed events into a memory
    * sink. Returns the committed events as a DataFrame.
    */
  def runOnTransport(spark: SparkSession, transportDir: String,
                     filesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(transportDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(transportDir)
      .as[TxEvent]
    val name = s"tx_reassembly_${System.nanoTime()}"
    val q = reassemble(stream).writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
