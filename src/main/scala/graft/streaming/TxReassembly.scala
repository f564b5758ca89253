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
    */
  def reassemble(events: Dataset[TxEvent]): Dataset[Committed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.txId)
      .flatMapGroupsWithState[TxBuffer, Committed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (txId: String, batch: Iterator[TxEvent], state: GroupState[TxBuffer]) =>
          val incoming = batch.toSeq
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
