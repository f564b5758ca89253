package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transaction metadata (SURVEY P4) — per-event ordering inside a source
  * transaction plus BEGIN/END boundary records (reference
  * `pipeline/txmetadata/TransactionMonitor.java:33-47,121-128`).
  *
  * Scale note: both windows partition by txId — transactions are small and
  * numerous, so the shuffle is well-distributed and each partition sorts only
  * a handful of rows. No global sort anywhere.
  */
object TxMetadata {

  /** Attach the `transaction` block: id, total_order (event's position in
    * its tx), data_collection_order (position among events of the same table
    * in the tx).
    */
  def attach(feed: DataFrame): DataFrame = {
    val streamed = feed.filter(col("source.txId").isNotNull)
    val byTx = Window.partitionBy(col("source.txId")).orderBy(col("source.pos"))
    val byTxTable = Window.partitionBy(col("source.txId"), col("source.table"))
      .orderBy(col("source.pos"))
    streamed.withColumn("transaction", struct(
      col("source.txId").as("id"),
      row_number().over(byTx).cast("long").as("total_order"),
      row_number().over(byTxTable).cast("long").as("data_collection_order")))
  }

  /** BEGIN/END boundary records: one row per transaction with its event
    * count and position span — the batch analogue of the reference's
    * `…transaction` topic records (emitted at commit watermark).
    */
  def boundaries(feed: DataFrame): DataFrame =
    feed.filter(col("source.txId").isNotNull)
      .groupBy(col("source.txId").as("tx_id"))
      .agg(
        count(lit(1)).as("event_count"),
        min(col("source.pos")).as("begin_pos"),
        max(col("source.pos")).as("end_pos"))
}
