package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay documents end-to-end
  * into fixed token-budget windows (concatenate-and-chunk, the standard
  * pretraining batch layout) and report each document's pack id and
  * offset.
  *
  * 100 TB shape: a global concatenation order would serialize on one
  * partition, so documents are first sharded (`pmod(doc_id, shards)` —
  * any deterministic key works) and the running token offset is a
  * window sum WITHIN each shard: one hash shuffle on the shard key,
  * then a single sorted pass per partition. Shard count scales with the
  * cluster; each shard's window state is one counter, so partitions
  * never buffer the corpus. Deterministic: reruns produce identical
  * pack assignments, which is what makes packed datasets reproducible.
  */
object SequencePack {

  /** Assign each document a shard, a pack (budget-sized window of the
    * shard's concatenated token stream), and its start offset within
    * that pack. Documents spanning a boundary start in the pack that
    * contains their first token (`floor(start / budget)`).
    *
    * @param tokenCount column producing the document's token count
    * @param budget     tokens per packed sequence
    * @param shards     number of independent packing streams
    */
  def pack(docs: DataFrame, tokenCount: Column, budget: Int,
           shards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards)).as("shard"),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).cast("long").as("pack_id"),
        ((col("cum") - col("n_tokens")) % budget).as("pack_offset"))
  }

  /** One INCREMENTAL packing step: assign packs to a new batch given
    * `bases` — tokens already consumed per shard by every earlier batch
    * — and return the assignment plus the advanced bases. Feeding
    * batches in document order reproduces `pack` of the concatenation
    * bit-for-bit, so a streaming curation pipeline can emit final pack
    * ids per micro-batch instead of re-packing at read time.
    *
    * The advanced bases come from ONE bounded collect (≤ `shards`
    * rows); persist them between epochs (see `stream_incremental_pack`)
    * and a replayed epoch re-reads its predecessor's bases, keeping the
    * step idempotent.
    */
  def packIncrement(batch: DataFrame, tokenCount: Column, budget: Int,
                    shards: Int, bases: Map[Long, Long]): (DataFrame, Map[Long, Long]) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val baseOf =
      if (bases.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(bases), col("shard")), lit(0L))
    val assigned = batch
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards)).as("shard"),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w) + baseOf)
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).cast("long").as("pack_id"),
        ((col("cum") - col("n_tokens")) % budget).as("pack_offset"))
    val advanced = assigned.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (assigned, bases ++ advanced.map { case (s, t) =>
      s -> (bases.getOrElse(s, 0L) + t) })
  }
}
