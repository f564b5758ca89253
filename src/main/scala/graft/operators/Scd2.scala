package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Envelope

/** SCD-2 history table from a change feed: every key VERSION becomes a
  * row with a validity interval — the standard "temporal table" /
  * "history table" consumers build downstream of a CDC feed (the
  * reference materializes only latest state through its sinks; history
  * tables are the canonical warehouse pattern layered on the same
  * envelope stream, e.g. for as-of dimension joins in training-data
  * reproducibility).
  *
  * Semantics per key, events ordered by source position:
  *  - r/c/u events OPEN a version carrying their after-image at
  *    `valid_from_pos` = event pos;
  *  - the next event for the key CLOSES it exclusively
  *    (`valid_to_pos` = next pos); the final version stays open
  *    (`valid_to_pos` NULL, `is_current` true);
  *  - a delete closes the previous version and emits NO row (deleted
  *    keys have no current version), exactly the tombstone semantics of
  *    a compacted topic;
  *  - tombstone markers (op=t) are transport artifacts and are ignored.
  *
  * Scale shape: ONE shuffle on the key for the lead() window; per-key
  * history is bounded by that key's change count, so partitions stay
  * balanced at any table size. The as-of read is then a plain range
  * predicate (`valid_from_pos <= p AND (valid_to_pos IS NULL OR
  * valid_to_pos > p)`) — no join, prunable by min/max stats when the
  * history is written sorted by key/pos.
  */
object Scd2 {

  /** Interval algebra over flat (key, op, after, pos) events: each
    * non-delete event opens a version at its pos; the key's next event
    * closes it exclusively. Also the incremental-maintenance core
    * ([[graft.streaming.Scd2Sink]]): a stored OPEN version re-enters as
    * a synthetic read event and the algebra reproduces or closes it.
    */
  def intervals(events: DataFrame): DataFrame = {
    // pos is the collision-free log order; the op tiebreak makes the
    // result deterministic even if a caller violates that invariant
    // (e.g. a stored open version re-entering at its own valid_from_pos)
    val w = Window.partitionBy(col("key")).orderBy(col("pos"), col("op"))
    events
      .withColumn("valid_to_pos", lead(col("pos"), 1).over(w))
      .filter(col("op") =!= Envelope.OpDelete)
      // zero-width versions (valid_to_pos == valid_from_pos) arise only
      // when two events share a pos — e.g. a batch event redelivered at
      // the exact pos of a stored open version re-entering as a
      // synthetic read. A zero-width version is never observable by any
      // as-of read, so drop it rather than emit a degenerate row.
      .filter(col("valid_to_pos").isNull ||
        col("valid_to_pos") =!= col("pos"))
      .select(col("key"), col("after"),
        col("pos").as("valid_from_pos"), col("valid_to_pos"))
  }

  /** Flatten interval rows to the user-facing history shape. */
  def present(iv: DataFrame): DataFrame = {
    val payloadCols = iv.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    iv.select(
      payloadCols.toIndexedSeq.map(c => col(s"after.`$c`").as(c)) ++
        Seq(col("valid_from_pos"), col("valid_to_pos"),
          col("valid_to_pos").isNull.as("is_current")): _*)
  }

  def historyTable(feed: DataFrame): DataFrame =
    present(intervals(
      feed.filter(col("op") =!= Envelope.OpTombstone)
        .select(col("key"), col("op"), col("after"),
          col("source.pos").as("pos"))))

  /** State as of position `p` from the history table: a pure filter +
    * projection (no join, no window).
    */
  def asOf(history: DataFrame, p: Long): DataFrame =
    history
      .filter(col("valid_from_pos") <= p &&
        (col("valid_to_pos").isNull || col("valid_to_pos") > p))
      .drop("valid_from_pos", "valid_to_pos", "is_current")
}
