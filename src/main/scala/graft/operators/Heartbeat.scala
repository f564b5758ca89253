package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heartbeat records (SURVEY P5): one liveness record per position interval
  * (reference `heartbeat/HeartbeatImpl.java:33-129` emits one per
  * `heartbeat.interval.ms`; here the axis is the log position so the output
  * is deterministic).
  */
object Heartbeat {

  /** One op='m' heartbeat row per covered position interval of the feed. */
  def intervals(feed: DataFrame, every: Long): DataFrame =
    feed
      .select(floor(col("source.pos") / every).cast("long").as("interval"))
      .distinct()
      .select(col("interval"),
        ((col("interval") + 1) * every - 1).as("hb_pos"),
        lit("m").as("op"))

  /** ACTION heartbeat (reference `heartbeat/DatabaseHeartbeatImpl.java:24-29`
    * — `heartbeat.action.query`): instead of merely EMITTING a liveness
    * record, the connector EXECUTES a write (typically an upsert into a
    * dedicated heartbeat table) on every tick, so the database log itself
    * carries at least one event per interval and the committed source
    * offset keeps advancing while every MONITORED table is idle — the fix
    * for WAL-retention blowup on quiet databases (and the window-close
    * driver for the PG read-only incremental snapshot, see
    * [[IncrementalSnapshot.readOnlyChunkMergePg]]).
    *
    * Modeled log-deterministically: ticks fire at positions `every`,
    * `2·every`, … up to `logEnd` (the action write IS the log event at
    * the tick position). Output, one row per tick:
    *  - `interval`, `hb_pos` — the tick and its log position;
    *  - `last_data_pos` — newest monitored event at or before the tick
    *    (null while none yet);
    *  - `offset_pos` — the committed source offset after the tick: the
    *    heartbeat's own position, ALWAYS ≥ the stalled data position;
    *  - `advanced` — true when the tick's interval carried NO monitored
    *    event, i.e. the offset advance is attributable to the heartbeat
    *    write alone (the reference's reason-to-exist case: without the
    *    action query the offset would still sit at `last_data_pos`).
    *
    * Shape: the monitored feed folds to one max-pos row per interval
    * (map-side combinable), and only the TICK AXIS (`logEnd / every`
    * rows) crosses the running-max window — never the feed.
    */
  def actionBeats(monitored: DataFrame, every: Long, logEnd: Long): DataFrame = {
    val spark = monitored.sparkSession
    // logEnd/every ticks: the last tick is the largest (id+1)*every that
    // is still <= logEnd — no tick ever points past the end of the log
    val ticks = spark.range(0, logEnd / every)
      .select(col("id").as("interval"), ((col("id") + 1) * every).as("hb_pos"))
    val perInterval = monitored
      .select(floor(col("source.pos") / every).cast("long").as("interval"),
        col("source.pos").as("pos"))
      .groupBy(col("interval")).agg(max(col("pos")).as("mx"))
    // constant partition key = deliberately global; input is the bounded
    // tick axis (see Windows.globalKey for the convention)
    val w = Window
      .partitionBy(graft.functions.Windows.globalKey(col("interval")))
      .orderBy(col("interval"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ticks.join(perInterval, Seq("interval"), "left")
      .withColumn("last_data_pos", max(col("mx")).over(w))
      .select(col("interval"), col("hb_pos"),
        col("last_data_pos"),
        col("hb_pos").as("offset_pos"),
        col("mx").isNull.as("advanced"))
  }
}
