package graft.operators

import org.apache.spark.sql.DataFrame
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
}
