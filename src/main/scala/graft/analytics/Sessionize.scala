package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event stream: contiguous activity per key with
  * gaps above `gap` starting a new session (batch gaps-and-islands; the
  * streaming twin is `session_window` with a watermark). One shuffle on the
  * key; per-key sort inside the window.
  */
object Sessionize {

  /** Assign a session id (0-based per key) to each event. `ts` may be any
    * monotone numeric (epoch ns here).
    */
  def assign(df: DataFrame, key: Column, ts: Column, gap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    df
      .withColumn("_prev", lag(ts, 1).over(w))
      .withColumn("_new_session",
        when(col("_prev").isNull || ts - col("_prev") > gap, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("_new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("_prev", "_new_session")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessions(df: DataFrame, key: Column, ts: Column, gap: Long,
               value: Column): DataFrame =
    assign(df, key, ts, gap)
      .groupBy(key.as("key"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        // per-element quantization to long, then an exact integer sum:
        // order-independent under partial aggregation (a double sum's fold
        // order differs between Spark partials and a sequential engine)
        (sum(floor(value * 10000).cast("long")) / 10000.0).as("sum_value"))
}
