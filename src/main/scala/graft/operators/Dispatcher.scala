package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event dispatcher (SURVEY P2; reference
  * `pipeline/EventDispatcher.java:74,223,278,379-467`): classify each
  * record of a mixed stream into its output class (data / schema-change /
  * transaction / heartbeat / notification) and fan out one output per
  * class. In Spark this is N filters over one cached plan — each output is
  * a column-pruned scan, not a second read of the source.
  */
object Dispatcher {

  /** Classification expression for an envelope frame. */
  def eventClass(op: Column): Column =
    when(op.isin("r", "c", "u", "d"), "data")
      .when(op === "t", "schema")
      .when(op === "m", "heartbeat")
      .otherwise("notification")

  /** Fan out by class. */
  def dispatch(df: DataFrame, classCol: Column): Map[String, DataFrame] = {
    val tagged = df.withColumn("_class", classCol)
    Seq("data", "schema", "heartbeat", "notification")
      .map(c => c -> tagged.filter(col("_class") === c).drop("_class"))
      .toMap
  }

  /** Per-class counts (monitoring view of the dispatcher). */
  def classCounts(df: DataFrame, classCol: Column): DataFrame =
    df.groupBy(classCol.as("event_class")).agg(count(lit(1)).as("n"))
}
