package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error handling (SURVEY P8; reference `pipeline/ErrorHandler.java`):
  * instead of a retry loop around a poll thread, the Spark engine routes
  * rows that fail a validation/parse predicate to a dead-letter output and
  * lets the healthy partition proceed — per-record try/catch becomes a
  * split on a null-propagating expression (parse failures in Spark SQL
  * surface as nulls, never exceptions, so the plan stays codegen'd).
  */
object ErrorHandling {

  final case class Split(ok: DataFrame, deadLetter: DataFrame)

  /** Split on `valid`; dead letters carry a reason column. */
  def quarantine(df: DataFrame, valid: Column, reason: String): Split =
    Split(
      ok = df.filter(valid),
      deadLetter = df.filter(!valid || valid.isNull)
        .withColumn("dlq_reason", lit(reason)))

  /** Counts per outcome (the error-rate monitoring view). */
  def outcomeCounts(df: DataFrame, valid: Column): DataFrame =
    df.groupBy(when(valid, "ok").otherwise("dead_letter").as("outcome"))
      .agg(count(lit(1)).as("n"))
}
