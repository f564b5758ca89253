package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY "optimize for scale"): a two-phase
  * aggregation that first aggregates on (key, salt) — spreading one hot key
  * over `salts` reducers — then combines partials by key. Associative
  * aggregates only. With AQE's skew handling this is rarely hand-written,
  * but it is the explicit form the engine applies for pathological keys.
  */
object Salting {

  /** count/sum aggregation with an explicit salt stage. The salt must be
    * deterministic per row (NOT random) so re-execution of a failed task
    * reproduces the same partials; a row-identity hash does that.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltSrc: Column, salts: Int): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(saltSrc), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(value).as("_s"))
      .groupBy(col("key"))
      .agg(sum(col("_n")).as("n"), round(sum(col("_s")), 4).as("sum_value"))
}
