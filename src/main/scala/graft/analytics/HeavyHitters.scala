package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Frequent-terms profiling with the Misra–Gries summary
  * (`expressions.MisraGries`) — the vocabulary-agnostic top-k: the
  * exact `groupBy(term).count` shuffles every distinct term of the
  * corpus (at web scale, billions of keys for a top-100 answer); the
  * sketch shuffles at most `capacity` counters per partition per group
  * and still guarantees every term above the `N/(capacity+1)` frequency
  * threshold surfaces with a count underestimated by at most that bound.
  */
object HeavyHitters {

  /** Per-`lang` top-`k` terms `(lang, rk, term, n)`. Exact whenever a
    * language's distinct-term count stays within `capacity` (the
    * verification regime at fixture scale).
    */
  def topTermsByLang(docs: DataFrame, k: Int, capacity: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"))
      .agg(GraftFunctions.misraGries(col("term"), capacity).as("hh"))
      .select(col("lang"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e.term").as("term"), col("e.count").as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("term"))).cast("int"))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("term"), col("n"))
  }
}
