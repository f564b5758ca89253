package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{ChangeFeedGen, Tables}

/** One named group of oracle-checked queries. */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Oracles in DuckDB-only dialect: the Spark parity spec skips them; the
    * driver (and tools/check_oracle.py) still verifies them in DuckDB.
    */
  def duckdbOnly: Set[String] = Set.empty

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  protected def feed(s: SparkSession, dir: String, name: String): DataFrame =
    ChangeFeedGen.standardFeed(t(s, dir, name), name)
}
