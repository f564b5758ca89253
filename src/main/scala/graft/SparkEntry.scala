package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Materialize
import graft.queries._
import graft.sources.ChangeFeedGen
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.queries.* groups (one per SURVEY §2 area); each
  * entry pairs a Spark implementation with a DuckDB oracle over the same
  * parquet tables. The change feed is the deterministic script of
  * ChangeFeedGen (pure function of the PK), so CDC operators are
  * oracle-checkable in plain SQL.
  */
object SparkEntry {

  val groups: Seq[QueryGroup] =
    Seq(CoreCdcQueries, TransformQueries, RoutingQueries, AnalyticsQueries,
      CorpusQueries, StreamingQueries, FunctionQueries, PipelineQueries,
      ExtendedQueries, ConfigQueries, WireQueries, StorageQueries,
      EngineQueries)

  /** Flagship: materialize the orders change stream into latest table state
    * on /root/testdata/sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    Materialize.latestState(ChangeFeedGen.standardFeed(orders, "orders"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** DuckDB-equivalent SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracles).toMap

  /** Oracles the local Spark parity spec cannot run (DuckDB dialect). */
  def duckdbOnlyOracles: Set[String] =
    groups.flatMap(_.duckdbOnly).toSet
}
