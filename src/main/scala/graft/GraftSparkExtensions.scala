package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.GraftFunctions

/** Config-driven injection of the engine's native Catalyst expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftSparkExtensions ...
  * }}}
  *
  * makes `graft_cosine`, `graft_minhash`, `graft_nearest_cell` and
  * `graft_latest_by_pos` available to every session on the cluster as
  * plain SQL functions — no driver-side code, no per-session
  * [[graft.expressions.GraftFunctions.register]] call. This is the
  * deployment path a shared cluster uses (the reference loads its SPI
  * implementations from the classpath the same way, e.g. converters at
  * `debezium-core/src/main/java/io/debezium/relational/CustomConverterRegistry.java:45`);
  * injected functions survive `spark.newSession()` where temp-function
  * registration does not.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder
      ))
    }
    // SQL UPDATE / MERGE INTO on sink-catalog tables — see
    // graft.sinks.v2.GraftDmlResolution for why the strict write
    // contract needs this analyzer assist
    ext.injectResolutionRule(spark =>
      new graft.sinks.v2.GraftDmlResolution(spark))
  }
}
