package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration of the engine's native Catalyst expressions as SQL
  * functions. Idempotent; call once per session (every query that uses a
  * native function calls it defensively).
  */
object GraftFunctions {

  @volatile private var registered = false

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_latest_by_pos",
      exprs => LatestByPos(exprs(0), exprs(1)).toAggregateExpression(),
      "built-in")
    registered = true
  }

  /** Cosine similarity via the native expression (register(spark) first). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Latest-struct-by-position aggregate (register(spark) first). */
  def latestByPos(value: Column, pos: Column): Column =
    call_function("graft_latest_by_pos", value, pos)
}
