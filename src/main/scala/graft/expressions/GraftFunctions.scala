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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => {
        require(exprs(1).foldable, "minhash numPerm must be a literal")
        MinHashSignature(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_cell", exprs => {
        // 2nd arg must be a foldable array<array<double>> literal — the
        // centroid matrix is evaluated once at plan time, not per row
        require(exprs(1).foldable, "nearest_cell centroids must be a literal")
        val ad = exprs(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        val mat = Array.tabulate(ad.numElements())(i =>
          ad.getArray(i).toDoubleArray())
        NearestCell(exprs(0), mat)
      }, "built-in")
    registered = true
  }

  /** Cosine similarity via the native expression (register(spark) first). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Latest-struct-by-position aggregate (register(spark) first). */
  def latestByPos(value: Column, pos: Column): Column =
    call_function("graft_latest_by_pos", value, pos)

  /** Nearest-centroid cell id via the native expression
    * (register(spark) first).
    */
  def nearestCell(emb: Column, centroids: Seq[Seq[Double]]): Column =
    call_function("graft_nearest_cell", emb,
      org.apache.spark.sql.functions.typedLit(centroids))

  /** One-pass MinHash signature array (register(spark) first). */
  def minhash(shingles: Column, numPerm: Int): Column =
    call_function("graft_minhash", shingles,
      org.apache.spark.sql.functions.lit(numPerm))
}
