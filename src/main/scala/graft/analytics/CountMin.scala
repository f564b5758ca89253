package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005; mergeable
  * per Agarwal et al., PODS 2012) over the engine's PORTABLE md5 hash:
  * `depth` independent hash rows of `width` counters; a term's estimate
  * is the MIN of its counters and satisfies
  * `true ≤ est ≤ true + εN` with ε = e/width (overestimate only).
  *
  * Like the HLL and HDR sketches, the representation is deliberately
  * transparent: plain `(row, bucket, n)` rows built by one map-side-
  * combinable count agg (each token emits `depth` cells via a literal
  * array explode — map-only), merged across epochs/sources by
  * sum-by-cell, and bit-identical in any engine with md5 (bucket =
  * 32-bit hex prefix of md5(row ':' term) mod width). Total size
  * depth × width counters regardless of vocabulary — the point
  * frequency companion to Misra-Gries' top-k (which keeps only k
  * counters but answers only heavy hitters; CMS answers ANY term).
  *
  * 100 TB shape: the sketch shuffle carries ≤ depth·width cells per
  * partition; probes join the (tiny) query-term cell table against the
  * sketch — the corpus is read once and never re-shuffled.
  */
object CountMin {

  /** Cell coordinates of one term under hash row `i`. */
  def bucket(term: Column, i: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), term)), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch over a token column: (row, bucket, n). */
  def sketch(tokens: DataFrame, term: Column, depth: Int,
             width: Int): DataFrame =
    tokens
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), bucket(term, i, width).as("bucket"))): _*))
        .as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Point-frequency estimates for `terms`: min over the depth cells;
    * terms whose cells were never touched estimate 0 via the left join.
    */
  def estimate(sk: DataFrame, terms: Seq[String], depth: Int,
               width: Int): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val probes = terms.toDF("term")
      .select(col("term"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), bucket(col("term"), i, width).as("bucket"))): _*))
        .as("cell"))
      .select(col("term"), col("cell.row").as("row"),
        col("cell.bucket").as("bucket"))
    probes.join(sk, Seq("row", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
