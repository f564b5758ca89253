package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering
  * (Morton 1966; the layout behind Delta/Iceberg `OPTIMIZE ZORDER BY`):
  * interleave the low `bits` of two non-negative integer columns so
  * that sorting by the z-value places rows close in BOTH dimensions
  * near each other on disk — min/max zone maps then prune range
  * predicates on either column, which a single-column sort gives for
  * only one of them.
  *
  * Pure integer bit arithmetic (`shiftright`/`shiftleft`/`& 1` folded
  * over a literal range), so z-values are bit-identical in any engine
  * and need no UDF. 100 TB shape: computing z is a map-only
  * projection; the layout write is the ONE range-partitioned sort a
  * clustering rewrite always costs, and every later scan pays zero —
  * pruning happens in file skipping.
  */
object ZOrder {

  /** Morton code of (x, y): bit i of x lands at position 2i, bit i of
    * y at 2i+1. Inputs must be non-negative and < 2^bits (mask/bucket
    * first — the caller picks the resolution).
    */
  def zValue(x0: Column, y0: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val x = x0.cast("long")
    val y = y0.cast("long")
    // statically unrolled: a flat codegen-friendly expression tree, no
    // per-row array or lambda evaluation on the clustering sort path
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
