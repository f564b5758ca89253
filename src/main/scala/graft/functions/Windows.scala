package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Window helpers. */
object Windows {

  /** A constant-valued partition key for DELIBERATELY-global windows
    * over bounded inputs (a histogram, a tick axis, a top-k slice).
    *
    * Why not `lit(0)`: Catalyst constant-folds a literal partition key
    * out of the window spec, restoring the empty spec — and with it
    * WindowExec's "No Partition Defined" warning, whose whole point of
    * removal is that a REAL unbounded global window elsewhere should
    * still stand out in the logs. `pmod(c, 1)` evaluates to 0 on every
    * row but references a column, so it survives optimization and gives
    * WindowExec a (single-group) clustered distribution.
    *
    * `c` must be an INTEGRAL column — on a fractional column `pmod(c,1)`
    * is the fractional part, which would silently split the window.
    */
  def globalKey(c: Column): Column = pmod(c, lit(1))
}
