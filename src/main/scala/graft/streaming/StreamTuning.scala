package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-stream shuffle/state sizing.
  *
  * `spark.sql.shuffle.partitions` is a SESSION conf, and for a
  * Structured Streaming query it is load-bearing twice over: it fixes
  * the state-store partition count for the life of the checkpoint, and
  * every micro-batch pays one task per partition per stateful stage.
  * A session sized for the BATCH surface (32+ on the bench session,
  * hundreds on a real cluster) makes a small micro-batch spend more
  * wall-clock scheduling empty state tasks than processing rows.
  *
  * The fix is never a hard-pinned small number — at 100 TB the same
  * stream needs the wide layout — but a width derived from the volume
  * the stream will actually carry, clamped to the session's own
  * default so a production session keeps its cluster-sized fan-out:
  * tiny local replays collapse to a handful of state partitions,
  * cluster-scale volumes keep the session width.
  */
object StreamTuning {

  /** A session clone whose shuffle/state width is sized for one
    * stream. The clone shares the SparkContext (no new executors) but
    * owns its conf, so the override never leaks into the caller's
    * session or other concurrently running queries.
    */
  def sessionFor(s: SparkSession, partitions: Int): SparkSession = {
    val ns = s.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    ns
  }

  /** Stream width from expected total row volume: one state partition
    * per `rowsPerPartition` rows, at least `floorWidth` (state stores
    * rebalance badly at width 1), at most the session's current
    * default (the cluster-sized ceiling — this function only ever
    * narrows).
    */
  def widthFor(s: SparkSession, totalRows: Long,
               rowsPerPartition: Long = 250000L,
               floorWidth: Int = 2): Int = {
    val ceiling = s.conf.get("spark.sql.shuffle.partitions").toInt
    val need = ((totalRows + rowsPerPartition - 1) / rowsPerPartition).toInt
    math.min(ceiling, math.max(floorWidth, need))
  }

  /** [[sessionFor]] + [[widthFor]] in one step. */
  def tuned(s: SparkSession, totalRows: Long,
            rowsPerPartition: Long = 250000L): SparkSession =
    sessionFor(s, widthFor(s, totalRows, rowsPerPartition))
}
