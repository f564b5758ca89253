package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key — the temporal-enrichment
  * operator CDC consumers constantly need (and Spark lacks as a builtin).
  *
  * Implementation is the union-tag-window form, NOT a range join: both
  * sides are tagged and unioned, then one window per key ordered by
  * (time, side) carries the last right-side payload forward
  * (`last_value(..., ignoreNulls)`). Cost: ONE shuffle on the key and a
  * per-key sort — at 100 TB this scales like any keyed window (skew →
  * AQE/salting), whereas a naive range join is O(n·m) per key.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its latest row at/below the probe
    *                   time is attached)
    * @param keyCols    equi-join key column names (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to attach (renamed `asof_<name>`)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows sort BEFORE left rows at the same timestamp, so a
    // right row with rightTime == leftTime is visible to that left row
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"_p_$p")): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"asof_$p",
        last(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(keyCols.map(col) ++ Seq(col("_t").as(leftTime)) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == leftTime).map(col) ++
        payload.map(p => col(s"asof_$p")): _*)
  }
}
