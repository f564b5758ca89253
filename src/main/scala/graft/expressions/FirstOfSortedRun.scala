package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BaseOrdering, Expression, Nondeterministic, RowOrdering, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** TRUE for the first row of each run of equal `child` (struct) values in a
  * partition's iteration order — the streaming "first per key after a
  * within-partition sort" predicate of
  * [[graft.operators.Materialize.reduceToBuckets]].
  *
  * Replaces a `Dataset.mapPartitions` dedup closure, which forced a full
  * external-row round trip per event (DeserializeToObject →
  * SerializeFromObject over the nested envelope structs) on every sink
  * epoch. As a native predicate the reduce pipeline stays on InternalRow
  * end to end; the only per-row work is one field-wise key comparison
  * against the previous row.
  *
  * Correctness rests on three properties, all load-bearing:
  *   - it is `Nondeterministic`, so Catalyst will neither push it below
  *     the sort that establishes run adjacency, nor reorder, duplicate, or
  *     constant-fold it; per-task isolation of the mutable state comes from
  *     Spark's task-closure deserialization (each task deserializes its own
  *     copy of the predicate tree) plus `initialize(partitionIndex)` before
  *     the first row, and `CodegenFallback` keeps the hosting Filter out of
  *     whole-stage codegen, where a generated class's shared `references`
  *     array could otherwise hand one expression instance to concurrent
  *     tasks;
  *   - equality is `RowOrdering.compare == 0` over the struct's field
  *     types — the SAME natural ordering the preceding sort used, so "equal
  *     keys are adjacent" and "this row starts a new run" agree exactly
  *     (binary comparison of UnsafeRows would disagree with the sort on
  *     -0.0/NaN float keys);
  *   - the previous key is a defensive `copy()` — the input row buffer is
  *     reused by the sorter across rows.
  */
case class FirstOfSortedRun(child: Expression)
    extends UnaryExpression with Nondeterministic with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // orderability gate (ADVICE r15): initializeInternal builds a
    // RowOrdering over the struct's field types, which throws at executor
    // runtime for unorderable fields (e.g. map) — as a registered session
    // SQL function, misuse must fail at ANALYSIS time instead
    case s: StructType if RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case s: StructType => TypeCheckResult.TypeCheckFailure(
      s"first_of_sorted_run key struct contains unorderable field types: " +
        s"${s.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"first_of_sorted_run expects a struct key, got ${other.simpleString}")
  }

  @transient private[this] var ord: BaseOrdering = _
  @transient private[this] var prev: InternalRow = _
  @transient private[this] var prevNull: Boolean = _
  @transient private[this] var havePrev: Boolean = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    ord = RowOrdering.createNaturalAscendingOrdering(
      child.dataType.asInstanceOf[StructType].fields.map(_.dataType).toIndexedSeq)
    prev = null
    prevNull = false
    havePrev = false
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val k = child.eval(input).asInstanceOf[InternalRow]
    val first =
      if (!havePrev) true
      else if (k == null || prevNull) (k == null) != prevNull
      else ord.compare(prev, k) != 0
    if (first) {
      havePrev = true
      prevNull = k == null
      prev = if (k == null) null else k.copy()
    }
    first
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_first_of_sorted_run"
}
