package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StructType}

/** "Latest row by offset" aggregate (SURVEY §4's suggested custom
  * Catalyst work): keeps the `value` struct with the highest `pos` per
  * group. Functionally max_by(value, pos), but as a TypedImperativeAggregate
  * it runs under ObjectHashAggregateExec — hash-based, no per-partition
  * sort — where struct-buffered declarative aggregates (max_by) fall back
  * to SortAggregate. For the CDC reduce (one winner per PK over billions of
  * keys) removing that sort is the difference at 100 TB.
  *
  * Buffer: (pos, copied value row); serialized as pos + UnsafeRow bytes.
  */
case class LatestByPos(
    value: Expression,
    pos: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestByPos.Buffer] {

  override def children: Seq[Expression] = Seq(value, pos)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType

  // SQL-registered for every session: a wrong-typed call must fail at
  // analysis, not ClassCastException mid-job in update()
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (value.dataType, pos.dataType) match {
      case (_: StructType, org.apache.spark.sql.types.LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (v, p) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"latest_by_pos expects (struct, bigint), got " +
            s"${v.simpleString}, ${p.simpleString}")
    }

  private lazy val valueSchema = value.dataType.asInstanceOf[StructType]
  @transient private lazy val proj = UnsafeProjection.create(valueSchema)

  override def createAggregationBuffer(): LatestByPos.Buffer =
    new LatestByPos.Buffer(Long.MinValue, null)

  override def update(buf: LatestByPos.Buffer, input: InternalRow): LatestByPos.Buffer = {
    val p = pos.eval(input)
    if (p != null) {
      val pl = p.asInstanceOf[Long]
      if (pl > buf.pos) {
        val v = value.eval(input)
        buf.pos = pl
        buf.row =
          if (v == null) null
          else proj(v.asInstanceOf[InternalRow]).copy()
      }
    }
    buf
  }

  override def merge(a: LatestByPos.Buffer, b: LatestByPos.Buffer): LatestByPos.Buffer =
    if (b.pos > a.pos) b else a

  override def eval(buf: LatestByPos.Buffer): Any =
    if (buf.pos == Long.MinValue) null else buf.row

  override def serialize(buf: LatestByPos.Buffer): Array[Byte] = {
    val rowBytes = if (buf.row == null) Array.emptyByteArray else buf.row.getBytes
    val bb = ByteBuffer.allocate(8 + 4 + rowBytes.length)
    bb.putLong(buf.pos)
    bb.putInt(if (buf.row == null) -1 else rowBytes.length)
    bb.put(rowBytes)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LatestByPos.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val p = bb.getLong
    val n = bb.getInt
    if (n < 0) new LatestByPos.Buffer(p, null)
    else {
      val arr = new Array[Byte](n)
      bb.get(arr)
      val row = new UnsafeRow(valueSchema.length)
      row.pointTo(arr, n)
      new LatestByPos.Buffer(p, row)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): LatestByPos =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LatestByPos =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), pos = newChildren(1))
  override def prettyName: String = "graft_latest_by_pos"
}

object LatestByPos {
  final class Buffer(var pos: Long, var row: UnsafeRow)
}
