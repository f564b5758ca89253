package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise sum of `array<double>` vectors — the centroid-update
  * aggregate of distributed Lloyd's (`graft.analytics.Ivf
  * .fitCentroidsDistributed`). As a TypedImperativeAggregate it runs
  * under ObjectHashAggregateExec with map-side partial aggregation: each
  * partition folds its vectors into at most one dims-length buffer per
  * cell, so only `cells-per-partition × dims` doubles cross the shuffle
  * per iteration — never the vectors, and never a per-dimension exploded
  * row (a posexplode formulation multiplies rows by dims AND re-evaluates
  * any projected per-row expression — e.g. the O(k·d) nearest-cell
  * assignment — once per exploded row when the optimizer collapses the
  * projection above the Generate).
  *
  * Vectors must share one dimension per group; a mismatch or a null
  * element is corrupt input and raises rather than summing a prefix.
  * Null VECTORS are skipped (SQL aggregate convention).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSum.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum expects array<double>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): VectorSum.Buffer =
    new VectorSum.Buffer(null)

  override def update(buf: VectorSum.Buffer, input: InternalRow): VectorSum.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val m = a.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](m)
      require(buf.sums.length == m,
        s"vector_sum dimension mismatch: ${buf.sums.length} vs $m")
      var i = 0
      while (i < m) {
        require(!a.isNullAt(i), s"vector_sum null element at $i")
        buf.sums(i) += a.getDouble(i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: VectorSum.Buffer, b: VectorSum.Buffer): VectorSum.Buffer = {
    if (b.sums != null) {
      if (a.sums == null) a.sums = b.sums
      else {
        require(a.sums.length == b.sums.length,
          s"vector_sum dimension mismatch: ${a.sums.length} vs ${b.sums.length}")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      }
    }
    a
  }

  override def eval(buf: VectorSum.Buffer): Any =
    if (buf.sums == null) null else new GenericArrayData(buf.sums)

  // 1-byte presence flag: a null buffer (no vectors seen) and a
  // ZERO-LENGTH sums array (all inputs were empty arrays) must stay
  // distinct across partial-aggregation shuffles, or the result would
  // depend on whether a map-side merge happened (empty array vs NULL)
  override def serialize(buf: VectorSum.Buffer): Array[Byte] = {
    if (buf.sums == null) Array[Byte](0)
    else {
      val bb = ByteBuffer.allocate(1 + 8 * buf.sums.length)
      bb.put(1.toByte)
      var i = 0
      while (i < buf.sums.length) { bb.putDouble(buf.sums(i)); i += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): VectorSum.Buffer =
    if (bytes(0) == 0) new VectorSum.Buffer(null)
    else {
      val bb = ByteBuffer.wrap(bytes, 1, bytes.length - 1)
      val sums = new Array[Double]((bytes.length - 1) / 8)
      var i = 0
      while (i < sums.length) { sums(i) = bb.getDouble; i += 1 }
      new VectorSum.Buffer(sums)
    }

  override def withNewMutableAggBufferOffset(o: Int): VectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_vector_sum"
}

object VectorSum {
  final class Buffer(var sums: Array[Double])
}
