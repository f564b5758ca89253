package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; MERGEABLE per
  * Agarwal et al., "Mergeable Summaries", PODS 2012) as a typed aggregate:
  * at most `capacity` counters survive per partial buffer, so a
  * frequent-terms query over any corpus size shuffles `capacity ×
  * partitions` counters instead of the full term dictionary — the
  * vocabulary-agnostic top-k the exact count-groupBy cannot give at
  * web scale (its shuffle carries every distinct term).
  *
  * Guarantee: every counter satisfies `true - N/(capacity+1) ≤ c ≤ true`,
  * and any term with true count > N/(capacity+1) is present. When the
  * distinct-term count never exceeds `capacity` (no decrements, no merge
  * truncation) the summary is EXACT — the verification regime; the
  * error-bounded regime is spec-asserted separately.
  *
  * Update is the classic decrement-all step; merge sums counters and
  * subtracts the (capacity+1)-th largest before truncating (the PODS
  * merge that preserves the bound). On Zipf-shaped text the hot terms
  * pin their counters, so decrements touch only the tail.
  */
case class MisraGries(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Buffer] {

  private lazy val capacity: Int = {
    require(capacityExpr.foldable, "misra_gries capacity must be a literal")
    capacityExpr.eval().asInstanceOf[Number].intValue()
  }

  override def children: Seq[Expression] = Seq(child, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"misra_gries expects a string term, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): MisraGries.Buffer =
    new MisraGries.Buffer(new java.util.HashMap[String, Long]())

  override def update(buf: MisraGries.Buffer, input: InternalRow): MisraGries.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      val m = buf.counts
      val cur = m.get(term)
      if (cur != null) m.put(term, cur + 1L)
      else if (m.size < capacity) m.put(term, 1L)
      else {
        // decrement-all; drop zeros (the O(capacity) step that buys the
        // N/(capacity+1) bound)
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: MisraGries.Buffer, b: MisraGries.Buffer): MisraGries.Buffer = {
    val m = a.counts
    b.counts.forEach { (t, c) =>
      val cur = m.get(t)
      m.put(t, if (cur == null) c else cur + c)
    }
    if (m.size > capacity) {
      val counts = new Array[Long](m.size)
      var i = 0
      val vit = m.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
    a
  }

  override def eval(buf: MisraGries.Buffer): Any = {
    import scala.jdk.CollectionConverters._
    val sorted = buf.counts.entrySet().asScala.toArray
      .sortBy(e => (-e.getValue, e.getKey))
    new GenericArrayData(sorted.map { e =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue.longValue())): Any
    })
  }

  override def serialize(buf: MisraGries.Buffer): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val entries = buf.counts.entrySet().asScala.toSeq.map { e =>
      (e.getKey.getBytes(StandardCharsets.UTF_8), e.getValue.longValue())
    }
    val bb = ByteBuffer.allocate(4 +
      entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.size)
    entries.foreach { case (k, v) =>
      bb.putInt(k.length); bb.put(k); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val k = new Array[Byte](len); bb.get(k)
      m.put(new String(k, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    new MisraGries.Buffer(m)
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
  override def prettyName: String = "graft_misra_gries"
}

object MisraGries {
  final class Buffer(val counts: java.util.HashMap[String, Long])
}
