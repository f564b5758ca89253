package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog sketch over a PORTABLE hash (Flajolet et al. 2007; the
  * mergeable-summary framing of Agarwal et al., PODS 2012): `m = 2^p`
  * one-byte registers, register j = max over values hashing to bucket j
  * of (1 + leading-zero count) of a 52-bit suffix. Unlike Spark's
  * built-in `approx_count_distinct` (whose xxhash64-based dense/sparse
  * HLL++ buffer is opaque and engine-private), this sketch:
  *
  *  - hashes with md5 over the value's STRING form, so any engine with
  *    an md5 function reproduces the registers bit-for-bit — the
  *    verification path computes identical registers in DuckDB SQL
  *    (`substr(md5(v),…)` nibble arithmetic + `bin()` zero counts);
  *  - evaluates to a PLAIN BYTES value (the register array itself), so
  *    sketches persist in a parquet column and re-aggregate later with
  *    [[HllMergeAgg]] — per-epoch / per-source distinct counts roll up
  *    without re-reading the corpus, the mergeability
  *    `approx_count_distinct` computes internally but never exposes.
  *
  * 100 TB shape: the partial buffer is m bytes (256 at p=8) regardless
  * of input size, map-side combined, so a billion-row distinct count
  * shuffles m × partitions bytes. Register extraction:
  *
  *  - hex nibbles 0 .. p/4-1 of md5(v)  → bucket (p bits, hex-aligned
  *    so the SQL oracle is plain `substr`);
  *  - hex nibbles p/4 .. p/4+12 (52 bits, exact in a double-free
  *    BIGINT path) → w; rank = 53 - bitlength(w), i.e. leading zeros
  *    within the 52-bit field + 1, and 53 when w = 0.
  *
  * Estimation ([[HllEstimate]]) applies the standard alpha_m bias
  * constant and the small-range linear-counting correction; no
  * large-range correction is needed at a 52-bit hash width.
  */
object Hll {
  /** 52-bit suffix width: 13 hex nibbles after the bucket nibbles. */
  val SuffixBits = 52

  def requireP(p: Int): Unit =
    require(p >= 4 && p <= 16 && p % 4 == 0,
      s"hll precision must be a multiple of 4 in [4,16], got $p")

  private val hexVal: Array[Int] = {
    val a = Array.fill(128)(-1)
    "0123456789abcdef".zipWithIndex.foreach { case (c, i) => a(c) = i }
    a
  }

  /** per-thread digest: update() runs per input row — a fresh
    * getInstance per row would dominate the aggregate's hot path
    */
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** (bucket, rank) of one value under precision p. */
  def bucketRank(bytes: Array[Byte], p: Int): (Int, Int) = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(bytes)
    // nibble i of the hex rendering
    def nib(i: Int): Int = {
      val b = digest(i >> 1) & 0xff
      if ((i & 1) == 0) b >>> 4 else b & 0xf
    }
    val bucketNibs = p / 4
    var bucket = 0
    var i = 0
    while (i < bucketNibs) { bucket = (bucket << 4) | nib(i); i += 1 }
    var w = 0L
    i = 0
    while (i < 13) { w = (w << 4) | nib(bucketNibs + i); i += 1 }
    val rank =
      if (w == 0L) SuffixBits + 1
      else java.lang.Long.numberOfLeadingZeros(w) - (64 - SuffixBits - 1)
    (bucket, rank)
  }

  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Standard HLL estimate with linear-counting small-range correction;
    * register order is fixed (index order), so the double arithmetic is
    * deterministic for a given register array.
    */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    if (m == 0) return 0.0 // merge over zero sketches (empty marker)
    var sum = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = regs(j) & 0xff
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r, exact
      if (r == 0) zeros += 1
      j += 1
    }
    val raw = alpha(m) * m.toDouble * m.toDouble / sum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }
}

/** `graft_hll_agg(stringValue, p)` → BINARY sketch of 2^p registers.
  * NULLs are skipped (SQL COUNT DISTINCT convention).
  */
case class HllSketchAgg(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = {
    require(pExpr.foldable, "hll precision must be a literal")
    val v = pExpr.eval().asInstanceOf[Number].intValue()
    Hll.requireP(v)
    v
  }

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_agg hashes the value's string form; cast first (got ${other.simpleString})")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (bucket, rank) = Hll.bucketRank(v.asInstanceOf[UTF8String].getBytes, p)
      if (rank > (buf(bucket) & 0xff)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < a.length) {
      if ((b(j) & 0xff) > (a(j) & 0xff)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), pExpr = newChildren(1))
  override def prettyName: String = "graft_hll_agg"
}

/** `graft_hll_merge(sketch)` → BINARY: register-wise max of stored
  * sketches — the re-aggregation path over persisted per-source /
  * per-epoch sketches. All inputs must share one precision (length).
  */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge expects a sketch (binary), got ${other.simpleString}")
  }

  /** Empty marker until the first input fixes the register count. */
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(acc: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (acc.length == 0) in.clone()
    else {
      require(acc.length == in.length,
        s"hll precision mismatch: ${acc.length} vs ${in.length} registers")
      var j = 0
      while (j < acc.length) {
        if ((in(j) & 0xff) > (acc(j) & 0xff)) acc(j) = in(j)
        j += 1
      }
      acc
    }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else maxInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (b.length == 0) a else maxInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_hll_merge"
}

/** `graft_hll_estimate(sketch)` → DOUBLE distinct-count estimate. */
case class HllEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_estimate expects a sketch (binary), got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Hll.estimate(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_hll_estimate"
}

/** `graft_hll_registers(sketch)` → ARRAY<INT>: the registers in bucket
  * order, for explode-style inspection and cross-engine verification.
  */
case class HllRegisters(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_registers expects a sketch (binary), got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[Array[Byte]]
    new GenericArrayData(regs.map(b => (b & 0xff): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_hll_registers"
}
