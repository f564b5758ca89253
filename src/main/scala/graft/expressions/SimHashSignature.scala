package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the `bits`-wide SimHash of a token set in
  * ONE pass — per-bit majority vote of token hashes, emitted map-only.
  *
  * Replaces the explode → `bits` conditional-sum aggregation
  * formulation: at corpus scale that shape shuffles `tokens × docs`
  * exploded rows (the text amplified by its token count) through an
  * aggregate, while this expression emits one long per document with no
  * shuffle at all. Bit-exact with both of [[graft.analytics.Dedup]]'s
  * token hashes: xxhash64 (seed 42, Spark's `xxhash64`) and the
  * portable md5-first-32-bits hash (`Dedup.md5Hash32`), so the DuckDB
  * oracle replay is unchanged.
  */
case class SimHashSignature(child: Expression, bits: Int, useMd5: Boolean)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](bits)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h =
        if (useMd5) SimHashSignature.md5First32(s)
        else XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val self = SimHashSignature.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val votes = ctx.freshName("votes")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val hashExpr =
        if (useMd5) s"$self.md5First32($s)"
        else s"$xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L)"
      s"""
         |int[] $votes = new int[$bits];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h = $hashExpr;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) != 0L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSignature {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 32 bits of md5 as an unsigned long — bit-identical to
    * `conv(substring(md5(w), 1, 8), 16, 10)`.
    */
  def md5First32(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
