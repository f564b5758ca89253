package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the full `numPerm`-permutation MinHash
  * signature of a shingle set in ONE pass — each shingle is xxhash64'd
  * once and the permutations are derived by (a·h + b) universal hashing
  * (Broder's scheme), so the signature stage is a map-only projection.
  *
  * Replaces the explode → per-permutation `min` aggregation formulation:
  * at corpus scale that shape shuffles `shingles × docs` exploded rows
  * (a 10-100× amplification of the text) through an aggregate, while
  * this expression emits one 256-byte array per document with no shuffle
  * at all.
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash expects array<string>, got ${other.simpleString}")
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // deterministic permutation constants; a odd (invertible mod 2^64)
  private lazy val permA: Array[Long] =
    Array.tabulate(numPerm)(p => splitmix64(2L * p + 1) | 1L)
  private lazy val permB: Array[Long] =
    Array.tabulate(numPerm)(p => splitmix64(2L * p + 2))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val base = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var p = 0
      while (p < numPerm) {
        val h = base * permA(p) + permB(p)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", permA, "long[]")
    val bRef = ctx.addReferenceObj("permB", permB, "long[]")
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[${numPerm}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $base = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $p = 0; $p < ${numPerm}; $p++) {
         |    long $h = $base * $aRef[$p] + $bRef[$p];
         |    if ($h < $mins[$p]) $mins[$p] = $h;
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
