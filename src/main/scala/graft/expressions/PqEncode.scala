package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: product-quantization encode — split the
  * L2-normalized vector into `m` contiguous subvectors and emit, per
  * subvector, the index of its nearest codebook centroid (squared L2).
  * Output is the `array<int>` of `m` codes: 64 float dims collapse to
  * m small ints (8 bytes at m=8) — the classic 1B-vector memory path
  * (IVF-PQ): the corpus stores ONLY codes, search reconstructs from the
  * codebooks.
  *
  * Same conventions as [[NearestCell]]: normalize once (the repo's
  * similarity metric is cosine — PQ on the unit sphere), strict `<`
  * argmin so the FIRST minimal centroid wins (matches
  * `list_indexof(dists, list_min(dists))` in an external oracle), and a
  * dimension mismatch returns NULL, never a code vector computed from a
  * prefix. `codebooks` is m × ksub × dsub with `m · dsub` equal to the
  * vector dimension.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val dsub =
    if (codebooks.isEmpty || codebooks(0).isEmpty) 0 else codebooks(0)(0).length
  private val dims = codebooks.length * dsub

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = x.numElements()
    if (codebooks.isEmpty || dsub == 0 || m != dims) return null
    val f = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < m) {
      val xv: Double = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += xv * xv; i += 1
    }
    val n = math.sqrt(s)
    val codes = new Array[Int](codebooks.length)
    var sub = 0
    while (sub < codebooks.length) {
      val cb = codebooks(sub)
      val off = sub * dsub
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cc = cb(c)
        var d = 0.0; var j = 0
        while (j < dsub) {
          val xv: Double =
            if (f) x.getFloat(off + j).toDouble else x.getDouble(off + j)
          val dj = xv / n - cc(j)
          d += dj * dj; j += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nssCodeGen(ctx, ev, get, cbs)
  }

  private def nssCodeGen(ctx: CodegenContext, ev: ExprCode, get: String,
                         cbs: String): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val sub = ctx.freshName("sub")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val d = ctx.freshName("d")
      val cb = ctx.freshName("cb")
      val cc = ctx.freshName("cc")
      val dj = ctx.freshName("dj")
      val codes = ctx.freshName("codes")
      val dsubV = ctx.freshName("dsub")
      s"""
         |int $m = $a.numElements();
         |int $dsubV = ($cbs.length == 0 || $cbs[0].length == 0)
         |  ? 0 : $cbs[0][0].length;
         |if ($dsubV == 0 || $m != $cbs.length * $dsubV) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double xv = (double) $a.$get($i);
         |    $s += xv * xv;
         |  }
         |  double $n = java.lang.Math.sqrt($s);
         |  int[] $codes = new int[$cbs.length];
         |  for (int $sub = 0; $sub < $cbs.length; $sub++) {
         |    double[][] $cb = $cbs[$sub];
         |    int $off = $sub * $dsubV;
         |    int $best = 0; double $bd = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $cb.length; $c++) {
         |      double[] $cc = $cb[$c];
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $dsubV; $j++) {
         |        double $dj = ((double) $a.$get($off + $j)) / $n - $cc[$j];
         |        $d += $dj * $dj;
         |      }
         |      if ($d < $bd) { $bd = $d; $best = $c; }
         |    }
         |    $codes[$sub] = $best;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
