package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid (squared L2
  * on the unit sphere) for an embedding column — the corpus-side cell
  * assignment of IVF search (`graft.analytics.Ivf`).
  *
  * Bit-identical to the interpreted formulation it replaces
  * (normalize → per-centroid `aggregate(zip_with(...))` → first argmin),
  * but one tight codegen loop per row instead of k × dims lambda
  * interpretations: higher-order functions never enter whole-stage
  * codegen, which made interpreted cell assignment ~2 ms/row — the
  * difference between scanning a 100 TB corpus once and never finishing.
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  // a vector whose dimension differs from the centroids' is corrupt
  // input: NULL, never a confident cell computed from a prefix
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cell expects array<float|double>, got ${other.simpleString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val dims = if (centroids.isEmpty) 0 else centroids(0).length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = x.numElements()
    // empty centroids => NULL in BOTH paths (codegen guards mat.length == 0;
    // without this an empty input array would slip past the m != dims check
    // — 0 == 0 — and return cell 0 into zero centroids)
    if (centroids.isEmpty || m != dims) return null
    val f = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < m) {
      val xv: Double = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += xv * xv; i += 1
    }
    val n = math.sqrt(s)
    var best = 0; var bd = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      var d = 0.0; var j = 0
      while (j < m) {
        val xv: Double = if (f) x.getFloat(j).toDouble else x.getDouble(j)
        val dj = xv / n - cc(j)
        d += dj * dj; j += 1
      }
      // strict < : the FIRST minimal cell wins, matching
      // array_position(dists, array_min(dists))
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val d = ctx.freshName("d")
      val cc = ctx.freshName("cc")
      val dj = ctx.freshName("dj")
      s"""
         |int $m = $a.numElements();
         |if ($mat.length == 0 || $m != $mat[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double xv = (double) $a.$get($i);
         |    $s += xv * xv;
         |  }
         |  double $n = java.lang.Math.sqrt($s);
         |  int $best = 0; double $bd = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    double[] $cc = $mat[$c];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $m; $j++) {
         |      double $dj = ((double) $a.$get($j)) / $n - $cc[$j];
         |      $d += $dj * $dj;
         |    }
         |    if ($d < $bd) { $bd = $d; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
