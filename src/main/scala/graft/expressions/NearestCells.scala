package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: indices of the `nprobe` nearest centroids
  * (squared L2 on the unit sphere, ascending distance, ties by lower
  * index) — the QUERY-side probe of IVF search
  * (`graft.analytics.Ivf.searchTopK`), sibling of [[NearestCell]].
  *
  * Bit-identical to the interpreted `array_sort(zip_with(dists,
  * indices, struct))` + `slice` formulation it replaces, including tie
  * order and NaN placement (`java.lang.Double.compare` ordering, NaN
  * last) — but one bounded insertion-sort loop per row instead of
  * k × dims interpreted lambdas plus a k-element sort. At k=65536 /
  * nprobe=256 the interpreted form costs ~0.5 s per query row; batch
  * ANN over millions of query rows never finishes without the codegen
  * path.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
                        nprobe: Int)
    extends UnaryExpression {

  require(nprobe > 0, s"nprobe must be positive, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cells expects array<float|double>, got ${other.simpleString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val dims = if (centroids.isEmpty) 0 else centroids(0).length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = x.numElements()
    if (centroids.isEmpty || m != dims) return null
    val f = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < m) {
      val xv: Double = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += xv * xv; i += 1
    }
    val n = math.sqrt(s)
    val np = math.min(nprobe, centroids.length)
    val bestD = new Array[Double](np)
    val bestI = new Array[Int](np)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      var d = 0.0; var j = 0
      while (j < m) {
        val xv: Double = if (f) x.getFloat(j).toDouble else x.getDouble(j)
        val dj = xv / n - cc(j)
        d += dj * dj; j += 1
      }
      if (filled < np) {
        var pos = filled
        while (pos > 0 && java.lang.Double.compare(d, bestD(pos - 1)) < 0) pos -= 1
        var k = filled
        while (k > pos) { bestD(k) = bestD(k - 1); bestI(k) = bestI(k - 1); k -= 1 }
        bestD(pos) = d; bestI(pos) = c
        filled += 1
      } else if (java.lang.Double.compare(d, bestD(np - 1)) < 0) {
        var pos = np - 1
        while (pos > 0 && java.lang.Double.compare(d, bestD(pos - 1)) < 0) pos -= 1
        var k = np - 1
        while (k > pos) { bestD(k) = bestD(k - 1); bestI(k) = bestI(k - 1); k -= 1 }
        bestD(pos) = d; bestI(pos) = c
      }
      c += 1
    }
    new GenericArrayData(bestI)
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
      val np = ctx.freshName("np")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      val filled = ctx.freshName("filled")
      val d = ctx.freshName("d")
      val cc = ctx.freshName("cc")
      val dj = ctx.freshName("dj")
      val pos = ctx.freshName("pos")
      val k = ctx.freshName("k")
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
         |  int $np = java.lang.Math.min($nprobe, $mat.length);
         |  double[] $bestD = new double[$np];
         |  int[] $bestI = new int[$np];
         |  int $filled = 0;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    double[] $cc = $mat[$c];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $m; $j++) {
         |      double $dj = ((double) $a.$get($j)) / $n - $cc[$j];
         |      $d += $dj * $dj;
         |    }
         |    if ($filled < $np) {
         |      int $pos = $filled;
         |      while ($pos > 0 && java.lang.Double.compare($d, $bestD[$pos - 1]) < 0) $pos--;
         |      for (int $k = $filled; $k > $pos; $k--) {
         |        $bestD[$k] = $bestD[$k - 1]; $bestI[$k] = $bestI[$k - 1];
         |      }
         |      $bestD[$pos] = $d; $bestI[$pos] = $c;
         |      $filled++;
         |    } else if (java.lang.Double.compare($d, $bestD[$np - 1]) < 0) {
         |      int $pos = $np - 1;
         |      while ($pos > 0 && java.lang.Double.compare($d, $bestD[$pos - 1]) < 0) $pos--;
         |      for (int $k = $np - 1; $k > $pos; $k--) {
         |        $bestD[$k] = $bestD[$k - 1]; $bestI[$k] = $bestI[$k - 1];
         |      }
         |      $bestD[$pos] = $d; $bestI[$pos] = $c;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestI);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
