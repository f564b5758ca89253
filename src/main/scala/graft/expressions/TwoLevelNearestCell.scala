package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: COARSE-FINE nearest-cell assignment —
  * the scalable form of [[NearestCell]] for the k ∝ N (dedup-blocking)
  * regime, where the flat scan's O(k·d) per vector becomes the N^1.5
  * term the r8 scale notes flag. The k centroids are pre-grouped under
  * `coarse.length ≈ √k` coarse means (driver-side,
  * `graft.analytics.Ivf.coarseGroups`); per vector the expression scans
  * the √k coarse means, probes the `probeGroups` nearest groups, and
  * takes the argmin over ONLY their members — O((√k + probeGroups·k/√k)·d)
  * ≈ O(√k·d) work per row, one tight codegen loop.
  *
  * Semantics: exactly the flat [[NearestCell]] argmin RESTRICTED to the
  * probed groups' members (global index tie-break: lowest cell index
  * wins, matching the flat scan's first-minimal rule) — a vector whose
  * true nearest cell lies outside the probed groups lands in the best
  * probed cell instead; `probeGroups = coarse.length` degrades to the
  * exact flat scan. NULL contract as [[NearestCell]]: dimension
  * mismatch or empty centroids → NULL. A degenerate (zero-norm)
  * vector — whose normalized distances are all NaN — lands in cell 0,
  * matching the flat scan.
  */
case class TwoLevelNearestCell(child: Expression,
                               coarse: Array[Array[Double]],
                               members: Array[Array[Int]],
                               centroids: Array[Array[Double]],
                               probeGroups: Int)
    extends UnaryExpression {

  require(coarse.length == members.length,
    s"coarse count ${coarse.length} != member-list count ${members.length}")
  require(probeGroups > 0, "probeGroups must be positive")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"two_level_nearest_cell expects array<float|double>, got ${other.simpleString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val dims = if (centroids.isEmpty) 0 else centroids(0).length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = x.numElements()
    if (centroids.isEmpty || coarse.isEmpty || m != dims) return null
    val f = elemIsFloat
    var s = 0.0; var i = 0
    while (i < m) {
      val xv: Double = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += xv * xv; i += 1
    }
    val n = math.sqrt(s)
    // distances to the coarse means
    val g = coarse.length
    val cd = new Array[Double](g)
    var c = 0
    while (c < g) {
      val cc = coarse(c)
      var d = 0.0; var j = 0
      while (j < m) {
        val xv: Double = if (f) x.getFloat(j).toDouble else x.getDouble(j)
        val dj = xv / n - cc(j)
        d += dj * dj; j += 1
      }
      cd(c) = d; c += 1
    }
    // select the probeGroups smallest by (distance, index): repeated
    // min-scan with a taken mask — probeGroups is small
    val p = math.min(probeGroups, g)
    val taken = new Array[Boolean](g)
    var best = -1; var bd = Double.MaxValue
    var t = 0
    while (t < p) {
      var sel = -1; var sd = Double.MaxValue
      var gi = 0
      while (gi < g) {
        if (!taken(gi) && cd(gi) < sd) { sd = cd(gi); sel = gi }
        gi += 1
      }
      // a zero-norm vector makes every coarse distance NaN, so no group
      // is ever selected — stop probing instead of indexing taken(-1)
      if (sel < 0) t = p
      else {
      taken(sel) = true
      // argmin over the selected group's members
      val mem = members(sel)
      var k = 0
      while (k < mem.length) {
        val cell = mem(k)
        val cc = centroids(cell)
        var d = 0.0; var j = 0
        while (j < m) {
          val xv: Double = if (f) x.getFloat(j).toDouble else x.getDouble(j)
          val dj = xv / n - cc(j)
          d += dj * dj; j += 1
        }
        if (d < bd || (d == bd && cell < best)) { bd = d; best = cell }
        k += 1
      }
      }
      t += 1
    }
    // degenerate (zero-norm / all-NaN) vectors land in cell 0, matching
    // the flat NearestCell scan's behavior for the same input
    if (best < 0) 0 else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val co = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val me = ctx.addReferenceObj("members", members, "int[][]")
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val cd = ctx.freshName("cd")
      val taken = ctx.freshName("taken")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val p = ctx.freshName("p")
      s"""
         |int $m = $a.numElements();
         |if ($mat.length == 0 || $co.length == 0 || $m != $mat[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int i = 0; i < $m; i++) {
         |    double xv = (double) $a.$get(i);
         |    $s += xv * xv;
         |  }
         |  double $n = java.lang.Math.sqrt($s);
         |  double[] $cd = new double[$co.length];
         |  for (int c = 0; c < $co.length; c++) {
         |    double[] cc = $co[c];
         |    double d = 0.0;
         |    for (int j = 0; j < $m; j++) {
         |      double dj = ((double) $a.$get(j)) / $n - cc[j];
         |      d += dj * dj;
         |    }
         |    $cd[c] = d;
         |  }
         |  int $p = java.lang.Math.min($probeGroups, $co.length);
         |  boolean[] $taken = new boolean[$co.length];
         |  int $best = -1; double $bd = Double.MAX_VALUE;
         |  for (int t = 0; t < $p; t++) {
         |    int sel = -1; double sd = Double.MAX_VALUE;
         |    for (int gi = 0; gi < $co.length; gi++) {
         |      if (!$taken[gi] && $cd[gi] < sd) { sd = $cd[gi]; sel = gi; }
         |    }
         |    if (sel < 0) break; // zero-norm vector: every distance is NaN
         |    $taken[sel] = true;
         |    int[] mem = $me[sel];
         |    for (int k = 0; k < mem.length; k++) {
         |      int cell = mem[k];
         |      double[] cc = $mat[cell];
         |      double d = 0.0;
         |      for (int j = 0; j < $m; j++) {
         |        double dj = ((double) $a.$get(j)) / $n - cc[j];
         |        d += dj * dj;
         |      }
         |      if (d < $bd || (d == $bd && cell < $best)) { $bd = d; $best = cell; }
         |    }
         |  }
         |  ${ev.value} = ($best < 0) ? 0 : $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
