package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.functions.{Geo, Wkb}

/** Static null-safe bridge the WKB expressions call from BOTH eval and
  * generated code — one body, two call paths, so interpreted and codegen
  * results cannot drift. Malformed, truncated, or unsupported WKB (e.g.
  * ISO-Z type codes) returns Java null, never a thrown task: one corrupt
  * CDC row must not kill a stream (the contract the old UDF wrappers
  * implemented with Option).
  */
object WkbOps {
  private def safe[T >: Null](wkb: Array[Byte], minLen: Int)(
      f: Array[Byte] => T): T =
    if (wkb == null || wkb.length < minLen) null
    else
      try f(wkb)
      catch { case scala.util.control.NonFatal(_) => null }

  def swapAxes(wkb: Array[Byte]): Array[Byte] =
    safe[Array[Byte]](wkb, 9)(Wkb.swapAxes)

  def toEwkb(wkb: Array[Byte], srid: Int): Array[Byte] =
    safe[Array[Byte]](wkb, 9)(Wkb.toEwkb(_, srid))

  def fromEwkb(ewkb: Array[Byte]): Array[Byte] =
    safe[Array[Byte]](ewkb, 9)(Wkb.toWkb(_)._1)

  def ordinates(wkb: Array[Byte]): ArrayData =
    safe[ArrayData](wkb, 9) { b =>
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Wkb.ordinates(b).toArray)
    }

  def geometryType(wkb: Array[Byte]): java.lang.Integer =
    safe[java.lang.Integer](wkb, 9)(
      b => java.lang.Integer.valueOf(Wkb.geometryType(b)))

  def pointX(wkb: Array[Byte]): java.lang.Double =
    Geo.decodePointWkb(wkb).map(p => java.lang.Double.valueOf(p._1)).orNull

  def pointY(wkb: Array[Byte]): java.lang.Double =
    Geo.decodePointWkb(wkb).map(p => java.lang.Double.valueOf(p._2)).orNull

  def encodePoint(x: Double, y: Double): Array[Byte] =
    Geo.encodePointWkb(x, y)
}

/** Shared shape of the unary WKB expressions: binary child, null-safe
  * static call, result null on malformed input. Full whole-stage
  * codegen — the generated code is one static call per row (same
  * single-body pattern as [[SimHashSignature]]), replacing the Scala
  * UDF closures per SURVEY §7.3's escalation rule (native `Expression`
  * over `udf`).
  */
abstract class WkbUnaryBase extends UnaryExpression {
  /** Java expression for the static call, given the child variable. */
  protected def staticCall(c: String): String
  protected def resultJavaType: String

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary wkb, got ${other.simpleString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("wkbRes")
      s"""
         |$resultJavaType $tmp = ${staticCall(c)};
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${unwrap(tmp)}; }
       """.stripMargin
    })

  /** How to assign the boxed static result to ev.value (identity for
    * object types, unboxing for primitives).
    */
  protected def unwrap(tmp: String): String = tmp
}

case class WkbSwapAxes(child: Expression) extends WkbUnaryBase {
  override def dataType: DataType = BinaryType
  override protected def resultJavaType = "byte[]"
  override protected def staticCall(c: String) =
    s"graft.expressions.WkbOps.swapAxes($c)"
  override def nullSafeEval(input: Any): Any =
    WkbOps.swapAxes(input.asInstanceOf[Array[Byte]])
  override def prettyName: String = "graft_wkb_swap"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class WkbFromEwkb(child: Expression) extends WkbUnaryBase {
  override def dataType: DataType = BinaryType
  override protected def resultJavaType = "byte[]"
  override protected def staticCall(c: String) =
    s"graft.expressions.WkbOps.fromEwkb($c)"
  override def nullSafeEval(input: Any): Any =
    WkbOps.fromEwkb(input.asInstanceOf[Array[Byte]])
  override def prettyName: String = "graft_wkb_from_ewkb"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class WkbOrdinates(child: Expression) extends WkbUnaryBase {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def resultJavaType =
    "org.apache.spark.sql.catalyst.util.ArrayData"
  override protected def staticCall(c: String) =
    s"graft.expressions.WkbOps.ordinates($c)"
  override def nullSafeEval(input: Any): Any =
    WkbOps.ordinates(input.asInstanceOf[Array[Byte]])
  override def prettyName: String = "graft_wkb_ordinates"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class WkbGeometryType(child: Expression) extends WkbUnaryBase {
  override def dataType: DataType = IntegerType
  override protected def resultJavaType = "java.lang.Integer"
  override protected def staticCall(c: String) =
    s"graft.expressions.WkbOps.geometryType($c)"
  override protected def unwrap(tmp: String): String = s"$tmp.intValue()"
  override def nullSafeEval(input: Any): Any = {
    val r = WkbOps.geometryType(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.intValue()
  }
  override def prettyName: String = "graft_wkb_geomtype"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class WkbPointCoord(child: Expression, isX: Boolean) extends WkbUnaryBase {
  override def dataType: DataType = DoubleType
  override protected def resultJavaType = "java.lang.Double"
  override protected def staticCall(c: String) =
    if (isX) s"graft.expressions.WkbOps.pointX($c)"
    else s"graft.expressions.WkbOps.pointY($c)"
  override protected def unwrap(tmp: String): String = s"$tmp.doubleValue()"
  override def nullSafeEval(input: Any): Any = {
    val r =
      if (isX) WkbOps.pointX(input.asInstanceOf[Array[Byte]])
      else WkbOps.pointY(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.doubleValue()
  }
  override def prettyName: String =
    if (isX) "graft_wkb_point_x" else "graft_wkb_point_y"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** WKB → EWKB: splice the srid argument into the byte-level SRID word. */
case class WkbToEwkb(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(wkb: Any, srid: Any): Any =
    WkbOps.toEwkb(wkb.asInstanceOf[Array[Byte]], srid.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, s) => {
      val tmp = ctx.freshName("wkbRes")
      s"""
         |byte[] $tmp = graft.expressions.WkbOps.toEwkb($w, $s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override def prettyName: String = "graft_wkb_to_ewkb"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

/** (x, y) → 21-byte little-endian point WKB; never null on non-null
  * inputs (byte-identical to the reference's point writer shape,
  * io/debezium/spatial/WkbWriter.java).
  */
case class WkbEncodePoint(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, double), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    WkbOps.encodePoint(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expressions.WkbOps.encodePoint($x, $y)")

  override def prettyName: String = "graft_wkb_point"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}
