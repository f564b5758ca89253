package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry support (SURVEY §1.3 / T17): geometry values are
  * STRUCT<wkb BINARY, srid INT> as in the reference
  * (`debezium-connector-common/src/main/java/io/debezium/data/geometry/Geometry.java`,
  * `Point.java`); WKB parse/emit is plain byte munging mirroring the shape
  * of the reference's `io/debezium/spatial/WkbReader.java`/`WkbWriter.java`
  * (little-endian point = byteOrder(1) + type(4) + x(8) + y(8)).
  */
object Geo {

  /** 21-byte little-endian WKB for a 2-D point. */
  def encodePointWkb(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // little-endian marker
    bb.putInt(1)     // geometry type: point
    bb.putDouble(x)
    bb.putDouble(y)
    bb.array()
  }

  def decodePointWkb(wkb: Array[Byte]): Option[(Double, Double)] = {
    if (wkb == null || wkb.length < 21) return None
    val order =
      if (wkb(0) == 1.toByte) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(wkb).order(order)
    bb.position(1)
    if (bb.getInt != 1) return None
    Some((bb.getDouble, bb.getDouble))
  }

  private val encodeUdf =
    udf((x: Double, y: Double) => encodePointWkb(x, y))
  private val decodeXUdf =
    udf((wkb: Array[Byte]) => decodePointWkb(wkb).map(_._1))
  private val decodeYUdf =
    udf((wkb: Array[Byte]) => decodePointWkb(wkb).map(_._2))
  // any-geometry byte-level swap (Wkb.swapAxes); point WKB output is
  // byte-identical to the old decode→re-encode point path. Malformed,
  // truncated, or unsupported WKB (e.g. ISO-Z type codes) yields SQL
  // NULL, never a thrown task — one corrupt CDC row must not kill a
  // stream (same contract as the old point decoder's Option).
  private def safely[T](wkb: Array[Byte])(f: Array[Byte] => T): Option[T] =
    if (wkb == null || wkb.length < 9) None
    else scala.util.Try(f(wkb)).toOption
  private val swapUdf = udf { (wkb: Array[Byte]) => safely(wkb)(Wkb.swapAxes) }
  private val ordinatesUdf = udf { (wkb: Array[Byte]) =>
    safely(wkb)(Wkb.ordinates)
  }
  private val geomTypeUdf = udf { (wkb: Array[Byte]) =>
    safely(wkb)(Wkb.geometryType)
  }
  private val toEwkbUdf = udf { (wkb: Array[Byte], srid: Int) =>
    safely(wkb)(Wkb.toEwkb(_, srid))
  }
  private val fromEwkbUdf = udf { (wkb: Array[Byte]) =>
    safely(wkb)(Wkb.toWkb(_)._1)
  }

  /** point struct column: STRUCT<wkb, srid> */
  def point(x: Column, y: Column, srid: Column): Column =
    struct(encodeUdf(x, y).as("wkb"), srid.cast("int").as("srid"))

  def pointX(geom: Column): Column = decodeXUdf(geom.getField("wkb"))
  def pointY(geom: Column): Column = decodeYUdf(geom.getField("wkb"))

  /** T17 SwapGeometryCoordinates: axis-order swap without re-projecting —
    * any geometry type, nested and Z/M-flagged included (Wkb.swapAxes).
    */
  def swapCoordinates(geom: Column): Column =
    struct(swapUdf(geom.getField("wkb")).as("wkb"), geom.getField("srid").as("srid"))

  /** Flat ordinate list of any (E)WKB geometry, traversal order. */
  def ordinates(geom: Column): Column = ordinatesUdf(geom.getField("wkb"))

  /** Base geometry type code of the top-level header. */
  def geometryType(geom: Column): Column = geomTypeUdf(geom.getField("wkb"))

  /** T17 GeometryFormatTransformer: WKB → EWKB, folding the struct's
    * srid into the byte-level SRID word.
    */
  def toEwkb(geom: Column): Column =
    struct(toEwkbUdf(geom.getField("wkb"), geom.getField("srid")).as("wkb"),
      geom.getField("srid").as("srid"))

  /** T17 GeometryFormatTransformer: EWKB → plain WKB (srid stays in the
    * struct field).
    */
  def fromEwkb(geom: Column): Column =
    struct(fromEwkbUdf(geom.getField("wkb")).as("wkb"),
      geom.getField("srid").as("srid"))
}
