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

  // All column-level ops are native Catalyst expressions
  // (graft.expressions.WkbExprs, full whole-stage codegen via a single
  // static body shared with eval) — no Scala UDF closures anywhere, per
  // SURVEY §7.3's escalation rule. Malformed, truncated, or unsupported
  // WKB (e.g. ISO-Z type codes) yields SQL NULL, never a thrown task —
  // one corrupt CDC row must not kill a stream.
  private def fn(name: String, args: Column*): Column = {
    graft.expressions.GraftFunctions.register(SparkSession.active)
    call_function(name, args: _*)
  }

  /** point struct column: STRUCT<wkb, srid> */
  def point(x: Column, y: Column, srid: Column): Column =
    struct(fn("graft_wkb_point", x.cast("double"), y.cast("double")).as("wkb"),
      srid.cast("int").as("srid"))

  def pointX(geom: Column): Column =
    fn("graft_wkb_point_x", geom.getField("wkb"))
  def pointY(geom: Column): Column =
    fn("graft_wkb_point_y", geom.getField("wkb"))

  /** T17 SwapGeometryCoordinates: axis-order swap without re-projecting —
    * any geometry type, nested and Z/M-flagged included (Wkb.swapAxes).
    */
  def swapCoordinates(geom: Column): Column =
    struct(fn("graft_wkb_swap", geom.getField("wkb")).as("wkb"),
      geom.getField("srid").as("srid"))

  /** Flat ordinate list of any (E)WKB geometry, traversal order. */
  def ordinates(geom: Column): Column =
    fn("graft_wkb_ordinates", geom.getField("wkb"))

  /** Base geometry type code of the top-level header. */
  def geometryType(geom: Column): Column =
    fn("graft_wkb_geomtype", geom.getField("wkb"))

  /** T17 GeometryFormatTransformer: WKB → EWKB, folding the struct's
    * srid into the byte-level SRID word.
    */
  def toEwkb(geom: Column): Column =
    struct(fn("graft_wkb_to_ewkb", geom.getField("wkb"),
        geom.getField("srid").cast("int")).as("wkb"),
      geom.getField("srid").as("srid"))

  /** T17 GeometryFormatTransformer: EWKB → plain WKB (srid stays in the
    * struct field).
    */
  def fromEwkb(geom: Column): Column =
    struct(fn("graft_wkb_from_ewkb", geom.getField("wkb")).as("wkb"),
      geom.getField("srid").as("srid"))
}
