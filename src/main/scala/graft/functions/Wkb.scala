package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Full WKB/EWKB byte-level toolkit (SURVEY T17) — every geometry type,
  * not just points: POINT, LINESTRING, POLYGON, MULTIPOINT,
  * MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION, with Z/M ordinate
  * flags, per-sub-geometry byte orders, and the EWKB SRID extension.
  *
  * The shape mirrors the reference's traverser family
  * (`debezium-connector-common/.../spatial/GeometryTraverser.java`,
  * `GeometryEndiannessConverter.java`, `GeometryFormatConverter.java`,
  * `GeometryCoordinateSwapper.java`) re-expressed as one recursive
  * rewriter: parse the input buffer in its declared byte order(s) and
  * stream a transformed copy — target byte order and/or swapped leading
  * ordinate pair — into the output. Nested geometries carry their own
  * byte-order byte and restore the parent's order on exit (the
  * reference's ByteOrderScope).
  */
object Wkb {

  // EWKB type-word flags (PostGIS extension), ref GeometryConstants.java
  val ZFlag = 0x80000000
  val MFlag = 0x40000000
  val SridFlag = 0x20000000
  val TypeMask = 0xFF

  val Point = 1
  val LineString = 2
  val Polygon = 3
  val MultiPoint = 4
  val MultiLineString = 5
  val MultiPolygon = 6
  val GeometryCollection = 7

  private def orderOf(b: Byte): ByteOrder = b match {
    case 0 => ByteOrder.BIG_ENDIAN
    case 1 => ByteOrder.LITTLE_ENDIAN
    case other =>
      throw new IllegalArgumentException(s"bad WKB byte-order marker: $other")
  }

  private def orderByte(o: ByteOrder): Byte =
    if (o == ByteOrder.LITTLE_ENDIAN) 1 else 0

  /** Base geometry type of the (E)WKB's top-level header; raises on a
    * type code outside the supported set (e.g. ISO-WKB Z codes).
    */
  def geometryType(wkb: Array[Byte]): Int = {
    val in = ByteBuffer.wrap(wkb)
    in.order(orderOf(in.get()))
    val t = in.getInt() & TypeMask
    require(t >= Point && t <= GeometryCollection,
      s"invalid geometry type: $t")
    t
  }

  /** SRID if the top-level header carries the EWKB SRID flag. */
  def sridOf(wkb: Array[Byte]): Option[Int] = {
    val in = ByteBuffer.wrap(wkb)
    in.order(orderOf(in.get()))
    val t = in.getInt()
    if ((t & SridFlag) != 0) Some(in.getInt()) else None
  }

  /** One recursive pass: copy `in` (positioned at a geometry's
    * byte-order byte) to `out`, rewriting byte order to `target` (or
    * keeping each scope's own) and optionally swapping the first two
    * ordinates of every coordinate. Returns with `in` positioned after
    * the geometry.
    */
  private def rewrite(in: ByteBuffer, out: ByteBuffer,
                      target: Option[ByteOrder], swap: Boolean): Unit = {
    val inOrder = orderOf(in.get())
    val outOrder = target.getOrElse(inOrder)
    in.order(inOrder)
    out.order(outOrder)
    out.put(orderByte(outOrder))
    val wkbType = in.getInt()
    out.putInt(wkbType)
    val stride = 2 + (if ((wkbType & ZFlag) != 0) 1 else 0) +
      (if ((wkbType & MFlag) != 0) 1 else 0)
    if ((wkbType & SridFlag) != 0) out.putInt(in.getInt())

    def coordinate(): Unit = {
      val ords = Array.fill(stride)(in.getDouble())
      if (swap) { val t = ords(0); ords(0) = ords(1); ords(1) = t }
      ords.foreach(out.putDouble)
    }
    def ring(): Unit = {
      val n = in.getInt(); out.putInt(n)
      var i = 0; while (i < n) { coordinate(); i += 1 }
    }
    def subGeometries(): Unit = {
      val n = in.getInt(); out.putInt(n)
      var i = 0
      while (i < n) {
        rewrite(in, out, target, swap) // child scope: own byte order
        in.order(inOrder); out.order(outOrder) // restore parent scope
        i += 1
      }
    }

    (wkbType & TypeMask) match {
      case Point => coordinate()
      case LineString => ring()
      case Polygon =>
        val rings = in.getInt(); out.putInt(rings)
        var i = 0; while (i < rings) { ring(); i += 1 }
      case MultiPoint | MultiLineString | MultiPolygon |
           GeometryCollection => subGeometries()
      case other =>
        throw new IllegalArgumentException(s"invalid geometry type: $other")
    }
  }

  private def transformed(wkb: Array[Byte], target: Option[ByteOrder],
                          swap: Boolean): Array[Byte] = {
    val out = ByteBuffer.allocate(wkb.length)
    rewrite(ByteBuffer.wrap(wkb), out, target, swap)
    out.array()
  }

  /** T17 SwapGeometryCoordinates over ANY geometry: swap the leading
    * ordinate pair (x↔y / lat↔lon) of every coordinate, preserving byte
    * order, Z/M ordinates, SRID, and nesting.
    */
  def swapAxes(wkb: Array[Byte]): Array[Byte] =
    transformed(wkb, None, swap = true)

  /** Rewrite every scope (top-level and nested) to little endian. */
  def toLittleEndian(wkb: Array[Byte]): Array[Byte] =
    transformed(wkb, Some(ByteOrder.LITTLE_ENDIAN), swap = false)

  /** Rewrite every scope to big endian. */
  def toBigEndian(wkb: Array[Byte]): Array[Byte] =
    transformed(wkb, Some(ByteOrder.BIG_ENDIAN), swap = false)

  /** WKB → EWKB: set the top-level SRID flag and splice the srid word in
    * (idempotent — an extended input passes through). Ref
    * `GeometryFormatConverter.convertToExtendedWkb`.
    */
  def toEwkb(wkb: Array[Byte], srid: Int): Array[Byte] = {
    val in = ByteBuffer.wrap(wkb)
    val ob = in.get()
    in.order(orderOf(ob))
    val t = in.getInt()
    if ((t & SridFlag) != 0) return wkb
    val out = ByteBuffer.allocate(wkb.length + 4)
    out.put(ob); out.order(in.order())
    out.putInt(t | SridFlag)
    out.putInt(srid)
    out.put(in)
    out.array()
  }

  /** EWKB → WKB: strip the top-level SRID flag and word; returns the
    * plain wkb and the srid it carried (input already plain → None).
    */
  def toWkb(ewkb: Array[Byte]): (Array[Byte], Option[Int]) = {
    val in = ByteBuffer.wrap(ewkb)
    val ob = in.get()
    in.order(orderOf(ob))
    val t = in.getInt()
    if ((t & SridFlag) == 0) return (ewkb, None)
    val srid = in.getInt()
    val out = ByteBuffer.allocate(ewkb.length - 4)
    out.put(ob); out.order(in.order())
    out.putInt(t & ~SridFlag)
    out.put(in)
    (out.array(), Some(srid))
  }

  /** Flat ordinate list in traversal order — the decode twin used by
    * oracles (coordinate-level comparison, not byte-level).
    */
  def ordinates(wkb: Array[Byte]): Seq[Double] = {
    val acc = Seq.newBuilder[Double]
    def walk(in: ByteBuffer): Unit = {
      val inOrder = orderOf(in.get())
      in.order(inOrder)
      val wkbType = in.getInt()
      val stride = 2 + (if ((wkbType & ZFlag) != 0) 1 else 0) +
        (if ((wkbType & MFlag) != 0) 1 else 0)
      if ((wkbType & SridFlag) != 0) in.getInt()
      def coords(n: Int): Unit =
        (0 until n * stride).foreach(_ => acc += in.getDouble())
      (wkbType & TypeMask) match {
        case Point => coords(1)
        case LineString => coords(in.getInt())
        case Polygon =>
          (0 until in.getInt()).foreach(_ => coords(in.getInt()))
        case MultiPoint | MultiLineString | MultiPolygon |
             GeometryCollection =>
          val n = in.getInt()
          (0 until n).foreach { _ => walk(in); in.order(inOrder) }
        case other =>
          throw new IllegalArgumentException(s"invalid geometry type: $other")
      }
    }
    walk(ByteBuffer.wrap(wkb))
    acc.result()
  }

  // ------------------------------------------------------- builders

  /** Little-endian LINESTRING WKB from (x, y) pairs. */
  def makeLineString(points: Seq[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + 16 * points.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(LineString); bb.putInt(points.size)
    points.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
    bb.array()
  }

  /** Little-endian POLYGON WKB from rings of (x, y) pairs. */
  def makePolygon(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(
      9 + rings.map(r => 4 + 16 * r.size).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(Polygon); bb.putInt(rings.size)
    rings.foreach { r =>
      bb.putInt(r.size)
      r.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
    }
    bb.array()
  }

  /** Little-endian MULTIPOINT WKB (each point its own LE header). */
  def makeMultiPoint(points: Seq[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + 21 * points.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(MultiPoint); bb.putInt(points.size)
    points.foreach { case (x, y) =>
      bb.put(1.toByte); bb.putInt(Point); bb.putDouble(x); bb.putDouble(y)
    }
    bb.array()
  }
}
