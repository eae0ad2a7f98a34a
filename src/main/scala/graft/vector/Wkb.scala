package graft.vector

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Well-Known Binary (OGC Simple Features part 1, §8) codec over the
  * same [[Wkt.Geom]] ADT the WKT reader produces — the binary leg of
  * the geometry-interchange family (WKT / GeoJSON / Shapefile / MVT
  * already have native codecs). Both byte orders parse; the writer
  * takes either (XDR big-endian = 0, NDR little-endian = 1). Types
  * 1-6: Point, LineString, Polygon, MultiPoint, MultiLineString,
  * MultiPolygon — each Multi* member carries its own (byteOrder, type)
  * header per the spec.
  *
  * Executor-safe pure byte functions — geometry columns parse
  * distributed, one call per row (the Wkt discipline).
  */
object Wkb {
  import Wkt._

  def parse(bytes: Array[Byte]): Geom = {
    val (g, end) = parseOne(bytes, 0)
    require(end == bytes.length, s"trailing bytes after WKB geometry ($end of ${bytes.length})")
    g
  }

  private def parseOne(b: Array[Byte], start: Int): (Geom, Int) = {
    require(b.length > start, "empty WKB")
    val order = b(start) match {
      case 0 => ByteOrder.BIG_ENDIAN
      case 1 => ByteOrder.LITTLE_ENDIAN
      case o => throw new IllegalArgumentException(s"bad WKB byte-order flag $o")
    }
    val buf = ByteBuffer.wrap(b).order(order)
    var p = start + 1
    def u32(): Int = { val v = buf.getInt(p); p += 4; v }
    def pt(): Pt = { val x = buf.getDouble(p); val y = buf.getDouble(p + 8); p += 16; Pt(x, y) }
    def ring(): IndexedSeq[Pt] = IndexedSeq.fill(u32())(pt())
    val geom = u32() match {
      case 1 => PointG(pt())
      case 2 => LineStringG(ring())
      case 3 =>
        val rings = Seq.fill(u32())(ring())
        require(rings.nonEmpty, "POLYGON with zero rings")
        PolygonG(Polygon(rings.head, rings.tail))
      case 4 => MultiPointG(IndexedSeq.fill(u32()) {
        val (g, np) = parseOne(b, p); p = np
        g.asInstanceOf[PointG].p
      })
      case 5 => MultiLineStringG(Seq.fill(u32()) {
        val (g, np) = parseOne(b, p); p = np
        g.asInstanceOf[LineStringG].pts
      })
      case 6 => MultiPolygonG(Seq.fill(u32()) {
        val (g, np) = parseOne(b, p); p = np
        g.asInstanceOf[PolygonG].poly
      })
      case t => throw new IllegalArgumentException(s"WKB type $t unsupported")
    }
    (geom, p)
  }

  def write(g: Geom, littleEndian: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeOne(out, g, littleEndian)
    out.toByteArray
  }

  private def writeOne(out: ByteArrayOutputStream, g: Geom,
                       le: Boolean): Unit = {
    def u32(v: Int): Unit = {
      val b = ByteBuffer.allocate(4)
        .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b.putInt(v); out.write(b.array())
    }
    def f64(v: Double): Unit = {
      val b = ByteBuffer.allocate(8)
        .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b.putDouble(v); out.write(b.array())
    }
    def pt(p: Pt): Unit = { f64(p.x); f64(p.y) }
    def ring(ps: IndexedSeq[Pt]): Unit = { u32(ps.length); ps.foreach(pt) }
    out.write(if (le) 1 else 0)
    g match {
      case PointG(p)            => u32(1); pt(p)
      case LineStringG(ps)      => u32(2); ring(ps)
      case PolygonG(poly)       =>
        u32(3); u32(1 + poly.holes.size)
        ring(poly.exterior); poly.holes.foreach(h => ring(h.toIndexedSeq))
      case MultiPointG(ps)      =>
        u32(4); u32(ps.length); ps.foreach(p => writeOne(out, PointG(p), le))
      case MultiLineStringG(ls) =>
        u32(5); u32(ls.size); ls.foreach(l => writeOne(out, LineStringG(l.toIndexedSeq), le))
      case MultiPolygonG(polys) =>
        u32(6); u32(polys.size); polys.foreach(p => writeOne(out, PolygonG(p), le))
    }
  }
}
