package graft.vector

/** Minimal WKT (OGC Simple Features / ISO 19125 well-known text)
  * reader + writer for the geometry kinds raster operators accept.
  *
  * Reference surface: geopyspark takes arbitrary shapely geometries
  * for mask / rasterize / polygonal summaries
  * (geopyspark/geotrellis/layer.py:2044 mask,
  * geopyspark/geotrellis/rasterize.py:13; shapefile ingest in
  * geopyspark/geotools/shapefile.py:68). WKT is the portable text form
  * of those geometries; this parser covers POINT, MULTIPOINT,
  * LINESTRING, POLYGON (with holes) and MULTIPOLYGON, written from the
  * public grammar — no geometry dependency.
  *
  * The parser is allocation-light and executor-safe: geometry tables
  * (a WKT string column) parse distributed, one call per row.
  */
object Wkt {

  sealed trait Geom
  final case class PointG(p: Pt) extends Geom
  final case class MultiPointG(pts: IndexedSeq[Pt]) extends Geom
  final case class LineStringG(pts: IndexedSeq[Pt]) extends Geom
  final case class MultiLineStringG(lines: Seq[IndexedSeq[Pt]]) extends Geom
  final case class PolygonG(poly: Polygon) extends Geom
  final case class MultiPolygonG(polys: Seq[Polygon]) extends Geom

  def parse(wkt: String): Geom = new Parser(wkt).geometry()

  /** The polygonal content of `wkt` — what mask / rasterize consume.
    * POLYGON -> one element; MULTIPOLYGON -> its members. */
  def parsePolygons(wkt: String): Seq[Polygon] = parse(wkt) match {
    case PolygonG(p)        => Seq(p)
    case MultiPolygonG(ps)  => ps
    case g                  => throw new IllegalArgumentException(
      s"expected POLYGON or MULTIPOLYGON, got ${g.getClass.getSimpleName}")
  }

  def write(g: Geom): String = g match {
    // empty collections serialize as the EMPTY keyword — `X ()` is not
    // valid WKT and parse() (rightly) rejects it, so write must not
    // produce it or roundtrips break
    case PointG(p)                             => s"POINT (${num(p.x)} ${num(p.y)})"
    case MultiPointG(ps) if ps.isEmpty         => "MULTIPOINT EMPTY"
    case MultiPointG(ps)                       => s"MULTIPOINT ${ringText(ps, close = false)}"
    case LineStringG(ps) if ps.isEmpty         => "LINESTRING EMPTY"
    case LineStringG(ps)                       => s"LINESTRING ${ringText(ps, close = false)}"
    // empty MEMBER lines are dropped too: `MULTILINESTRING (())` is as
    // unparseable as `MULTILINESTRING ()`, so a collection whose members
    // are all empty collapses to EMPTY
    case MultiLineStringG(ls) if ls.forall(_.isEmpty) => "MULTILINESTRING EMPTY"
    case MultiLineStringG(ls) =>
      ls.filter(_.nonEmpty).map(ringText(_, close = false))
        .mkString("MULTILINESTRING (", ", ", ")")
    case PolygonG(p)                           => s"POLYGON ${polyText(p)}"
    case MultiPolygonG(ps) if ps.isEmpty       => "MULTIPOLYGON EMPTY"
    case MultiPolygonG(ps) => ps.map(polyText).mkString("MULTIPOLYGON (", ", ", ")")
  }
  def write(p: Polygon): String = write(PolygonG(p))

  private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
  private def ringText(ps: IndexedSeq[Pt], close: Boolean): String = {
    val pts = if (close) ps :+ ps.head else ps
    pts.map(p => s"${num(p.x)} ${num(p.y)}").mkString("(", ", ", ")")
  }
  private def polyText(p: Polygon): String =
    (ringText(p.exterior, close = true) +: p.holes.map(h => ringText(h, close = true)))
      .mkString("(", ", ", ")")

  /** Recursive-descent WKT parser (case-insensitive keywords, Z/M
    * ordinates rejected — raster ops are 2-D). EMPTY is accepted for
    * collection-valued kinds: MULTIPOINT/LINESTRING EMPTY parse to the
    * empty point sequence, POLYGON/MULTIPOLYGON EMPTY parse to
    * MultiPolygonG(Nil) (so parsePolygons yields no polygons); POINT
    * EMPTY fails with a descriptive error — there is no empty Pt. */
  private final class Parser(s: String) {
    private var i = 0

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WKT parse error at ${math.min(i, s.length)}: $msg in '$s'")

    private def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1

    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    private def keyword(): String = {
      ws()
      val start = i
      while (i < s.length && Character.isLetter(s.charAt(i))) i += 1
      if (i == start) fail("expected keyword")
      s.substring(start, i).toUpperCase
    }

    private def number(): Double = {
      ws()
      val start = i
      while (i < s.length && "+-.0123456789eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) fail("expected number")
      try java.lang.Double.parseDouble(s.substring(start, i))
      catch { case _: NumberFormatException => fail(s"bad number '${s.substring(start, i)}'") }
    }

    private def peekIs(c: Char): Boolean = { ws(); i < s.length && s.charAt(i) == c }

    private def point(): Pt = Pt(number(), number())

    /** '(' pt (',' pt)* ')' — each pt may itself be parenthesized
      * (the standard MULTIPOINT form `((1 2), (3 4))` as well as the
      * bare `(1 2, 3 4)`). */
    private def points(): IndexedSeq[Pt] = {
      expect('(')
      def member(): Pt =
        if (peekIs('(')) { i += 1; val p = point(); expect(')'); p }
        else point()
      val buf = IndexedSeq.newBuilder[Pt]
      buf += member()
      while (peekIs(',')) { i += 1; buf += member() }
      expect(')')
      buf.result()
    }

    /** A ring: closing duplicate vertex dropped (WKT requires it;
      * ray-casting doesn't want it). */
    private def ring(): IndexedSeq[Pt] = {
      val ps = points()
      if (ps.length >= 4 && ps.head == ps.last) ps.dropRight(1)
      else if (ps.length >= 3) ps // tolerate unclosed rings
      else fail("ring needs at least 3 distinct points")
    }

    /** '(' ring (',' ring)* ')' -> exterior + holes */
    private def polygonBody(): Polygon = {
      expect('(')
      val ext = ring()
      val holes = Seq.newBuilder[IndexedSeq[Pt]]
      while (peekIs(',')) { i += 1; holes += ring() }
      expect(')')
      Polygon(ext, holes.result())
    }

    private def end(): Unit = {
      ws()
      if (i != s.length) fail("trailing content")
    }

    /** True (consuming the token) if the next token is EMPTY. */
    private def empty(): Boolean = {
      ws()
      if (i < s.length && Character.isLetter(s.charAt(i))) {
        val save = i
        if (keyword() == "EMPTY") true else { i = save; false }
      } else false
    }

    def geometry(): Geom = {
      val kw = keyword()
      if (empty()) {
        end()
        return kw match {
          case "MULTIPOINT"                 => MultiPointG(IndexedSeq.empty)
          case "LINESTRING"                 => LineStringG(IndexedSeq.empty)
          case "MULTILINESTRING"            => MultiLineStringG(Nil)
          case "POLYGON" | "MULTIPOLYGON"   => MultiPolygonG(Nil)
          case "POINT" => fail("POINT EMPTY has no coordinate representation")
          case other   => fail(s"unsupported geometry type $other")
        }
      }
      val g = kw match {
        case "POINT" =>
          expect('('); val p = point(); expect(')'); PointG(p)
        case "MULTIPOINT" => MultiPointG(points())
        case "LINESTRING" => LineStringG(points())
        case "MULTILINESTRING" =>
          expect('(')
          val lines = Seq.newBuilder[IndexedSeq[Pt]]
          lines += points()
          while (peekIs(',')) { i += 1; lines += points() }
          expect(')')
          MultiLineStringG(lines.result())
        case "POLYGON"    => PolygonG(polygonBody())
        case "MULTIPOLYGON" =>
          expect('(')
          val polys = Seq.newBuilder[Polygon]
          polys += polygonBody()
          while (peekIs(',')) { i += 1; polys += polygonBody() }
          expect(')')
          MultiPolygonG(polys.result())
        case other => fail(s"unsupported geometry type $other")
      }
      end()
      g
    }
  }
}
