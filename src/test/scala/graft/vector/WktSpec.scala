package graft.vector

import org.scalatest.funsuite.AnyFunSuite

class WktSpec extends AnyFunSuite {
  import Wkt._

  test("parses POINT / MULTIPOINT / LINESTRING") {
    assert(parse("POINT (3.5 -2)") == PointG(Pt(3.5, -2)))
    assert(parse("MULTIPOINT (1 2, 3 4)") == MultiPointG(IndexedSeq(Pt(1, 2), Pt(3, 4))))
    assert(parse("LINESTRING (0 0, 1 1, 2 0)") ==
      LineStringG(IndexedSeq(Pt(0, 0), Pt(1, 1), Pt(2, 0))))
  }

  test("parses POLYGON, dropping the closing duplicate vertex") {
    val PolygonG(p) = parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"): @unchecked
    assert(p.exterior == IndexedSeq(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4)))
    assert(p.holes.isEmpty)
  }

  test("parses POLYGON with holes and keyword case/whitespace variants") {
    val PolygonG(p) =
      parse("polygon(( 0 0 ,10 0, 10 10,0 10, 0 0 ),(2 2, 4 2, 4 4, 2 4, 2 2))"): @unchecked
    assert(p.holes.length == 1)
    assert(p.contains(1.0, 1.0))   // inside exterior, outside hole
    assert(!p.contains(3.0, 3.0))  // inside the hole
    assert(!p.contains(11.0, 1.0)) // outside
  }

  test("parses MULTIPOLYGON; parsePolygons flattens it") {
    val wkt = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"
    val polys = parsePolygons(wkt)
    assert(polys.length == 2)
    assert(polys(0).contains(1.0, 1.0) && !polys(0).contains(6.0, 6.0))
    assert(polys(1).contains(6.0, 6.0))
  }

  test("concave polygon containment (L-shape)") {
    // L-shape: 4x4 square minus its upper-right 2x2 quadrant
    val PolygonG(l) =
      parse("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"): @unchecked
    assert(l.contains(1.0, 3.0))  // lower arm
    assert(l.contains(3.0, 1.0))  // right arm
    assert(!l.contains(3.0, 3.0)) // the notch
  }

  test("scientific notation and negatives") {
    assert(parse("POINT (1.5e2 -2.5E-1)") == PointG(Pt(150.0, -0.25)))
  }

  test("write/parse round-trips polygons exactly") {
    val p = Polygon(IndexedSeq(Pt(0.5, 0.5), Pt(10.3, 0.5), Pt(5.5, 9.7)),
      Seq(IndexedSeq(Pt(4.0, 2.0), Pt(6.0, 2.0), Pt(5.0, 4.0))))
    assert(parse(write(p)) == PolygonG(p))
    val mp = MultiPolygonG(Seq(p, Geometry.diamond(8, 8, 2.3)))
    assert(parse(write(mp)) == mp)
  }

  test("EMPTY geometries round-trip through write/parse") {
    // MULTIPOLYGON EMPTY is the canonical empty polygonal form (both
    // POLYGON EMPTY and MULTIPOLYGON EMPTY parse to MultiPolygonG(Nil))
    Seq(MultiPointG(IndexedSeq.empty), LineStringG(IndexedSeq.empty),
        MultiLineStringG(Nil), MultiPolygonG(Nil)).foreach { g =>
      val text = write(g)
      assert(text.endsWith(" EMPTY"), s"'$text' must use the EMPTY keyword, not '()'")
      assert(parse(text) == g, text)
    }
  }

  test("rejects malformed input with a position") {
    assert(intercept[IllegalArgumentException](parse("POLYGON ((0 0, 1 1))"))
      .getMessage.contains("ring"))
    intercept[IllegalArgumentException](parse("TRIANGLE (0 0, 1 1, 2 0)"))
    intercept[IllegalArgumentException](parse("POINT (1 2) junk"))
    intercept[IllegalArgumentException](parsePolygons("POINT (1 2)"))
  }

  test("diamond ray-cast containment equals the L1 test (incl. dy=0 row)") {
    val d = Geometry.diamond(8.5, 8.5, 4.3)
    val PolygonG(parsed) = parse(write(d)): @unchecked
    for (x <- 0 until 17; y <- 0 until 17) {
      val (gx, gy) = (x + 0.5, y + 0.5)
      val want = math.abs(gx - 8.5) + math.abs(gy - 8.5) < 4.3
      assert(parsed.contains(gx, gy) == want, s"cell ($x,$y)")
    }
  }
}
