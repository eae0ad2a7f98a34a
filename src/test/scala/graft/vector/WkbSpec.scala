package graft.vector

import org.scalatest.funsuite.AnyFunSuite

class WkbSpec extends AnyFunSuite {
  import Wkt._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("known-answer bytes: POINT(1 2) in both byte orders") {
    // the canonical NDR example from the OGC spec family
    assert(hex(Wkb.write(PointG(Pt(1, 2)), littleEndian = true)) ==
      "0101000000000000000000f03f0000000000000040")
    assert(hex(Wkb.write(PointG(Pt(1, 2)), littleEndian = false)) ==
      "00000000013ff00000000000004000000000000000")
    assert(Wkb.parse(Wkb.write(PointG(Pt(1, 2)), littleEndian = false)) ==
      PointG(Pt(1, 2)))
  }

  test("roundtrip all six types, both endiannesses") {
    val ring = IndexedSeq(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4), Pt(0, 0))
    val hole = IndexedSeq(Pt(1, 1), Pt(2, 1), Pt(2, 2), Pt(1, 1))
    val geoms: Seq[Geom] = Seq(
      PointG(Pt(-1.5, 2.25)),
      LineStringG(IndexedSeq(Pt(0, 0), Pt(1, 1), Pt(2, 0))),
      PolygonG(Polygon(ring, Seq(hole))),
      MultiPointG(IndexedSeq(Pt(1, 2), Pt(3, 4))),
      MultiLineStringG(Seq(IndexedSeq(Pt(0, 0), Pt(1, 0)),
        IndexedSeq(Pt(5, 5), Pt(6, 6)))),
      MultiPolygonG(Seq(Polygon(ring), Polygon(hole))))
    for (g <- geoms; le <- Seq(true, false))
      assert(Wkb.parse(Wkb.write(g, le)) == g, s"$g le=$le")
  }

  test("WKT and WKB agree through the shared ADT") {
    val g = Wkt.parse("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 2))")
    assert(Wkb.parse(Wkb.write(g)) == g)
    assert(Wkt.write(Wkb.parse(Wkb.write(g))) == Wkt.write(g))
  }

  test("malformed input is rejected loudly") {
    intercept[IllegalArgumentException](Wkb.parse(Array[Byte]()))
    intercept[IllegalArgumentException](Wkb.parse(Array[Byte](2, 1, 0, 0, 0))) // bad order flag
    val ok = Wkb.write(PointG(Pt(1, 2)))
    intercept[IllegalArgumentException](Wkb.parse(ok ++ Array[Byte](0))) // trailing bytes
  }
}
