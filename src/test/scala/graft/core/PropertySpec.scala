package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the core math (scalacheck, no Spark). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  val coord: Gen[Long] = Gen.choose(0L, 65535L)

  test("zorder is a bijection on the 16-bit grid (de-interleave inverts)") {
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      for (i <- 0 until 16) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    check(Prop.forAll(coord, coord) { (x, y) =>
      deinterleave(ZIndex.zorder(x, y)) == ((x, y))
    })
  }

  test("zorder of adjacent cells differs (injectivity sample)") {
    check(Prop.forAll(coord, coord) { (x, y) =>
      ZIndex.zorder(x, y) != ZIndex.zorder(x + 1, y) &&
      ZIndex.zorder(x, y) != ZIndex.zorder(x, y + 1)
    })
  }

  test("hilbert stays within bounds and neighbors are distinct") {
    val c = Gen.choose(0L, 255L)
    check(Prop.forAll(c, c) { (x, y) =>
      val d = ZIndex.hilbert(x, y, 8)
      d >= 0 && d < 65536 && (x == 255 || ZIndex.hilbert(x + 1, y, 8) != d)
    })
  }

  test("layout mapToKey/keyToExtent are consistent") {
    val ld = LayoutDefinition(Extent(0, 0, 1024, 1024), TileLayout(16, 16, 64, 64))
    val g = Gen.choose(0.0, 1023.999)
    check(Prop.forAll(g, g) { (x, y) =>
      val (c, r) = ld.mapToKey(x, y)
      val e = ld.keyToExtent(c, r)
      e.contains(x, y) || (x == e.xmax || y == e.ymin) // right/bottom edge open
    })
  }

  test("web mercator roundtrip within 1e-9 degrees") {
    val lon = Gen.choose(-179.99, 179.99)
    val lat = Gen.choose(-84.99, 84.99)
    check(Prop.forAll(lon, lat) { (lo, la) =>
      math.abs(CRS.mercXToLng(CRS.lngToMercX(lo)) - lo) < 1e-9 &&
      math.abs(CRS.mercYToLat(CRS.latToMercY(la)) - la) < 1e-9
    })
  }

  test("UTM roundtrip within 1e-9 degrees across any zone and offset") {
    val zone = Gen.choose(1, 60)
    val dlon = Gen.choose(-2.9, 2.9) // within the zone
    val lat = Gen.choose(-80.0, 84.0) // UTM's official latitude band
    check(Prop.forAll(zone, dlon, lat) { (z, dl, la) =>
      val t = CRS.Utm(z, south = la < 0)
      val lon = -183.0 + 6.0 * z + dl
      val (x, y) = t.forward(lon, la)
      val (lon2, lat2) = t.inverse(x, y)
      math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - la) < 1e-9 &&
        y >= 0 // false northing keeps UTM northings non-negative in-band
    })
  }

  test("polar stereographic roundtrip within 1e-9 degrees, poleward of 55") {
    val lon = Gen.choose(-180.0, 180.0)
    val lat = Gen.choose(55.0, 89.99)
    check(Prop.forAll(lon, lat) { (lo, la) =>
      val n = CRS.fromName("EPSG:3413")
      val s = CRS.fromName("EPSG:3031")
      val (nx, ny) = n.forward(lo, la)
      val (nl, np) = n.inverse(nx, ny)
      val (sx, sy) = s.forward(lo, -la)
      val (sl, sp) = s.inverse(sx, sy)
      def dLon(a: Double, b: Double) =
        math.min(math.abs(a - b), 360 - math.abs(a - b))
      dLon(nl, lo) < 1e-9 && math.abs(np - la) < 1e-9 &&
        dLon(sl, lo) < 1e-9 && math.abs(sp + la) < 1e-9
    })
  }

  test("WKT write/parse roundtrips arbitrary geometries of every kind") {
    import graft.vector.{Polygon, Pt, Wkt}
    import graft.vector.Wkt._
    // coordinates that survive the writer's integer-shortening exactly
    val coord: Gen[Double] = Gen.oneOf(
      Gen.choose(-1000, 1000).map(_.toDouble),
      Gen.choose(-8000, 8000).map(_ / 8.0)) // dyadic fractions: exact
    val pt: Gen[Pt] = for (x <- coord; y <- coord) yield Pt(x, y)
    def pts(min: Int): Gen[IndexedSeq[Pt]] =
      Gen.choose(min, min + 5).flatMap(n => Gen.listOfN(n, pt).map(_.toIndexedSeq))
    // distinct vertices so ring-closing dedup can't collapse a ring
    // below the 3-point minimum
    def ring: Gen[IndexedSeq[Pt]] = pts(3).map(_.distinct).retryUntil(_.length >= 3)
    val poly: Gen[Polygon] = for {
      ext <- ring
      holes <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, ring))
    } yield Polygon(ext, holes)
    val geom: Gen[Geom] = Gen.oneOf(
      pt.map(PointG.apply),
      pts(1).map(MultiPointG.apply),
      pts(2).map(LineStringG.apply),
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, pts(2))).map(ls => MultiLineStringG(ls)),
      poly.map(PolygonG.apply),
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, poly)).map(ps => MultiPolygonG(ps)))
    check(Prop.forAll(geom) { g =>
      Wkt.parse(Wkt.write(g)) == g
    })
  }

  test("CellType pack/unpack is clamp-then-identity for every integer type") {
    val v = Gen.oneOf(Gen.choose(-1e10, 1e10), Gen.choose(-300.0, 300.0),
      Gen.const(Double.NaN))
    // bit excluded: no NoData (NaN -> 0) and an 8-cell pack grain —
    // its own laws live in CellTypeSpec
    val ct = Gen.oneOf(CellType.all.filterNot(t => t.isFloat || t.name == "bit"))
    check(Prop.forAll(ct, v) { (t, x) =>
      val back = t.unpack(t.pack(Array(x))).head
      if (x.isNaN) back.isNaN
      else back == t.clamp(x).toLong.toDouble // pack truncates like a cast
    })
  }
}
