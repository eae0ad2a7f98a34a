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
}
