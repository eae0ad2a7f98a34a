package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {

  test("geohash: public test vector, prefix nesting, center-decode roundtrip") {
    // the widely-published example point (Råbjerg Mile)
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    // coarser precision is a strict prefix of finer
    assert(Geohash.encode(57.64911, 10.40744, 5) == "u4pru")
    assert(Geohash.encode(0.0, 0.0, 1) == "s")     // origin cell
    assert(Geohash.encode(90.0, 180.0, 3) == "zzz") // +edge clamps into last cell
    assert(Geohash.encode(-90.0, -180.0, 3) == "000")
    // decode returns the cell center: re-encoding the center is identity
    for (p <- Seq(1, 4, 6, 9, 12); (la, lo) <- Seq((57.64911, 10.40744), (-33.86, 151.21))) {
      val gh = Geohash.encode(la, lo, p)
      val (cla, clo) = Geohash.decodeCenter(gh)
      assert(Geohash.encode(cla, clo, p) == gh, s"p=$p")
      assert(math.abs(cla - la) <= 90.0 / (1L << (5 * p / 2)) &&
        math.abs(clo - lo) <= 180.0 / (1L << ((5 * p + 1) / 2)), s"p=$p cell bound")
    }
  }

  test("extent contains / intersects / combine") {
    val e = Extent(0, 0, 10, 10)
    assert(e.contains(5, 5) && !e.contains(10, 5))
    assert(e.intersects(Extent(9, 9, 12, 12)))
    assert(!e.intersects(Extent(10, 10, 12, 12)))
    assert(e.combine(Extent(-1, 2, 3, 11)) == Extent(-1, 0, 10, 11))
  }

  test("layout key math roundtrip") {
    val ld = LayoutDefinition(Extent(0, 0, 256, 256), TileLayout(4, 4, 64, 64))
    assert(ld.cellWidth == 1.0 && ld.cellHeight == 1.0)
    assert(ld.mapToKey(0.5, 255.5) == (0, 0))   // top-left corner
    assert(ld.mapToKey(255.5, 0.5) == (3, 3))   // bottom-right corner
    val te = ld.keyToExtent(1, 1)
    assert(te == Extent(64, 128, 128, 192))
  }

  test("zoomed layout scheme doubles per zoom") {
    val s = ZoomedLayoutScheme(CRS.WebMercatorExtent)
    assert(s.levelFor(0).tileLayout.layoutCols == 1)
    assert(s.levelFor(5).tileLayout.layoutCols == 32)
  }

  test("web mercator roundtrip") {
    for (lng <- Seq(-179.9, -45.0, 0.0, 13.37, 179.9); lat <- Seq(-84.0, -10.0, 0.0, 51.5, 84.0)) {
      assert(math.abs(CRS.mercXToLng(CRS.lngToMercX(lng)) - lng) < 1e-9)
      assert(math.abs(CRS.mercYToLat(CRS.latToMercY(lat)) - lat) < 1e-9)
    }
  }

  test("zorder interleaves and is monotone within quadrants") {
    assert(ZIndex.zorder(0, 0) == 0)
    assert(ZIndex.zorder(1, 0) == 1)
    assert(ZIndex.zorder(0, 1) == 2)
    assert(ZIndex.zorder(1, 1) == 3)
    assert(ZIndex.zorder(255, 255, 8) == 65535)
  }

  test("hilbert visits each cell exactly once on a 4x4 grid") {
    val idx = for (x <- 0 until 4; y <- 0 until 4) yield ZIndex.hilbert(x, y, 2)
    assert(idx.sorted == (0 until 16).map(_.toLong))
  }

  test("zorder3 interleaves per the geotrellis Z3 convention (r20)") {
    // x at bit 0, y at bit 1, t at bit 2, repeating every 3
    assert(ZIndex.zorder3(1, 0, 0) == 1)
    assert(ZIndex.zorder3(0, 1, 0) == 2)
    assert(ZIndex.zorder3(0, 0, 1) == 4)
    assert(ZIndex.zorder3(1, 1, 1) == 7)
    assert(ZIndex.zorder3(2, 0, 0) == 8)
    // x=3 -> bits 0,3; y=5 (101b) -> bits 1,7; t=6 (110b) -> bits 5,8
    assert(ZIndex.zorder3(3, 5, 6) == (1 | 8 | 2 | 128 | 32 | 256))
    // bijective over a small cube
    val all = for (x <- 0L until 4L; y <- 0L until 4L; t <- 0L until 4L)
      yield ZIndex.zorder3(x, y, t, 2)
    assert(all.sorted == (0L until 64L))
  }
}
