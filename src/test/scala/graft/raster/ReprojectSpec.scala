package graft.raster

import graft.SparkSpec
import graft.core.{CRS, Extent, LayoutDefinition, TileLayout}

/** Generalized arbitrary-CRS tiled reproject (Reproject.reprojectTiled). */
class ReprojectSpec extends SparkSpec {
  import spark.implicits._

  // 8x8-cell lat/lng layer over a box inside UTM zone 33 (lon 12..18,
  // lat 48..54), v = x + 10 y so every cell is identifiable
  val srcLayout = LayoutDefinition(Extent(12, 48, 18, 54), TileLayout(2, 2, 4, 4))
  val src = RasterLayer.fromCells(
    (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y, (x + 10 * y).toDouble))
      .toDF("x", "y", "v"), srcLayout)

  test("identity reproject (LatLng -> LatLng, same layout) returns the grid unchanged") {
    val out = Reproject.reprojectTiled(src, CRS.LatLng, CRS.LatLng, srcLayout)
      .toCells.as[(Long, Long, Double)].collect().toSet
    val expect = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y, (x + 10 * y).toDouble)).toSet
    assert(out == expect)
  }

  test("LatLng -> UTM33N reproject matches per-cell driver-side inverse sampling") {
    val utm = CRS.Utm(33, south = false)
    // dst layout: bounding box of the source corners in UTM metres
    val corners = for (lon <- Seq(12.0, 18.0); lat <- Seq(48.0, 54.0)) yield utm.forward(lon, lat)
    val ext = Extent(corners.map(_._1).min, corners.map(_._2).min,
      corners.map(_._1).max, corners.map(_._2).max)
    val dstLayout = LayoutDefinition(ext, TileLayout(2, 2, 4, 4))
    val out = Reproject.reprojectTiled(src, CRS.LatLng, utm, dstLayout)
      .toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap

    // independent expectation: same sampling math, straight Doubles
    var checked = 0
    for (i <- 0 until 8; j <- 0 until 8) {
      val wx = ext.xmin + (i + 0.5) * dstLayout.cellWidth
      val wy = ext.ymax - (j + 0.5) * dstLayout.cellHeight
      val (lon, lat) = utm.inverse(wx, wy)
      val gx = math.floor((lon - 12.0) / srcLayout.cellWidth).toLong
      val gy = math.floor((54.0 - lat) / srcLayout.cellHeight).toLong
      if (gx >= 0 && gx < 8 && gy >= 0 && gy < 8) {
        assert(out.get((i.toLong, j.toLong)).contains((gx + 10 * gy).toDouble),
          s"dst cell ($i,$j) -> src ($gx,$gy)")
        checked += 1
      } else assert(!out.contains((i.toLong, j.toLong)), s"dst cell ($i,$j) should be NoData")
    }
    assert(checked > 30, s"only $checked interior cells — geometry wrong?")
  }

  test("string CRS names drive the same path (EPSG:4326 -> EPSG:32633)") {
    val utm = CRS.Utm(33, south = false)
    val corners = for (lon <- Seq(12.0, 18.0); lat <- Seq(48.0, 54.0)) yield utm.forward(lon, lat)
    val ext = Extent(corners.map(_._1).min, corners.map(_._2).min,
      corners.map(_._1).max, corners.map(_._2).max)
    val dstLayout = LayoutDefinition(ext, TileLayout(2, 2, 4, 4))
    val byName = Reproject.reprojectTiled(src, "EPSG:4326", "EPSG:32633", dstLayout)
      .toCells.as[(Long, Long, Double)].collect().toSet
    val byObj = Reproject.reprojectTiled(src, CRS.LatLng, utm, dstLayout)
      .toCells.as[(Long, Long, Double)].collect().toSet
    assert(byName == byObj && byName.nonEmpty)
  }

  test("bilinear warp: constant field stays constant, interpolation differs from NN on a ramp") {
    val lo = LayoutDefinition(Extent(0, 0, 64, 64), TileLayout(1, 1, 64, 64))
    val const = RasterLayer.fromCells(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, 7.0)).toDF("x", "y", "v"), lo)
    // dstCols 50 over a 64-cell source: odd*64 != odd*50, so gx - 0.5
    // never sits on a floor boundary (the resolution-ratio rule)
    val cb = Reproject.latLngGridToWebMercatorTiled(const, 0.1, dstTile = 25,
      bilinear = true, dstCols = 50).toCells.as[(Long, Long, Double)].collect()
    assert(cb.nonEmpty)
    // any convex 4-corner average of 7s is exactly 7
    assert(cb.forall(c => math.abs(c._3 - 7.0) < 1e-9))
    val ramp = RasterLayer.fromCells(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, (x * 100).toDouble))
        .toDF("x", "y", "v"), lo)
    val nn = Reproject.latLngGridToWebMercatorTiled(ramp, 0.1, dstTile = 25, dstCols = 50)
      .toCells.as[(Long, Long, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    val bl = Reproject.latLngGridToWebMercatorTiled(ramp, 0.1, dstTile = 25,
      bilinear = true, dstCols = 50).toCells.as[(Long, Long, Double)].collect()
      .map(c => (c._1, c._2) -> c._3).toMap
    // bilinear lands between the NN neighbors (a weighted x-average of
    // the 100-spaced ramp) and differs from NN on interior cells
    val interior = bl.keySet.intersect(nn.keySet)
    assert(interior.count { k => math.abs(bl(k) - nn(k)) > 1e-9 } > interior.size / 2)
    assert(bl.values.forall(v => v >= 0.0 && v <= 6300.0))
  }

  test("cubic warp: partition of unity on constants, exact on linear ramps") {
    val lo = LayoutDefinition(Extent(0, 0, 64, 64), TileLayout(1, 1, 64, 64))
    val const = RasterLayer.fromCells(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, 7.0)).toDF("x", "y", "v"), lo)
    val cc = Reproject.latLngGridToWebMercatorTiled(const, 0.1, dstTile = 25,
      dstCols = 50, method = "CubicConvolution").toCells
      .as[(Long, Long, Double)].collect()
    assert(cc.nonEmpty)
    // Keys weights sum to 1 -> constants reproduce exactly (to ulps)
    assert(cc.forall(c => math.abs(c._3 - 7.0) < 1e-9))
    // a = -0.5 cubic convolution reproduces linear functions: sample a
    // ramp in x and check against the bilinear warp (also linear-exact)
    val ramp = RasterLayer.fromCells(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, (x * 100).toDouble))
        .toDF("x", "y", "v"), lo)
    val cu = Reproject.latLngGridToWebMercatorTiled(ramp, 0.1, dstTile = 25,
      dstCols = 50, method = "CubicConvolution").toCells
      .as[(Long, Long, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    val bl = Reproject.latLngGridToWebMercatorTiled(ramp, 0.1, dstTile = 25,
      bilinear = true, dstCols = 50).toCells
      .as[(Long, Long, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    val common = cu.keySet.intersect(bl.keySet)
    assert(common.size > 500)
    assert(common.forall(k => math.abs(cu(k) - bl(k)) < 1e-6),
      "cubic must agree with bilinear on a linear field")
    // cubic's window is one cell wider: its NoData fringe is a superset
    assert(cu.keySet.subsetOf(bl.keySet))
    // cubic B-spline: partition of unity + zero first moment -> also
    // exact on constants and linear ramps (same checks)
    val bs = Reproject.latLngGridToWebMercatorTiled(const, 0.1, dstTile = 25,
      dstCols = 50, method = "CubicSpline").toCells
      .as[(Long, Long, Double)].collect()
    assert(bs.nonEmpty && bs.forall(c => math.abs(c._3 - 7.0) < 1e-9))
    val bsr = Reproject.latLngGridToWebMercatorTiled(ramp, 0.1, dstTile = 25,
      dstCols = 50, method = "CubicSpline").toCells
      .as[(Long, Long, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    assert(common.forall(k => math.abs(bsr(k) - bl(k)) < 1e-6),
      "b-spline must agree with bilinear on a linear field")
  }

  test("footprint warps: aggregate rules hold pointwise on the ramp") {
    val lo = LayoutDefinition(Extent(0, 0, 64, 64), TileLayout(1, 1, 64, 64))
    // v = x + 100y is GLOBALLY distinct (x < 100), so every footprint
    // is all-distinct and the mode tie rule (-> smallest) is decisive
    val ramp = RasterLayer.fromCells(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, (x + 100 * y).toDouble))
        .toDF("x", "y", "v"), lo)
    def run(m: String) = Reproject.latLngGridToWebMercatorTiled(ramp, 0.1,
      dstTile = 25, dstCols = 50, method = m).toCells
      .as[(Long, Long, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    val (avg, mx, mn, med, mode) =
      (run("Average"), run("Max"), run("Min"), run("Median"), run("Mode"))
    // identical footprints -> identical key sets
    assert(avg.keySet == mx.keySet && mx.keySet == mn.keySet &&
      mn.keySet == med.keySet && med.keySet == mode.keySet && avg.nonEmpty)
    for (k <- avg.keySet) {
      assert(mn(k) <= avg(k) + 1e-12 && avg(k) <= mx(k) + 1e-12)
      assert(mn(k) <= med(k) && med(k) <= mx(k))
      // mode is a member value; on the all-distinct ramp ties resolve
      // to the SMALLEST footprint value
      assert(mode(k) == mn(k))
    }
    // constant field: every aggregate returns the constant
    val const = RasterLayer.fromCells(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, 3.0)).toDF("x", "y", "v"), lo)
    for (m <- Seq("Average", "Max", "Min", "Median", "Mode")) {
      val out = Reproject.latLngGridToWebMercatorTiled(const, 0.1, dstTile = 25,
        dstCols = 50, method = m).toCells.as[(Long, Long, Double)].collect()
      assert(out.nonEmpty && out.forall(_._3 == 3.0), s"method $m")
    }
    intercept[IllegalArgumentException] {
      Reproject.latLngGridToWebMercatorTiled(const, 0.1, method = "Lanczos")
    }
  }

  test("temporal layers reproject per instant (instants never mix)") {
    val tsrc = RasterLayer.fromCellsTemporal(
      (for (t <- 0L until 2L; x <- 0L until 8L; y <- 0L until 8L)
        yield (x, y, t, (x + 10 * y + 100 * t).toDouble))
        .toDF("x", "y", "instant", "v"), srcLayout)
    val out = Reproject.reprojectTiled(tsrc, CRS.LatLng, CRS.LatLng, srcLayout)
      .toCells.as[(Long, Long, Long, Double)].collect()
    assert(out.length == 128)
    assert(out.forall { case (x, y, t, v) => v == (x + 10 * y + 100 * t).toDouble })
  }
}
