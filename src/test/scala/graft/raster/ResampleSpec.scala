package graft.raster

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  // full 8x8 grid with v = x (a ramp)
  val ramp = RasterLayer.fromCells(
    (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y, x.toDouble))
      .toDF("x", "y", "v"), layout)

  test("same-size bilinear resample is the identity on interior cells") {
    val out = Resample.bilinearCells(ramp, 8, 8)
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    // fx = fy = 0 -> exactly the source value wherever all 4 corners exist
    assert(out.forall { case ((x, _), v) => v == x.toDouble })
    assert(!out.keySet.exists(_._1 == 7L)) // right edge lacks x0+1 corner
  }

  test("tiled gather path matches the cell-join path exactly") {
    val cellsPath = Resample.bilinearCells(ramp, 8, 4)
      .as[(Long, Long, Double)].collect().toSet
    val tiledPath = Resample.bilinearTiled(ramp, 8, 4, dstTile = 2)
      .toCells.as[(Long, Long, Double)].collect().toSet
    assert(tiledPath == cellsPath)
  }

  test("tiled reproject gather matches the join path exactly") {
    val joinPath = Reproject.latLngGridToWebMercator(ramp, 1.0)
      .as[(Long, Long, Double)].collect().toSet
    val tiledPath = Reproject.latLngGridToWebMercatorTiled(ramp, 1.0, dstTile = 4)
      .toCells.as[(Long, Long, Double)].collect().toSet
    assert(tiledPath == joinPath)
  }

  test("kernel resample reproduces a constant grid exactly (partition of unity)") {
    val const = RasterLayer.fromCells(
      (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y, 7.0))
        .toDF("x", "y", "v"), layout)
    for (k <- Seq(Resample.Kernel.CubicConvolution, Resample.Kernel.CubicSpline,
                  Resample.Kernel.Lanczos)) {
      val out = Resample.kernelTiled(const, 8, 4, k, dstTile = 2)
        .toCells.as[(Long, Long, Double)].collect()
      assert(out.nonEmpty, k.toString)
      // normalized weights: any constant field resamples to itself
      assert(out.forall { case (_, _, v) => math.abs(v - 7.0) < 1e-9 }, k.toString)
    }
  }

  test("cubic convolution interpolates the ramp linearly in its interior") {
    // Keys' kernel reproduces degree<=1 polynomials exactly where the
    // full 4x4 window exists
    val out = Resample.kernelTiled(ramp, 8, 4, Resample.Kernel.CubicConvolution, dstTile = 2)
      .toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    // target col i samples source x = 2i + 0.5; interior columns only
    assert(math.abs(out((1L, 1L)) - 2.5) < 1e-9)
    assert(math.abs(out((2L, 2L)) - 4.5) < 1e-9)
    // border cells lack taps -> NoData (absent)
    assert(!out.keySet.exists(_._1 == 0L) && !out.keySet.exists(_._1 == 3L))
  }

  test("aggregate resample methods collapse blocks deterministically") {
    // 8x8 -> 2x2: each target cell aggregates a 4x4 block of the ramp
    def m(method: String): Map[(Long, Long), Double] =
      Resample.aggregateCells(ramp, 8, 2, method)
        .as[(Long, Long, Double)].collect()
        .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(m("Average")((0L, 0L)) == 1.5) // mean of x in 0..3
    assert(m("Max")((1L, 0L)) == 7.0)
    assert(m("Min")((1L, 0L)) == 4.0)
    assert(m("Sum")((0L, 0L)) == (0 + 1 + 2 + 3) * 4.0)
    assert(m("Median")((0L, 0L)) == 1.5)
    // ramp block holds 4 of each value -> mode tie broken by value asc
    assert(m("Mode")((0L, 0L)) == 0.0)
    assert(m("Mode")((1L, 0L)) == 4.0)
  }

  test("2x downsample interpolates between columns") {
    val out = Resample.bilinearCells(ramp, 8, 4)
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    // target col i sits at source x = 2i + 0.5 -> value 2i + 0.5
    assert(out((0L, 0L)) == 0.5 && out((1L, 1L)) == 2.5 && out((2L, 2L)) == 4.5)
  }

  test("property: area-weighted average conserves total mass on full grids") {
    // Σ out = (dstN/srcN)^2 · Σ in exactly: per-cell weights are exact
    // dyadic fractions (den = srcN^2 a power of two), so double sums
    // are error-free at this size
    for (seed <- 1 to 3; dstN <- Seq(4, 6)) {
      val cells = for (x <- 0L until 8L; y <- 0L until 8L)
        yield (x, y, ((x * 31 + y * 17 + seed * 7) % 23).toDouble)
      val l = RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout)
      val out = Resample.areaAverageTiled(l, 8, dstN, dstTile = dstN)
        .toCells.as[(Long, Long, Double)].collect()
      assert(out.length == dstN * dstN)
      val expect = cells.map(_._3).sum * dstN * dstN / 64
      assert(math.abs(out.map(_._3).sum - expect) < 1e-9,
        s"seed $seed dstN $dstN mass ${out.map(_._3).sum} != $expect")
    }
  }

  test("area-weighted average: exact fractional overlap weights on the ramp") {
    // 8 -> 6: scaled units of 1/6 cell; target 0 covers x0 (w 6) + x1
    // (w 2), target 1 covers x1 (4) + x2 (4), target 2 covers x2 (2)
    // + x3 (6) -> hand values (6*0+2*1)/8, (4*1+4*2)/8, (2*2+6*3)/8
    val out = Resample.areaAverageTiled(ramp, 8, 6, dstTile = 6)
      .toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(out((0L, 0L)) == 2.0 / 8)
    assert(out((1L, 2L)) == 12.0 / 8)
    assert(out((2L, 4L)) == 22.0 / 8)
    assert(out.size == 36)
    // constant field survives any fractional ratio exactly
    val const = RasterLayer.fromCells(
      (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y, 7.0))
        .toDF("x", "y", "v"), layout)
    assert(Resample.areaAverageTiled(const, 8, 6, dstTile = 3)
      .toCells.as[(Long, Long, Double)].collect().forall(_._3 == 7.0))
    // NoData drops from both sums: a hole renormalizes, an all-hole
    // target emits nothing
    val holed = RasterLayer.fromCells(
      (for (x <- 0L until 8L; y <- 0L until 8L if x != 1) yield (x, y, x.toDouble))
        .toDF("x", "y", "v"), layout)
    val h = Resample.areaAverageTiled(holed, 8, 6, dstTile = 6)
      .toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(h((0L, 0L)) == 0.0)          // only x0 left -> pure 0
    assert(h((1L, 0L)) == 2.0)          // only x2 left
  }
}
