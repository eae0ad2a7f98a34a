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

  test("2x downsample interpolates between columns") {
    val out = Resample.bilinearCells(ramp, 8, 4)
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    // target col i sits at source x = 2i + 0.5 -> value 2i + 0.5
    assert(out((0L, 0L)) == 0.5 && out((1L, 1L)) == 2.5 && out((2L, 2L)) == 4.5)
  }
}
