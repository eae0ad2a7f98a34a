package graft.raster

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

class UntiledRasterSpec extends SparkSpec {
  import spark.implicits._

  // two 2x2 scenes: one at (0,6)-(2,8) [top-left], one at (3,3)-(5,5)
  // crossing the center tile boundary of an 8x8/4-tile layout
  val scenes = Seq(
    (1L, 0.0, 6.0, 2.0, 8.0, 2, 2, Seq(1.0, 2.0, 3.0, 4.0)),
    (2L, 3.0, 3.0, 5.0, 5.0, 2, 2, Seq(5.0, 6.0, 7.0, 8.0))
  ).toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  test("collect_metadata combines scene extents") {
    val (e, cw, ch) = UntiledRaster(scenes).collectMetadata()
    assert(e == Extent(0, 3, 5, 8) && cw == 1.0 && ch == 1.0)
  }

  test("tile_to_layout cuts scenes across tile boundaries") {
    val layer = UntiledRaster(scenes).tileToLayout(layout)
    val cells = layer.toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(cells == Map(
      (0L, 0L) -> 1.0, (1L, 0L) -> 2.0, (0L, 1L) -> 3.0, (1L, 1L) -> 4.0,
      (3L, 3L) -> 5.0, (4L, 3L) -> 6.0, (3L, 4L) -> 7.0, (4L, 4L) -> 8.0))
    // scene 2 really straddles all four tiles
    assert(layer.collectKeys().distinct().count() == 4)
  }
}
