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

  test("fromScenes ingests PNG/BMP blobs onto the unit grid like a gray TIFF") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // 2x2 gray image, values 10,20,30,40 row-major from top-left —
    // same cell layout as scene 1 above
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    val vs = Seq(10, 20, 30, 40)
    for (y <- 0 until 2; x <- 0 until 2) {
      val v = vs(y * 2 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def enc(fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      require(ImageIO.write(img, fmt, out), s"ImageIO cannot write $fmt")
      out.toByteArray
    }
    val blobs = Seq((1L, enc("png")), (2L, enc("bmp"))).toDF("scene_id", "blob")
    // unit grid anchored at (0, rows): both scenes land on the same
    // 2x2 window of a 4x4 layout
    val small = LayoutDefinition(Extent(0, 0, 4, 4), TileLayout(1, 1, 4, 4))
    val layer = GeoTiff.fromScenes(blobs).tileToLayout(small, CellOp.Max)
    val cells = layer.toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    // grid y grows downward from the layout top; scene top row (10,20)
    // sits at the anchor's top (world y in [1,2) -> grid row 2)
    assert(cells == Map(
      (0L, 2L) -> 10.0, (1L, 2L) -> 20.0, (0L, 3L) -> 30.0, (1L, 3L) -> 40.0))
    // TIFF blobs route through the native decoder in the same call
    val tiffBytes = GeoTiff.encodeTile(
      Array(10.0, 20.0, 30.0, 40.0), 2, 2, 0.0, 2.0, 1.0, 1.0)
    val mixed = Seq((3L, tiffBytes)).toDF("scene_id", "blob")
    val tcells = GeoTiff.fromScenes(mixed).tileToLayout(small, CellOp.Max)
      .toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(tcells == cells)
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
