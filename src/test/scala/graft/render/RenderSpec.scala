package graft.render

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}
import graft.raster.RasterLayer

class RenderSpec extends SparkSpec {
  import spark.implicits._

  test("renderPng encodes classified tiles with transparent NoData") {
    val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))
    val layer = RasterLayer.fromCells(
      Seq((0L, 0L, 50.0), (1L, 0L, 250.0)).toDF("x", "y", "v"), layout)
    val tiles = Render.renderPng(layer, breaks = Seq(100.0, 300.0), ramp = "BlueToRed")
      .collect()
    assert(tiles.length == 1) // only tile (0,0) has data
    val img = ImageIO.read(new ByteArrayInputStream(tiles.head.png))
    assert(img.getWidth == 4 && img.getHeight == 4)
    assert(img.getRGB(0, 0) == ColorMap.Ramps("BlueToRed")(0)) // 50 <= 100
    assert(img.getRGB(1, 0) == ColorMap.Ramps("BlueToRed")(1)) // 250 <= 300
    assert((img.getRGB(2, 0) >>> 24) == 0)                     // NoData transparent
  }

  test("tms server serves catalog tiles as PNG over HTTP") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tms").toString
    val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))
    val layer = RasterLayer.fromCells(
      Seq((0L, 0L, 50.0), (5L, 5L, 250.0)).toDF("x", "y", "v"), layout)
    graft.catalog.Catalog.write(dir, "demo", layer, zoom = 0)
    val srv = new TmsServer(spark, dir, Seq(100.0, 300.0), "BlueToRed")
    try {
      def get(path: String): (Int, Array[Byte]) = {
        val conn = new java.net.URL(s"http://127.0.0.1:${srv.boundPort}$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code == 200) conn.getInputStream else conn.getErrorStream
        (code, is.readAllBytes())
      }
      val (code, body) = get("/tiles/demo/0/0/0.png")
      assert(code == 200)
      assert(body.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      assert(get("/tiles/demo/0/3/3.png")._1 == 404) // outside layout
    } finally srv.stop()
  }

  test("classify column matches strategies") {
    val df = Seq(5.0, 15.0, 25.0).toDF("v")
    val idx = df.select(ColorMap.classify(org.apache.spark.sql.functions.col("v"),
      Seq(10.0, 20.0)).as("i")).as[Int].collect().toSeq
    assert(idx == Seq(0, 1, -1))
  }
}
