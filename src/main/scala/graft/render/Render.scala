package graft.render

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.raster.RasterLayer

/** PNG tile rendering — reference to_png_rdd (layer.py:524,1326) +
  * ColorMap (color.py): classify cell values by breaks, map to a ramp,
  * encode each tile as a PNG. Runs as a narrow mapPartitions (one
  * image+encoder per tile, no shuffle); NoData renders transparent.
  */
object Render {

  final case class PngTile(col: Int, row: Int, png: Array[Byte])

  def renderPng(layer: RasterLayer, breaks: Seq[Double], ramp: String,
                strategy: String = "LessThanOrEqualTo"): Dataset[PngTile] = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val colors = ColorMap.Ramps(ramp)
    val sortedBreaks =
      if (strategy.startsWith("Greater")) breaks.sorted.reverse else breaks.sorted
    val spark = layer.df.sparkSession
    import spark.implicits._

    def classify(v: Double): Int = {
      var i = 0
      while (i < sortedBreaks.length) {
        val b = sortedBreaks(i)
        val hit = strategy match {
          case "LessThanOrEqualTo"    => v <= b
          case "LessThan"             => v < b
          case "GreaterThanOrEqualTo" => v >= b
          case "GreaterThan"          => v > b
          case "Exact"                => v == b
        }
        if (hit) return i
        i += 1
      }
      -1
    }

    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (c, r, tile) =>
          val img = new BufferedImage(tc, tr, BufferedImage.TYPE_INT_ARGB)
          var j = 0
          while (j < tr) {
            var i = 0
            while (i < tc) {
              val v = tile(j * tc + i)
              val argb =
                if (v.isNaN) 0x00000000
                else {
                  val idx = classify(v)
                  if (idx < 0) 0x00000000
                  else colors(math.min(idx, colors.length - 1))
                }
              img.setRGB(i, j, argb)
              i += 1
            }
            j += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          PngTile(c, r, bos.toByteArray)
        }
      }
  }
}
