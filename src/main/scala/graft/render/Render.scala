package graft.render

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.raster.RasterLayer

/** PNG tile rendering — reference to_png_rdd (layer.py:524,1326) +
  * ColorMap (color.py): classify cell values by breaks, map to a ramp,
  * encode each tile as a PNG. Runs as a narrow mapPartitions (one
  * image+encoder per tile, no shuffle); NoData renders transparent.
  */
object Render {

  final case class PngTile(col: Int, row: Int, png: Array[Byte])

  /** Classify + ramp + PNG-encode ONE cell grid — the per-tile kernel
    * [[renderPng]] runs inside executors, also callable driver-side
    * (TMS serving a COG window renders exactly one of these per GET). */
  def renderImage(cells: IndexedSeq[Double], cols: Int, rows: Int,
                  breaks: Seq[Double], ramp: String,
                  strategy: String = "LessThanOrEqualTo"): Array[Byte] = {
    // interpolate the ramp to the break count — the same palette
    // ColorMap.colorize produces for these args (GeoTrellis ColorRamp
    // semantics: n classes span the WHOLE ramp, they don't take its
    // first n raw stops)
    val colors = ColorMap.rampColors(ramp, math.max(breaks.length, 1))
    val sortedBreaks =
      if (strategy.startsWith("Greater")) breaks.sorted.reverse else breaks.sorted

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

    val img = new BufferedImage(cols, rows, BufferedImage.TYPE_INT_ARGB)
    var j = 0
    while (j < rows) {
      var i = 0
      while (i < cols) {
        val v = cells(j * cols + i)
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
    bos.toByteArray
  }

  def renderPng(layer: RasterLayer, breaks: Seq[Double], ramp: String,
                strategy: String = "LessThanOrEqualTo"): Dataset[PngTile] = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val spark = layer.df.sparkSession
    import spark.implicits._

    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (c, r, tile) =>
          PngTile(c, r, renderImage(tile.toIndexedSeq, tc, tr, breaks, ramp, strategy))
        }
      }
  }
}
