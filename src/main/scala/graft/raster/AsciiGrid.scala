package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ESRI ASCII Grid (.asc) codec — the plain-text raster interchange
  * format (`ncols/nrows/xllcorner/yllcorner/cellsize/NODATA_value`
  * header + row-major space-separated values, row 0 = north edge),
  * written from the public ArcInfo ASCII grid description. The
  * reference stack reaches .asc through GDAL; graft parses it
  * natively, so text-raster drops ingest with no driver.
  *
  * Determinism: values are written with Scala's shortest-round-trip
  * Double formatting (integral values as plain integers), so
  * encode→decode is bit-exact; NODATA cells round-trip as NaN.
  *
  * Scale: per-scene string work inside Dataset.map — same distributed
  * ingest shape as [[GeoTiff]]/[[NetCdf]].
  */
object AsciiGrid {
  /** Encode one grid; `cells` row-major y-down, NaN = NoData. */
  def encodeGrid(cells: Array[Double], cols: Int, rows: Int,
                 xmin: Double, ymin: Double, cellSize: Double,
                 noData: Double = -9999.0): Array[Byte] = {
    require(cells.length == cols * rows, "cells must be cols*rows row-major")
    val sb = new StringBuilder(cells.length * 8 + 128)
    def num(d: Double): String =
      if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
    sb ++= s"ncols $cols\nnrows $rows\n"
    sb ++= s"xllcorner ${num(xmin)}\nyllcorner ${num(ymin)}\n"
    sb ++= s"cellsize ${num(cellSize)}\nNODATA_value ${num(noData)}\n"
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        if (c > 0) sb += ' '
        val v = cells(r * cols + c)
        sb ++= (if (v.isNaN) num(noData) else num(v))
        c += 1
      }
      sb += '\n'
      r += 1
    }
    sb.result().getBytes("US-ASCII")
  }

  /** Parse: (cols, rows, xmin, ymin, cellSize, cells) — NODATA → NaN.
    * Header keys are case-insensitive; `xllcenter`/`yllcenter`
    * variants shift by half a cell per the format's definition. */
  def decode(bytes: Array[Byte]): (Int, Int, Double, Double, Double, Array[Double]) = {
    val toks = new java.util.StringTokenizer(new String(bytes, "US-ASCII"), " \t\r\n")
    def next(): String = {
      require(toks.hasMoreTokens, "truncated ASCII grid")
      toks.nextToken()
    }
    var cols = -1; var rows = -1
    var xll = 0.0; var yll = 0.0; var cell = 1.0; var noData = -9999.0
    var xCenter = false; var yCenter = false
    var first: Option[String] = None
    var reading = true
    while (reading) {
      val key = next()
      key.toLowerCase match {
        case "ncols"        => cols = next().toInt
        case "nrows"        => rows = next().toInt
        case "xllcorner"    => xll = next().toDouble
        case "yllcorner"    => yll = next().toDouble
        case "xllcenter"    => xll = next().toDouble; xCenter = true
        case "yllcenter"    => yll = next().toDouble; yCenter = true
        case "cellsize"     => cell = next().toDouble
        case "nodata_value" => noData = next().toDouble
        case _              => first = Some(key); reading = false
      }
    }
    require(cols > 0 && rows > 0, "ASCII grid header missing ncols/nrows")
    if (xCenter) xll -= cell / 2
    if (yCenter) yll -= cell / 2
    val cells = new Array[Double](cols * rows)
    cells(0) = first.get.toDouble
    var i = 1
    while (i < cells.length) { cells(i) = next().toDouble; i += 1 }
    if (cells(0) == noData) cells(0) = Double.NaN
    i = 1
    while (i < cells.length) {
      if (cells(i) == noData) cells(i) = Double.NaN
      i += 1
    }
    (cols, rows, xll, yll, cell, cells)
  }

  /** ASCII-grid byte scenes → [[UntiledRaster]] (decode distributed).
    * `ascs` columns: (scene_id LONG, asc BINARY). */
  def fromAscii(ascs: DataFrame): UntiledRaster = {
    val spark = ascs.sparkSession
    import spark.implicits._
    val scenes = ascs.select(col("scene_id"), col("asc")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val (cols, rows, xll, yll, cell, cells) = decode(bytes)
        (id, xll, yll, xll + cols * cell, yll + rows * cell,
          cols, rows, cells.toSeq)
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Layer → one .asc scene per tile (the toGeoTiff twin):
    * (col, row, asc BINARY). Square cells required by the format. */
  def toAscii(layer: RasterLayer, noData: Double = -9999.0): DataFrame = {
    val spark = layer.df.sparkSession
    import spark.implicits._
    val meta = layer.meta
    val tl = meta.layout.tileLayout
    val ext = meta.layout.extent
    val cw = meta.layout.cellWidth
    require(math.abs(meta.layout.cellHeight - cw) < 1e-12,
      "ESRI ASCII grid requires square cells")
    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .map { case (c, r, tile) =>
        val xmin = ext.xmin + c.toLong * tl.tileCols * cw
        val ymin = ext.ymax - (r.toLong + 1) * tl.tileRows * cw
        (c, r, encodeGrid(tile.toArray, tl.tileCols, tl.tileRows,
          xmin, ymin, cw, noData))
      }
      .toDF("col", "row", "asc")
  }
}
