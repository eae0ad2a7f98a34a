package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NetCDF-4 (HDF5-backed) scene codec — the [[NetCdf]] classic API
  * over the [[Hdf5]] container: the format every post-2015 climate
  * product ships (CMIP6, ERA5 downloads, most LP DAAC collections).
  * The reference reads it through GDAL (rasterio.py); graft decodes
  * the gridded subset natively.
  *
  * Grid conventions (matching [[NetCdf]]'s, so both formats ingest to
  * the same UntiledRaster rows):
  *  - data variable dims (y, x) or (time, y, x), row-major y-down;
  *  - extent from root attributes xmin/ymin/xmax/ymax when present,
  *    else derived from the x/y coordinate variables' cell centers
  *    (uniform spacing assumed — the CF regular-grid case);
  *  - `time` is a 1-D i64/f64 coordinate dataset of epoch seconds.
  *
  * Data variables write as ONE deflated chunk per scene (2D) or per
  * record (3D) — the chunked+gzip layout real NetCDF-4 files carry —
  * and read back through the chunk B-tree + inflate path, so the
  * roundtrip oracle exercises the real machinery, not a contiguous
  * shortcut.
  *
  * Scale shape: identical to [[NetCdf]] — per-scene-row encode/decode
  * inside Dataset.map, distributed, no driver bytes.
  */
object NetCdf4 {

  private def doublesToBytes(vals: Array[Double]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(out.putDouble)
    out.array()
  }

  /** One 2D grid (dims y, x) + coordinate vars + extent root attrs —
    * the [[NetCdf.encodeGrid]] twin, deflate-chunked. */
  def encodeGrid(cells: Array[Double], cols: Int, rows: Int,
                 xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                 varName: String = "v"): Array[Byte] = {
    require(cells.length == cols * rows, "cells must be cols*rows row-major")
    val cw = (xmax - xmin) / cols; val ch = (ymax - ymin) / rows
    val ys = Array.tabulate(rows)(r => ymax - (r + 0.5) * ch)
    val xs = Array.tabulate(cols)(c => xmin + (c + 0.5) * cw)
    Hdf5.encode(
      Seq(
        Hdf5.Ds("y", Seq(rows.toLong), doublesToBytes(ys), 8, 1),
        Hdf5.Ds("x", Seq(cols.toLong), doublesToBytes(xs), 8, 1),
        Hdf5.Ds(varName, Seq(rows.toLong, cols.toLong), doublesToBytes(cells),
          8, 1, deflate = true)),
      Seq("xmin" -> Array(xmin), "ymin" -> Array(ymin),
        "xmax" -> Array(xmax), "ymax" -> Array(ymax)))
  }

  /** Record-dimension twin of [[NetCdf.encodeScenes]]: var (time, y,
    * x) deflate-chunked, `time` an i64 coordinate of epoch seconds. */
  def encodeScenes(instants: Array[Long], slabs: Array[Array[Double]],
                   cols: Int, rows: Int,
                   xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                   varName: String = "v"): Array[Byte] = {
    require(instants.length == slabs.length && slabs.forall(_.length == cols * rows),
      "one cols*rows slab per instant")
    val tbuf = java.nio.ByteBuffer.allocate(instants.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    instants.foreach(tbuf.putLong)
    val all = doublesToBytes(slabs.flatten.toArray)
    Hdf5.encode(
      Seq(
        Hdf5.Ds("time", Seq(instants.length.toLong), tbuf.array(), 8, 0),
        // one chunk PER RECORD — the multi-entry chunk B-tree layout
        Hdf5.Ds(varName, Seq(instants.length.toLong, rows.toLong, cols.toLong),
          all, 8, 1, deflate = true, chunk = Some(Seq(1, rows, cols)))),
      Seq("xmin" -> Array(xmin), "ymin" -> Array(ymin),
        "xmax" -> Array(xmax), "ymax" -> Array(ymax)))
  }

  /** Extent of a decoded file: root attrs if present, else derived
    * from the x/y coordinate cell centers (uniform spacing). */
  private def extentOf(h5: Hdf5.H5File): (Double, Double, Double, Double) = {
    val a = h5.rootAttrs
    if (Seq("xmin", "ymin", "xmax", "ymax").forall(a.contains))
      (a("xmin")(0), a("ymin")(0), a("xmax")(0), a("ymax")(0))
    else {
      val xs = h5.readVar(h5.datasets.collectFirst {
        case d if d.name == "x" || d.name == "lon" => d.name
      }.getOrElse(throw new IllegalArgumentException("no x/lon coordinate")))
      val ys = h5.readVar(h5.datasets.collectFirst {
        case d if d.name == "y" || d.name == "lat" => d.name
      }.getOrElse(throw new IllegalArgumentException("no y/lat coordinate")))
      val cw = if (xs.length > 1) xs(1) - xs(0) else 1.0
      val ch = if (ys.length > 1) math.abs(ys(0) - ys(1)) else 1.0
      (xs.min - cw / 2, ys.min - ch / 2, xs.max + cw / 2, ys.max + ch / 2)
    }
  }

  private def sceneRow(id: Long, h5: Hdf5.H5File, varName: String,
                       rows: Int, cols: Int, cells: Array[Double])
      : (Long, Double, Double, Double, Double, Int, Int, Seq[Double]) = {
    val (xmin, ymin, xmax, ymax) = extentOf(h5)
    (id, xmin, ymin, xmax, ymax, cols, rows, cells.toSeq)
  }

  /** NetCDF-4 byte scenes → [[UntiledRaster]] — the
    * [[NetCdf.fromNetCdf]] twin. `ncs` columns: (scene_id, nc). */
  def fromNetCdf4(ncs: DataFrame, varName: String = "v"): UntiledRaster = {
    val spark = ncs.sparkSession
    import spark.implicits._
    val scenes = ncs.select(col("scene_id"), col("nc")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val h5 = Hdf5.decode(bytes)
        val d = h5.dataset(varName)
        require(d.dims.length == 2, s"'$varName' must be 2D (y, x)")
        sceneRow(id, h5, varName, d.dims(0).toInt, d.dims(1).toInt, h5.readVar(varName))
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Temporal twin: every index of the leading `time` dimension
    * becomes one scene stamped with its epoch-second instant. */
  def fromNetCdf4Temporal(ncs: DataFrame, varName: String = "v"): UntiledRaster = {
    val spark = ncs.sparkSession
    import spark.implicits._
    val scenes = ncs.select(col("scene_id"), col("nc")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val h5 = Hdf5.decode(bytes)
        val d = h5.dataset(varName)
        require(d.dims.length == 3, s"'$varName' must be 3D (time, y, x)")
        val times = h5.readVar("time")
        val all = h5.readVar(varName) // one decode, sliced per record
        val per = (d.dims(1) * d.dims(2)).toInt
        times.indices.map { r =>
          val slab = java.util.Arrays.copyOfRange(all, r * per, (r + 1) * per)
          val row = sceneRow(id * 65536 + r, h5, varName,
            d.dims(1).toInt, d.dims(2).toInt, slab)
          (row._1, row._2, row._3, row._4, row._5, row._6, row._7, row._8,
            times(r).toLong)
        }
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells", "instant")
    UntiledRaster(scenes)
  }

  /** Layer → one NetCDF-4 scene per tile — the [[NetCdf.toNetCdf]]
    * twin: (col, row, nc BINARY). */
  def toNetCdf4(layer: RasterLayer): DataFrame = {
    val spark = layer.df.sparkSession
    import spark.implicits._
    val meta = layer.meta
    val tl = meta.layout.tileLayout
    val ext = meta.layout.extent
    val cw = meta.layout.cellWidth; val chh = meta.layout.cellHeight
    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .map { case (c, r, tile) =>
        val xmin = ext.xmin + c.toLong * tl.tileCols * cw
        val ymax = ext.ymax - r.toLong * tl.tileRows * chh
        (c, r, encodeGrid(tile.toArray, tl.tileCols, tl.tileRows,
          xmin, ymax - tl.tileRows * chh, xmin + tl.tileCols * cw, ymax))
      }
      .toDF("col", "row", "nc")
  }
}
