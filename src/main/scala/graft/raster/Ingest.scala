package graft.raster

import org.apache.spark.sql.DataFrame

import graft.core.{CRS, Extent, LayoutDefinition, TileLayout}

/** One-call scene ingest — the reference's
  * `geopyspark.vlm.RasterSource.get` / `rasterio.get` surface
  * (geopyspark vlm/RasterSource.scala:89, rasterio.py:72): read a
  * scene table straight into a TiledRasterLayer at a target layout,
  * reprojecting and resampling on the way. The reference composes
  * GDAL reads + geotrellis tileToLayout behind one call; graft
  * composes its native codecs ([[GeoTiff]]/[[NetCdf]]/[[NetCdf4]]/
  * [[Zarr]]/[[Grib2]]) + [[UntiledRaster.tileToLayout]] +
  * [[Reproject.reprojectTiled]] behind the same one call — every leg
  * stays one declarative Spark plan (decode in Dataset.map, cut in
  * one TileBuildAgg shuffle, warp in one keyed gather).
  *
  * Scale shape: decode is embarrassingly parallel per scene; the cut
  * is the one-shuffle TileBuildAgg path; the warp ships each source
  * tile to the target tiles its padded projected bbox can feed — no
  * driver bytes anywhere.
  */
object Ingest {

  /** Formats [[readToLayout]] accepts, with the blob column each
    * codec expects: geotiff→`tiff`, netcdf/netcdf4→`nc`, grib2→`grib`,
    * zarr→(`key`, `value`) chunk rows. */
  val Formats: Seq[String] = Seq("geotiff", "netcdf", "netcdf4", "zarr", "grib2")

  /** Read scenes into a [[RasterLayer]] at `layout` in one call.
    *
    * @param scenes    scene table: `scene_id` + the format's blob
    *                  column(s) (see [[Formats]])
    * @param format    one of [[Formats]]
    * @param layout    the TARGET layout (in `dstCrs` world coords)
    * @param srcCrs    scene CRS name ("" = already in layout coords —
    *                  no warp, plain cut+resample)
    * @param dstCrs    target CRS name (must come with srcCrs)
    * @param method    warp resampling: NearestNeighbor | Bilinear
    *                  (the [[Reproject.reprojectTiled]] kernel set);
    *                  the no-warp leg resamples by `op` instead
    * @param op        cell combine for the layout cut (and the
    *                  no-warp resample): Max/Sum/Mean/...
    * @param temporal  scenes carry per-message instants (the
    *                  `fromXTemporal` ingest) — the cut keys by
    *                  (tile, instant) and the warp stays per-instant
    * @param varName   netcdf/netcdf4/zarr variable to read
    */
  def readToLayout(scenes: DataFrame, format: String,
                   layout: LayoutDefinition,
                   srcCrs: String = "", dstCrs: String = "",
                   method: String = "NearestNeighbor",
                   op: CellOp = CellOp.Max,
                   temporal: Boolean = false,
                   varName: String = "v"): RasterLayer = {
    require((srcCrs.isEmpty) == (dstCrs.isEmpty),
      "srcCrs and dstCrs must be given together")
    val un = decode(scenes, format, temporal, varName)
    if (srcCrs.isEmpty) {
      // same-CRS ingest: one cut straight to the target layout; `op`
      // is the on-read resample (reference ResampleMethod per cell)
      if (temporal) un.tileToLayoutTemporal(layout, op)
      else un.tileToLayout(layout, op)
    } else {
      // warp ingest: cut on the scenes' own grid first (snapped from
      // collect_metadata so the cut is identity on aligned scenes),
      // then the general tiled warp onto the target layout
      val src = if (temporal) un.tileToLayoutTemporal(srcLayout(un), op)
                else un.tileToLayout(srcLayout(un), op)
      Reproject.reprojectTiled(src, CRS.fromName(srcCrs), CRS.fromName(dstCrs),
        layout, method = method)
    }
  }

  /** The scenes' native layout: collect_metadata extent at the scenes'
    * own cell size, tiled by the largest grid divisor ≤ 256 (whole
    * tiles exactly cover the grid; a prime column count degrades to
    * one tile per row, still correct). */
  private[raster] def srcLayout(un: UntiledRaster): LayoutDefinition = {
    val (ext, cw, ch) = un.collectMetadata()
    val cols = math.rint((ext.xmax - ext.xmin) / cw).toInt
    val rows = math.rint((ext.ymax - ext.ymin) / ch).toInt
    require(cols > 0 && rows > 0, "readToLayout: degenerate scene extent")
    def tileDim(n: Int): Int = (1 to math.min(n, 256)).filter(n % _ == 0).max
    val (tc, tr) = (tileDim(cols), tileDim(rows))
    LayoutDefinition(ext, TileLayout(cols / tc, rows / tr, tc, tr))
  }

  private def decode(scenes: DataFrame, format: String, temporal: Boolean,
                     varName: String): UntiledRaster =
    format.toLowerCase match {
      case "geotiff" | "tiff" =>
        if (temporal) GeoTiff.fromGeoTiffTemporal(scenes)
        else GeoTiff.fromGeoTiff(scenes)
      case "netcdf" =>
        if (temporal) NetCdf.fromNetCdfTemporal(scenes, varName)
        else NetCdf.fromNetCdf(scenes, varName)
      case "netcdf4" | "hdf5" =>
        if (temporal) NetCdf4.fromNetCdf4Temporal(scenes, varName)
        else NetCdf4.fromNetCdf4(scenes, varName)
      case "zarr" =>
        if (temporal) Zarr.fromZarrTemporal(scenes, varName)
        else Zarr.fromZarr(scenes, varName)
      case "grib2" | "grib" =>
        if (temporal) Grib2.fromGribTemporal(scenes)
        else Grib2.fromGrib(scenes)
      case other => throw new IllegalArgumentException(
        s"readToLayout: unknown format '$other' (expected one of ${Formats.mkString(", ")})")
    }

  /** Convenience: derive an Extent-filling square-cell WebMercator
    * layout of `cols`×`rows` cells in `tile`-sized tiles over the
    * lat/lng extent — the reference's ZoomedLayoutScheme-free
    * "just give me this window at this resolution" call. */
  def mercatorLayout(lngMin: Double, latMin: Double, lngMax: Double,
                     latMax: Double, cols: Int, rows: Int,
                     tile: Int): LayoutDefinition = {
    require(cols % tile == 0 && rows % tile == 0,
      "cols/rows must be tile multiples")
    LayoutDefinition(
      Extent(CRS.lngToMercX(lngMin), CRS.latToMercY(latMin),
        CRS.lngToMercX(lngMax), CRS.latToMercY(latMax)),
      TileLayout(cols / tile, rows / tile, tile, tile))
  }
}
