package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

/** One-call readToLayout (r18): every native format's scenes land on
  * a target layout identically to the hand-composed decode →
  * tileToLayout chain; the warp leg equals reprojectTiled; the
  * metadata-snapped source layout and the format/arg contracts stay
  * loud. */
class IngestSpec extends SparkSpec {

  private val layout =
    LayoutDefinition(Extent(0, 0, 32, 32), TileLayout(2, 2, 16, 16))

  private def demoLayer(): RasterLayer = {
    import spark.implicits._
    val cells = (0 until 32).flatMap(y => (0 until 32).map(x =>
      (x.toLong, y.toLong, ((x * 7 + y * 13) % 50 + 1).toDouble)))
      .toDF("x", "y", "v")
    RasterLayer.fromCells(cells, layout, CellOp.Sum)
  }

  private def cellsOf(l: RasterLayer): Set[(Long, Long, Double)] = {
    import spark.implicits._
    l.toCells.as[(Long, Long, Double)].collect().toSet
  }

  test("same-CRS ingest equals decode + tileToLayout for all five formats") {
    import spark.implicits._
    val l = demoLayer()
    val want = cellsOf(l)
    // geotiff
    val tiffs = GeoTiff.toGeoTiff(l)
      .select((col("col").cast("long") * 2 + col("row")).as("scene_id"), col("tiff"))
    assert(cellsOf(Ingest.readToLayout(tiffs, "geotiff", layout)) == want)
    // netcdf classic
    val ncs = NetCdf.toNetCdf(l)
      .select((col("col").cast("long") * 2 + col("row")).as("scene_id"), col("nc"))
    assert(cellsOf(Ingest.readToLayout(ncs, "netcdf", layout)) == want)
    // netcdf-4 / hdf5
    val nc4 = NetCdf4.toNetCdf4(l)
      .select((col("col").cast("long") * 2 + col("row")).as("scene_id"), col("nc"))
    assert(cellsOf(Ingest.readToLayout(nc4, "netcdf4", layout)) == want)
    // zarr chunk rows
    val zr = Zarr.toZarr(l)
      .select((col("col").cast("long") * 2 + col("row")).as("scene_id"),
        col("key"), col("value"))
    assert(cellsOf(Ingest.readToLayout(zr, "zarr", layout)) == want)
    // grib2
    val gr = Grib2.toGrib(l)
      .select((col("col").cast("long") * 2 + col("row")).as("scene_id"), col("grib"))
    assert(cellsOf(Ingest.readToLayout(gr, "grib2", layout)) == want)
  }

  test("warp ingest equals the hand-composed reprojectTiled chain") {
    import spark.implicits._
    // georeference the demo grid to 0.1-degree cells
    val degLayout = LayoutDefinition(Extent(0, 0, 3.2, 3.2), TileLayout(2, 2, 16, 16))
    val cells = (0 until 32).flatMap(y => (0 until 32).map(x =>
      (x.toLong, y.toLong, ((x * 7 + y * 13) % 50 + 1).toDouble)))
      .toDF("x", "y", "v")
    val l = RasterLayer.fromCells(cells, degLayout, CellOp.Sum)
    val dst = Ingest.mercatorLayout(0, 0, 3.2, 3.2, 25, 25, 25)
    val tiffs = GeoTiff.toGeoTiff(l)
      .select((col("col").cast("long") * 2 + col("row")).as("scene_id"), col("tiff"))
    val got = cellsOf(Ingest.readToLayout(tiffs, "geotiff", dst,
      srcCrs = "EPSG:4326", dstCrs = "EPSG:3857", method = "Bilinear"))
    // hand-composed: decode -> metadata cut -> general warp
    val un = GeoTiff.fromGeoTiff(tiffs)
    val src = un.tileToLayout(Ingest.srcLayout(un), CellOp.Max)
    val want = cellsOf(Reproject.reprojectTiled(src,
      graft.core.CRS.fromName("EPSG:4326"), graft.core.CRS.fromName("EPSG:3857"),
      dst, method = "Bilinear"))
    assert(got == want && got.nonEmpty)
  }

  test("temporal ingest keys instants through the cut") {
    import spark.implicits._
    val l = demoLayer()
    // two instants per tile through the GRIB message-stream path
    val scenes = l.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .map { case (c, r, tile) =>
        (c.toLong * 2 + r, Grib2.encodeScenes(
          Array(1000L, 2000L), Array(tile.toArray, tile.toArray),
          16, 16, c * 16.0, 16.0 - r * 16.0,
          c * 16.0 + 16.0, 32.0 - r * 16.0))
      }.toDF("scene_id", "grib")
    val out = Ingest.readToLayout(scenes, "grib2", layout, temporal = true)
    val insts = out.toCells.select("instant").distinct()
      .as[Long].collect().sorted.toSeq
    assert(insts == Seq(1000L, 2000L))
    assert(out.toCells.count() == 2 * 32 * 32)
  }

  test("srcLayout snaps to the scene grid; contracts fail loudly") {
    val l = demoLayer()
    val un = GeoTiff.fromGeoTiff(GeoTiff.toGeoTiff(l)
      .select((col("col").cast("long") * 2 + col("row")).as("scene_id"), col("tiff")))
    val sl = Ingest.srcLayout(un)
    assert(sl.tileLayout.totalCols == 32 && sl.tileLayout.totalRows == 32)
    assert(sl.tileLayout.tileCols == 32) // largest divisor <= 256
    intercept[IllegalArgumentException] {
      Ingest.readToLayout(un.df, "parquetish", layout)
    }
    intercept[IllegalArgumentException] {
      Ingest.readToLayout(un.df, "geotiff", layout, srcCrs = "EPSG:4326")
    }
  }
}
