package graft.raster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CRS, Extent, LayoutDefinition}

/** Raster reprojection — reference layer.py reproject (:876,1668):
  * build the target layout, inverse-project each target cell center into
  * the source CRS, and sample the source grid (nearest neighbor here;
  * bilinear composes with Resample).
  *
  * Spark shape: target cells are generated distributed, the inverse
  * transform is pure codegen'd column math, and sampling is ONE keyed
  * join against the source cells. At production scale the join becomes
  * a tile-wise gather (each target tile maps to a bounded source-tile
  * rect); same math, same single shuffle.
  */
object Reproject {

  /** Reproject a unit-grid layer interpreted as lat/lng (degrees =
    * gridCoord * degPerCell) onto an N x N web-mercator grid covering
    * the same geographic box. Returns target cells (x, y, v). */
  def latLngGridToWebMercator(layer: RasterLayer, degPerCell: Double): DataFrame = {
    val spark = layer.spark
    val n = layer.meta.layout.tileLayout.totalCols
    val src = layer.toCells

    // geographic box of the source grid
    val lonMax = n * degPerCell
    val latMax = n * degPerCell
    // mercator bounds of that box (driver-side, exact same formulas)
    val mxMin = CRS.lngToMercX(0); val mxMax = CRS.lngToMercX(lonMax)
    val myMin = CRS.latToMercY(0); val myMax = CRS.latToMercY(latMax)
    val cw = (mxMax - mxMin) / n
    val ch = (myMax - myMin) / n

    val targets = spark.range(n).select(col("id").as("tx"))
      .crossJoin(spark.range(n).select(col("id").as("ty")))
      // target cell center in mercator coords (y-down rows)
      .withColumn("mx", lit(mxMin) + (col("tx") + lit(0.5)) * cw)
      .withColumn("my", lit(myMax) - (col("ty") + lit(0.5)) * ch)
      // inverse web-mercator -> degrees
      .withColumn("lon", degrees(col("mx") / CRS.EarthRadius))
      .withColumn("lat", degrees(atan(exp(col("my") / CRS.EarthRadius)) * 2 - lit(math.Pi / 2)))
      // nearest source cell (y-down: grid y counts down from latMax)
      .withColumn("x", floor(col("lon") / degPerCell).cast("long"))
      .withColumn("y", floor((lit(latMax) - col("lat")) / degPerCell).cast("long"))
    targets.join(src, Seq("x", "y"))
      .select(col("tx").as("x"), col("ty").as("y"), col("v"))
  }
}
