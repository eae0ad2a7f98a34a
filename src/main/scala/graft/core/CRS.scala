package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coordinate reference systems + transforms, Spark-first: transforms are
  * `Column -> Column` so they compile to codegen'd Catalyst expressions
  * (no UDFs), and plain-Double variants for driver-side math.
  *
  * Reference behavior: geopyspark layer.py `reproject()` /
  * key_conversion.py (EPSG:4326 lat-lng <-> EPSG:3857 spherical web
  * mercator). Formulas are the public spherical-mercator equations.
  */
object CRS {
  val EarthRadius = 6378137.0
  /** EPSG:3857 world extent (square, +/- pi*R). */
  val WebMercatorExtent: Extent = {
    val m = math.Pi * EarthRadius
    Extent(-m, -m, m, m)
  }
  val LatLngExtent: Extent = Extent(-180, -90, 180, 90)

  // ---- driver-side (pure) ----
  def lngToMercX(lng: Double): Double = EarthRadius * math.toRadians(lng)
  def latToMercY(lat: Double): Double =
    EarthRadius * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
  def mercXToLng(x: Double): Double = math.toDegrees(x / EarthRadius)
  def mercYToLat(y: Double): Double =
    math.toDegrees(2 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2)

  // ---- Column (codegen) variants ----
  def lngToMercXCol(lng: Column): Column = radians(lng) * lit(EarthRadius)
  def latToMercYCol(lat: Column): Column =
    log(tan(lit(math.Pi / 4) + radians(lat) / 2)) * lit(EarthRadius)

  /** TMS/XYZ tile coordinates at `zoom` for a lon/lat point (y grows
    * south, as in web tiling). Reference: key_conversion.py. */
  def tmsTileCol(lng: Column, lat: Column, zoom: Int): (Column, Column) = {
    val n  = lit((1L << zoom).toDouble)
    val tx = floor((lng + 180.0) / 360.0 * n)
    val ty = floor((lit(1.0) - log(tan(radians(lat)) + lit(1.0) / cos(radians(lat))) / lit(math.Pi)) / 2.0 * n)
    (tx.cast("long"), ty.cast("long"))
  }
}
