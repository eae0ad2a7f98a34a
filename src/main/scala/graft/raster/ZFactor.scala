package graft.raster

/** Latitude -> z-factor calculators for terrain ops over LatLng
  * layers (reference: geopyspark zfactor_lat_lng_calculator /
  * zfactor_calculator, geopyspark/geotrellis/__init__.py:30 and
  * geopyspark-backend ZFactorCalculator.scala).
  *
  * A z-factor converts elevation units to ground-distance units at a
  * given latitude. In EPSG:4326 one degree of ground spans ~111320 m
  * at the equator and shrinks by cos(lat), so a meters-valued DEM on
  * a degrees-valued grid needs zf = 1 / (metersPerDegree(lat)).
  */
object ZFactor {
  /** Ground meters (feet) per degree at the equator.
    *
    * DELIBERATE DEVIATION from the reference: geotrellis
    * Constants.scala:63 hardcodes `METERSATEQUATOR = 11320`, which is
    * 10x too small — its own `FEETATEQUATOR = 365217.6` converts to
    * 111319.5 m, and the WGS84 equatorial circumference / 360 is
    * 111319.49 m. We use the physically correct 111320.0 (same
    * precision class as the reference's feet constant); the feet
    * constant is kept as the reference's, which was already right. */
  val MetersAtEquator = 111320.0
  val FeetAtEquator = 365217.6

  /** Reference lat-lng calculator: zf(lat) = 1/(K * cos(lat)). */
  def latLng(units: String = "Meters"): Double => Double = {
    val k = units match {
      case "Meters" => MetersAtEquator
      case "Feet"   => FeetAtEquator
      case other    => throw new IllegalArgumentException(
        s"unknown units '$other' (Meters/Feet)")
    }
    lat => 1.0 / (k * math.cos(math.toRadians(lat)))
  }

  /** Geodesic cell-area raster for a LatLng layout (the area-weighting
    * companion of the z-factor: per-cell spherical area
    * R²·Δλ·(sin φtop − sin φbot) in km², constant along a grid row) —
    * what area-true statistics over degree grids multiply by before
    * summing.
    *
    * Scale shape: pure grid enumeration — one spark.range over tile
    * keys, each tile built by a transform() lambda from its own row
    * latitudes; no shuffle, no data read. The R²·Δλ factor is
    * precomputed driver-side so engine and oracle share the identical
    * double constant. */
  def cellAreaLayer(spark: org.apache.spark.sql.SparkSession,
                    layout: graft.core.LayoutDefinition,
                    radiusKm: Double = 6371.0): RasterLayer = {
    import org.apache.spark.sql.functions._
    val tl = layout.tileLayout
    val ch = layout.cellHeight
    val scale = cellAreaScale(layout, radiusKm)
    val keys = spark.range(tl.layoutCols.toLong * tl.layoutRows)
      .select((col("id") % tl.layoutCols).cast("int").as("col"),
        (col("id") / tl.layoutCols).cast("int").as("row"))
    val tile = transform(sequence(lit(0), lit(tl.tileRows * tl.tileCols - 1)), i => {
      val gy = (col("row") * tl.tileRows + (i / lit(tl.tileCols)).cast("int")).cast("double")
      val latTop = lit(layout.extent.ymax) - gy * lit(ch)
      lit(scale) * (sin(radians(latTop)) - sin(radians(latTop - lit(ch))))
    })
    new RasterLayer(keys.select(col("col"), col("row"), tile.as("tile")),
      LayerMetadata(layout))
  }

  /** R²·Δλ(rad) — [[cellAreaLayer]]'s shared driver-side constant. */
  def cellAreaScale(layout: graft.core.LayoutDefinition,
                    radiusKm: Double = 6371.0): Double =
    radiusKm * radiusKm * math.toRadians(layout.cellWidth)

  /** Reference table calculator: piecewise-linear interpolation
    * through (latitude, zfactor) control points (the reference feeds
    * a JSON map through a LinearInterpolator; same math, no JSON). */
  def fromTable(points: Seq[(Double, Double)]): Double => Double = {
    require(points.size >= 2, "need at least two (lat, zfactor) points")
    val sorted = points.sortBy(_._1).toArray
    lat => {
      require(lat >= sorted.head._1 && lat <= sorted.last._1,
        s"latitude $lat outside table range [${sorted.head._1}, ${sorted.last._1}]")
      val i = sorted.lastIndexWhere(_._1 <= lat)
      if (i == sorted.length - 1) sorted(i)._2
      else {
        val (x0, y0) = sorted(i); val (x1, y1) = sorted(i + 1)
        y0 + (y1 - y0) * (lat - x0) / (x1 - x0)
      }
    }
  }
}
