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

  /** Tile-wise variant of [[latLngGridToWebMercator]] — the scale
    * path: each source tile forward-projects its corner window to find
    * the bounded set of target tiles it can feed (CRS transforms are
    * monotone per axis), ships itself there in ONE keyed shuffle, and
    * each target tile inverse-samples locally. Cell math identical to
    * the join variant, so the same oracle covers both. */
  def latLngGridToWebMercatorTiled(layer: RasterLayer, degPerCell: Double,
                                   dstTile: Int = 64): RasterLayer = {
    import graft.core.TileLayout
    val spark = layer.spark
    import spark.implicits._
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val n = tl.totalCols.toInt
    require(n % dstTile == 0)
    val dstLc = n / dstTile

    val lonMax = n * degPerCell; val latMax = n * degPerCell
    val mxMin = CRS.lngToMercX(0); val mxMax = CRS.lngToMercX(lonMax)
    val myMin = CRS.latToMercY(0); val myMax = CRS.latToMercY(latMax)
    val cw = (mxMax - mxMin) / n
    val ch = (myMax - myMin) / n

    // target-tile rect a source tile can feed: forward project the
    // tile's geographic window to the mercator grid, pad one cell
    def dstRect(c: Int, r: Int): Seq[(Int, Int)] = {
      val lonLo = c.toLong * tc * degPerCell
      val lonHi = (c + 1).toLong * tc * degPerCell
      val latHi = latMax - r.toLong * tr * degPerCell
      val latLo = latMax - (r + 1).toLong * tr * degPerCell
      def txOf(lon: Double) = (CRS.lngToMercX(lon) - mxMin) / cw
      def tyOf(lat: Double) = (myMax - CRS.latToMercY(lat)) / ch
      val txLo = math.max(0, math.floor(txOf(lonLo) - 1).toInt / dstTile)
      val txHi = math.min(dstLc - 1, math.ceil(txOf(lonHi) + 1).toInt / dstTile)
      val tyLo = math.max(0, math.floor(tyOf(latHi) - 1).toInt / dstTile)
      val tyHi = math.min(dstLc - 1, math.ceil(tyOf(latLo) + 1).toInt / dstTile)
      for (dc <- txLo to txHi; dr <- tyLo to tyHi) yield (dc, dr)
    }

    def compute(dc: Int, dr: Int, src: Map[(Int, Int), Array[Double]]): Seq[Double] = {
      val outTile = Array.fill(dstTile * dstTile)(Double.NaN)
      var j = 0
      while (j < dstTile) {
        var i = 0
        while (i < dstTile) {
          val gi = dc.toLong * dstTile + i
          val gj = dr.toLong * dstTile + j
          // identical expression order to the join variant / oracle
          val mx = mxMin + (gi + 0.5) * cw
          val my = myMax - (gj + 0.5) * ch
          val lon = math.toDegrees(mx / CRS.EarthRadius)
          val lat = math.toDegrees(math.atan(math.exp(my / CRS.EarthRadius)) * 2 - math.Pi / 2)
          val x = math.floor(lon / degPerCell).toLong
          val y = math.floor((latMax - lat) / degPerCell).toLong
          if (x >= 0 && x < n && y >= 0 && y < n) {
            src.get(((x / tc).toInt, (y / tr).toInt)).foreach { t =>
              outTile(j * dstTile + i) = t(((y % tr) * tc + (x % tc)).toInt)
            }
          }
          i += 1
        }
        j += 1
      }
      outTile.toSeq
    }

    val outMeta = LayerMetadata(LayoutDefinition(Extent(mxMin, myMin, mxMax, myMax),
      TileLayout(dstLc, dstLc, dstTile, dstTile)), temporal = layer.meta.temporal)

    if (layer.meta.temporal) {
      // spacetime reproject (TemporalTiledRasterLayer.reproject): each
      // instant reprojects independently — instant rides the shuffle key
      val out = layer.df.select(col("col"), col("row"), col("instant"), col("tile"))
        .as[(Int, Int, Long, Seq[Double])]
        .flatMap { case (c, r, t, tile) =>
          dstRect(c, r).map { case (dc, dr) => (dc, dr, t, c, r, tile) }
        }
        .groupByKey(q => (q._1, q._2, q._3))
        .mapGroups { (key: (Int, Int, Long), group: Iterator[(Int, Int, Long, Int, Int, Seq[Double])]) =>
          // tiles to Array ONCE per group: the deserialized Seq has
          // O(n) apply, which would turn every sample into a linear scan
          TileRowOutT(key._1, key._2, key._3,
            compute(key._1, key._2, group.map(q => (q._4, q._5) -> q._6.toArray).toMap))
        }
      new RasterLayer(out.toDF(), outMeta)
    } else {
      val out = layer.df.select(col("col"), col("row"), col("tile"))
        .as[(Int, Int, Seq[Double])]
        .flatMap { case (c, r, tile) =>
          dstRect(c, r).map { case (dc, dr) => (dc, dr, c, r, tile) }
        }
        .groupByKey(q => (q._1, q._2))
        .mapGroups { (key: (Int, Int), group: Iterator[(Int, Int, Int, Int, Seq[Double])]) =>
          TileRowOut(key._1, key._2,
            compute(key._1, key._2, group.map(q => (q._3, q._4) -> q._5.toArray).toMap))
        }
      new RasterLayer(out.toDF(), outMeta)
    }
  }
}
