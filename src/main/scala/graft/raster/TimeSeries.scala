package graft.raster

import org.apache.spark.sql.functions._

/** Per-cell time-series repair and smoothing over SPACETIME layers —
  * the gap-filled / smoothed composite steps of optical time-series
  * pipelines (cloud-gap interpolation, temporal denoise; the
  * reference's TemporalTiledRasterLayer carries the layout, these ops
  * supply the per-cell temporal math geotrellis users reach for
  * next).
  *
  * Spark shape: ONE groupByKey on (col, row) assembles each tile's
  * full instant stack (|instants| tiles per group — the time
  * dimension is the short axis at raster scale), and the per-cell
  * walk runs in-executor. Output instants are an EXPLICIT parameter,
  * so results never depend on which tiles happened to be present at
  * an instant (cell-level semantics only — a missing tile behaves
  * exactly like a tile of NoData).
  */
object TimeSeries {

  /** Linear gap-fill: for each requested instant, a cell keeps its
    * valid value; a missing/NoData cell takes the linear
    * interpolation between its NEAREST valid instants before and
    * after — v = vp + (vn − vp)·((t − tp)/(tn − tp)) — and stays
    * NoData when either side is missing (no extrapolation). */
  def fillGaps(layer: RasterLayer, instants: Seq[Long]): RasterLayer =
    walk(layer, instants) { (m, sorted, idx, t) =>
      val cur = m.get(t).map(_(idx)).getOrElse(Double.NaN)
      if (!cur.isNaN) cur
      else {
        var tp = Long.MinValue; var tn = Long.MaxValue
        var vp = Double.NaN; var vn = Double.NaN
        var i = 0
        while (i < sorted.length) {
          val ti = sorted(i)
          val v = m(ti)(idx)
          if (!v.isNaN) {
            if (ti < t && ti > tp) { tp = ti; vp = v }
            if (ti > t && ti < tn) { tn = ti; vn = v }
          }
          i += 1
        }
        if (tp == Long.MinValue || tn == Long.MaxValue) Double.NaN
        else vp + (vn - vp) * ((t - tp).toDouble / (tn - tp).toDouble)
      }
    }

  /** Temporal moving average: per cell, the mean of its valid values
    * at instants within `radius` of t (inclusive, t itself included);
    * cells with no valid value in the window stay NoData. Valid cells
    * are smoothed AND isolated gaps narrower than the window fill. */
  def movingAverage(layer: RasterLayer, instants: Seq[Long],
                    radius: Long = 1L): RasterLayer =
    walk(layer, instants) { (m, sorted, idx, t) =>
      var s = 0.0; var n = 0L
      var i = 0
      while (i < sorted.length) {
        val ti = sorted(i)
        if (math.abs(ti - t) <= radius) {
          val v = m(ti)(idx)
          if (!v.isNaN) { s += v; n += 1 }
        }
        i += 1
      }
      if (n == 0) Double.NaN else s / n
    }

  /** Shared walk: one (col, row) groupByKey, per-cell function over
    * the sorted instant stack, one output tile per requested instant. */
  private def walk(layer: RasterLayer, instants: Seq[Long])
                  (f: (Map[Long, Array[Double]], Array[Long], Int, Long) => Double): RasterLayer = {
    require(layer.meta.temporal, "time-series ops need a spacetime layer")
    require(instants.nonEmpty)
    val spark = layer.spark
    import spark.implicits._
    val tl = layer.meta.layout.tileLayout
    val size = tl.tileCols * tl.tileRows
    val ts = instants.toArray.sorted
    val out = layer.df.select(col("col"), col("row"), col("instant"), col("tile"))
      .as[(Int, Int, Long, Seq[Double])]
      .groupByKey(q => (q._1, q._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Long, Seq[Double])]) =>
        val m = it.map(q => q._3 -> q._4.toArray).toMap
        val sorted = m.keys.toArray.sorted
        ts.iterator.map { t =>
          TileRowOutT(key._1, key._2, t,
            Array.tabulate(size)(idx => f(m, sorted, idx, t)).toSeq)
        }
      }
    new RasterLayer(out.toDF(), layer.meta)
  }
}
