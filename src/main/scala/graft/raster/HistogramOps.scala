package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Layer statistics — reference histogram.py (min/max/mean/mode/median/
  * cdf/bin_counts/quantile_breaks) and layer.py get_min_max (:223),
  * get_quantile_breaks (:233), get_histogram (:209).
  *
  * All shapes are per-tile partial aggregation feeding a tiny global
  * combine; nothing but scalars crosses the exchange.
  */
object HistogramOps {

  /** Equal-width bin counts between the layer min/max. The bin formula
    * `least(floor((v - mn) / ((mx - mn) / bins)), bins - 1)` is stated
    * identically in the oracle SQL, so results match bit-for-bit. */
  def binCounts(layer: RasterLayer, bins: Int = 10): DataFrame = {
    val (mn, mx) = layer.minMax()
    val width = (mx - mn) / bins
    layer.toCells
      .select(least(floor((col("v") - lit(mn)) / lit(width)), lit(bins - 1.0)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** min/max/mean/count in one pass (histogram.py:37-96). */
  def stats(layer: RasterLayer): DataFrame = {
    val d = filter(col("tile"), c => !isnan(c))
    layer.df.select(d.as("d"))
      .select(
        sum(expr("aggregate(d, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")).as("vsum"),
        sum(size(col("d"))).cast("long").as("vcount"),
        min(array_min(col("d"))).as("vmin"),
        max(array_max(col("d"))).as("vmax"))
      .select(col("vmin"), col("vmax"), col("vcount"),
              (col("vsum") / col("vcount")).as("vmean"))
  }

  /** Exact interpolated quantiles (get_quantile_breaks :233). Uses
    * Spark's exact `percentile` (sort-based); at production scale the
    * approx_percentile sketch is the right default — both exposed. */
  def quantileBreaks(layer: RasterLayer, qs: Seq[Double]): DataFrame = {
    val cells = layer.toCells
    cells.select(
      qs.zipWithIndex.map { case (q, i) =>
        round(expr(s"percentile(v, $q)"), 5).as(s"q$i")
      }: _*)
  }

  /** Scale-path quantiles: t-digest style sketch, single pass. */
  def approxQuantileBreaks(layer: RasterLayer, qs: Seq[Double]): Array[Double] =
    layer.toCells.stat.approxQuantile("v", qs.toArray, 0.001)
}
