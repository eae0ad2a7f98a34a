package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LayoutDefinition

/** Point-to-raster interpolation.
  *
  * IDW (inverse-distance-weighted) surfaces — the geotrellis
  * `InverseDistanceWeighted` operation (public; the reference exposes
  * its resample/interpolation constants via
  * geopyspark/geotrellis/__init__.py), re-expressed as a declarative
  * per-point disk enumeration: each point emits the cells inside its
  * `radius` disk (two sequence explodes, the Rasterize broadcast-
  * offset pattern), and one hash aggregation per cell combines the
  * weights. No driver-side point collect, no full-grid enumeration —
  * work scales with points x disk area and the single shuffle is the
  * per-cell groupBy.
  *
  * Determinism contract (the Similarity fixed-point trick): with
  * half-cell-aligned points, every cell-center offset is integral, so
  * d^2 is an exact integer-valued double; weights quantize ONCE to
  * w_q = round(1e9 / d^2) (BIGINT) and both aggregations are exact
  * integer sums — order-free — with a single IEEE division at the
  * end. A cell containing a point exactly (d = 0) takes that point's
  * value verbatim (the standard IDW exact-hit rule).
  */
object Interpolate {

  /** IDW over `points` (pid, px, py, `valueCol` integral) onto the
    * layout's grid, power = 2, cells further than `radius` from every
    * point left NoData (absent). Output cells (x, y, v). */
  def idw(points: DataFrame, layout: LayoutDefinition, radius: Int = 16,
          valueCol: String = "value"): DataFrame = {
    require(radius >= 1)
    val tl = layout.tileLayout
    val (gc, gr) = (tl.layoutCols.toLong * tl.tileCols, tl.layoutRows.toLong * tl.tileRows)
    val r2 = radius.toLong * radius
    val ddx = col("px") - (col("x") + lit(0.5))
    val ddy = col("py") - (col("y") + lit(0.5))
    points
      .select(col("pid"), col("px"), col("py"), col(valueCol).cast("long").as("pv"))
      .withColumn("dx", explode(sequence(lit(-radius), lit(radius))))
      .withColumn("dy", explode(sequence(lit(-radius), lit(radius))))
      .select(col("pid"), col("px"), col("py"), col("pv"),
        (floor(col("px")) + col("dx")).as("x"),
        (floor(col("py")) + col("dy")).as("y"))
      .where(col("x") >= 0 && col("x") < gc && col("y") >= 0 && col("y") < gr)
      .withColumn("d2", ddx * ddx + ddy * ddy)
      .where(col("d2") <= r2)
      .withColumn("wq",
        when(col("d2") > 0, round(lit(1e9) / col("d2")).cast("long")).otherwise(lit(0L)))
      .groupBy("x", "y")
      .agg(sum(col("wq") * col("pv")).as("swv"), sum(col("wq")).as("sw"),
        min(when(col("d2") === 0, col("pv"))).as("hit"))
      .select(col("x"), col("y"),
        when(col("hit").isNotNull, col("hit").cast("double"))
          .otherwise(col("swv").cast("double") / col("sw").cast("double")).as("v"))
  }

  /** Kernel density — the geotrellis `KernelDensity` operation
    * (public): every point stamps a kernel onto the cells around it
    * and stamps sum per cell. The kernel is the Epanechnikov-family
    * parabola w = R^2 - d^2 (support d^2 < R^2): with half-cell-
    * aligned points d^2 is an exact integer, so each cell's density
    * is an exact integer sum of w * value — order-free, no rounding
    * anywhere. Same per-point disk enumeration and single groupBy as
    * [[idw]]; cells outside every kernel are absent (NoData). */
  def kernelDensity(points: DataFrame, layout: LayoutDefinition, radius: Int = 8,
                    valueCol: String = "value"): DataFrame = {
    require(radius >= 1)
    val tl = layout.tileLayout
    val (gc, gr) = (tl.layoutCols.toLong * tl.tileCols, tl.layoutRows.toLong * tl.tileRows)
    val r2 = radius.toLong * radius
    val ddx = col("px") - (col("x") + lit(0.5))
    val ddy = col("py") - (col("y") + lit(0.5))
    points
      .select(col("px"), col("py"), col(valueCol).cast("long").as("pv"))
      .withColumn("dx", explode(sequence(lit(-radius), lit(radius))))
      .withColumn("dy", explode(sequence(lit(-radius), lit(radius))))
      .select(col("px"), col("py"), col("pv"),
        (floor(col("px")) + col("dx")).as("x"),
        (floor(col("py")) + col("dy")).as("y"))
      .where(col("x") >= 0 && col("x") < gc && col("y") >= 0 && col("y") < gr)
      .withColumn("d2", (ddx * ddx + ddy * ddy).cast("long"))
      .where(col("d2") < r2)
      .groupBy("x", "y")
      .agg(sum((lit(r2) - col("d2")) * col("pv")).as("den"))
      .select(col("x"), col("y"), col("den").cast("double").as("v"))
  }
}
