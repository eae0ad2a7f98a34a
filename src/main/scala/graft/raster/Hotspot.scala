package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local spatial-autocorrelation statistics (the ArcGIS Hot Spot
  * Analysis / Cluster-Outlier toolset): Getis-Ord Gi* (Getis & Ord
  * 1992) and local Moran's I (Anselin 1995) with binary 3x3 weights.
  *
  * Both decompose into (a) three exact GLOBAL moments (n, Σx, Σx² —
  * integral cells keep the double sums exact), broadcast as one row,
  * and (b) per-cell focal sums Sw = Σ_{3x3} x and k = #present
  * neighbors from the standard halo exchange — then one fixed-order
  * closing float expression per cell. Every input to the closing is
  * an exact integer, and the expression uses only IEEE-pinned ops
  * (div/mul/sub/sqrt — no libm), so the rounded output is
  * bit-identical to the SQL oracle stating the same DAG.
  *
  * Scale: two halo exchanges (values + presence mask), one broadcast
  * of a 1-row global, co-keyed cell join — no global shuffle beyond
  * the focal machinery's.
  */
object Hotspot {
  /** Per-cell (x, y, v, sw, k): value, 3x3 sum incl center, 3x3
    * present-cell count incl center. */
  private def focalPieces(l: RasterLayer): DataFrame = {
    val sw = l.focal(Neighborhood.Square(1), "Sum").toCells
      .withColumnRenamed("v", "sw")
    val ones = l.localMap(c => when(isnan(c), c).otherwise(lit(1.0)))
    val k = ones.focal(Neighborhood.Square(1), "Sum").toCells
      .withColumnRenamed("v", "k")
    l.toCells.join(sw, Seq("x", "y")).join(k, Seq("x", "y"))
  }

  private def withGlobal(l: RasterLayer, pieces: DataFrame): DataFrame = {
    val g = l.toCells.agg(
      count(lit(1)).cast("long").as("n"),
      sum("v").as("s"),
      sum(col("v") * col("v")).as("ss"))
    pieces.crossJoin(broadcast(g))
  }

  /** Getis-Ord Gi* z-score, self-inclusive binary 3x3 weights:
    * Gi* = (Sw − x̄·k) / (sqrt(SS/n − x̄²) · sqrt((k·n − k²)/(n−1))). */
  def getisOrdGi(l: RasterLayer): DataFrame = {
    val df = withGlobal(l, focalPieces(l))
    val xbar = col("s") / col("n")
    val sden = sqrt(col("ss") / col("n") - xbar * xbar)
    // k == n (window covers the whole raster) zeroes the variance
    // term — the statistic is undefined there; emit NULL (and skip
    // the division, which ANSI mode rejects at zero)
    df.select(col("x"), col("y"),
      when(col("k") < col("n"),
        round((col("sw") - xbar * col("k")) /
          (sden * sqrt((col("k") * col("n") - col("k") * col("k")) /
            (col("n") - lit(1.0)))), 5)).as("gi"))
  }

  /** Local Moran's I with self-exclusive binary 3x3 weights and the
    * Σz²/n normalizer: I = ((x − x̄)/m2) · ((Sw − x) − (k−1)·x̄). */
  def localMoran(l: RasterLayer): DataFrame = {
    val df = withGlobal(l, focalPieces(l))
    val xbar = col("s") / col("n")
    val m2 = col("ss") / col("n") - xbar * xbar
    // constant raster => m2 = 0: undefined, emit NULL
    df.select(col("x"), col("y"),
      when(m2 > 0.0,
        round(((col("v") - xbar) / m2) *
          ((col("sw") - col("v")) - (col("k") - lit(1.0)) * xbar), 5)).as("moran_i"))
  }
}
