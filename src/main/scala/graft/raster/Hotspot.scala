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
  * closing float expression per cell, restated as a single
  * exact-integer ratio: every multiply/subtract operand is an exact
  * integer-valued double, so each IEEE op (mul/sub/div/sqrt — no
  * libm) is correctly rounded on bit-identical inputs and the raw
  * double output matches the SQL oracle stating the same DAG exactly.
  * (The r13 lesson: the algebraically-equivalent x̄/m2 form put a
  * round(,5) on a 1e4-magnitude value — 9 significant digits — where
  * Spark's BigDecimal HALF_UP and DuckDB's float-path round diverge;
  * the query twins now micro-quantize the raw value instead.)
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

  /** Getis-Ord Gi* z-score, self-inclusive binary 3x3 weights.
    * Algebraically (Sw − x̄·k)/(sqrt(SS/n − x̄²)·sqrt((k·n−k²)/(n−1))),
    * restated exact-integer:
    * Gi* = (Sw·n − S·k) / sqrt((SS·n − S²)·(k·n − k²)/(n−1)).
    * Both factors under the sqrt and the numerator are exact
    * integer-valued doubles; the quotient is raw (unrounded). */
  def getisOrdGi(l: RasterLayer): DataFrame = {
    val df = withGlobal(l, focalPieces(l))
    val num = col("sw") * col("n") - col("s") * col("k")
    val den2 = (col("ss") * col("n") - col("s") * col("s")) *
      (col("k") * col("n") - col("k") * col("k"))
    // k == n (window covers the whole raster) zeroes the variance
    // term — the statistic is undefined there; emit NULL (and skip
    // the division, which ANSI mode rejects at zero)
    df.select(col("x"), col("y"),
      when(col("k") < col("n"),
        num / sqrt(den2 / (col("n") - lit(1.0)))).as("gi"))
  }

  /** Local Moran's I with self-exclusive binary 3x3 weights and the
    * Σz²/n normalizer. Algebraically ((x − x̄)/m2)·((Sw−x) − (k−1)·x̄),
    * restated exact-integer:
    * I = (x·n − S) · ((Sw−x)·n − (k−1)·S) / (SS·n − S²).
    * Both numerator factors are exact integer-valued doubles, so the
    * single multiply + single divide are bit-identical across engines;
    * the quotient is raw (unrounded). */
  def localMoran(l: RasterLayer): DataFrame = {
    val df = withGlobal(l, focalPieces(l))
    val num1 = col("v") * col("n") - col("s")
    val num2 = (col("sw") - col("v")) * col("n") -
      (col("k") - lit(1.0)) * col("s")
    val den = col("ss") * col("n") - col("s") * col("s")
    // constant raster => den = n²·m2 = 0: undefined, emit NULL
    df.select(col("x"), col("y"),
      when(den > 0.0, num1 * num2 / den).as("moran_i"))
  }
}
