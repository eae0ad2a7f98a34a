package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-pattern statistics (the geostatistics diagnostics next to
  * kriging: Matheron's empirical semivariogram, and the Clark & Evans
  * 1954 nearest-neighbor aggregation index).
  *
  * Determinism: with half-integer point coords every pairwise
  * (dx² + dy²) and value difference square is an exact integer;
  * IEEE sqrt of an exact integer is correctly rounded in BOTH
  * engines, so lag binning and the micro-quantized nearest-neighbor
  * terms are bit-identical, and each statistic closes with a single
  * pinned float expression.
  *
  * Scale: both are written as pair joins, which is right for the
  * dimension-table-sized point sets they're used on (variogram
  * fitting saturates at a few thousand sample points — the standard
  * practice is to SAMPLE before fitting). For full-corpus point sets,
  * block the join by coarse grid cell / geohash prefix first (the
  * Similarity.scala MaxBlock discipline) so only near pairs survive;
  * the operators themselves are agnostic to that prefilter.
  */
object PointStats {
  /** Matheron empirical semivariogram: γ(h) = Σ(v_i − v_j)² / (2·|N_h|)
    * over unordered pairs binned by floor(dist / binWidth). Returns
    * (lag, n_pairs, gamma). */
  def semivariogram(pts: DataFrame, binWidth: Double = 16.0): DataFrame = {
    val a = pts.select(col("pid").as("i"), col("px").as("ax"),
      col("py").as("ay"), col("v").as("av"))
    val b = pts.select(col("pid").as("j"), col("px").as("bx"),
      col("py").as("by"), col("v").as("bv"))
    a.join(b, col("i") < col("j"))
      .select(
        floor(sqrt((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))) / lit(binWidth))
          .cast("long").as("lag"),
        ((col("av") - col("bv")) * (col("av") - col("bv"))).as("dv2"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum("dv2").cast("long").as("sdv2"))
      .select(col("lag"), col("n_pairs"),
        (col("sdv2").cast("double") / (lit(2.0) * col("n_pairs"))).as("gamma"))
  }

  /** Clark & Evans 1954 index R = observed mean NN distance / expected
    * under CSR (0.5·sqrt(area/n)); R < 1 clustered, > 1 dispersed.
    * Mean NN distance accumulates micro-quantized terms (exact Longs)
    * so the sum is order-free. Returns one row (n, mean_nn, r). */
  def clarkEvans(pts: DataFrame, area: Double): DataFrame = {
    val a = pts.select(col("pid").as("i"), col("px").as("ax"), col("py").as("ay"))
    val b = pts.select(col("pid").as("j"), col("px").as("bx"), col("py").as("by"))
    a.join(b, col("i") =!= col("j"))
      .groupBy("i")
      .agg(min((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by"))).as("d2"))
      .select(round(sqrt(col("d2")) * lit(1000000.0)).cast("long").as("q"))
      .agg(count(lit(1)).cast("long").as("n"), sum("q").cast("long").as("sq"))
      .select(col("n"),
        (col("sq").cast("double") / (col("n") * lit(1000000.0))).as("mean_nn"),
        ((col("sq").cast("double") / (col("n") * lit(1000000.0))) /
          (lit(0.5) * sqrt(lit(area) / col("n")))).as("r"))
  }
}
