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

  /** Ripley's K at a fixed radius ladder (Ripley 1977, border-
    * uncorrected estimator): k_r = #ORDERED pairs (i≠j) with d² ≤ r²,
    * K̂(r) = A·k_r / (n·(n−1)).
    *
    * Pair generation is blocked by a coarse bucket of edge r_max: each
    * candidate point is exploded into its 3×3 bucket neighborhood and
    * equi-joined on the bucket key, so only near pairs ever enter the
    * join — the 100 TB shape (the oracle's all-pairs join is the
    * sf-bounded restatement). d² is an exact integer (half-integer
    * coords cancel), counts are exact Longs, and each K̂ closes with
    * one exact integer multiply + a single IEEE divide on exact
    * operands — raw doubles out, micro-quantized in the query twin.
    *
    * @return one row: (n, k{r}... BIGINT, kh{r}... raw double) */
  def ripleyK(pts: DataFrame, radii: Seq[Int] = Seq(4, 8, 16, 32),
              area: Long = 65536L): DataFrame = {
    require(radii.nonEmpty && radii.forall(_ > 0), "radii must be positive")
    val rmax = radii.max
    val a = pts.select(col("pid").as("i"), col("px").as("ax"), col("py").as("ay"))
      .withColumn("bx", floor(col("ax") / rmax).cast("long"))
      .withColumn("by", floor(col("ay") / rmax).cast("long"))
    val nbrBuckets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val b = pts.select(col("pid").as("j"), col("px").as("jx"), col("py").as("jy"))
      .select(col("j"), col("jx"), col("jy"),
        explode(array(nbrBuckets.map { case (dx, dy) =>
          struct((floor(col("jx") / rmax).cast("long") + dx).as("bx"),
            (floor(col("jy") / rmax).cast("long") + dy).as("by"))
        }: _*)).as("nb"))
      .select(col("j"), col("jx"), col("jy"),
        col("nb.bx").as("bx"), col("nb.by").as("by"))
    val d2 = (col("ax") - col("jx")) * (col("ax") - col("jx")) +
      (col("ay") - col("jy")) * (col("ay") - col("jy"))
    val pairs = a.join(b, Seq("bx", "by"))
      .where(col("i") =!= col("j") && d2 <= lit(rmax * rmax))
      .select(d2.as("d2"))
    val countCols = radii.map(r =>
      sum(when(col("d2") <= lit(r * r), 1L).otherwise(0L)).as(s"k$r"))
    val counts = pairs.agg(countCols.head, countCols.tail: _*)
    val n = pts.agg(count(lit(1)).cast("long").as("n"))
    val khCols = radii.map(r =>
      ((col(s"k$r") * lit(area)).cast("double") /
        (col("n") * (col("n") - lit(1L))).cast("double")).as(s"kh$r"))
    counts.crossJoin(broadcast(n))
      .select(col("n") +: radii.map(r => col(s"k$r")) ++: khCols: _*)
  }

  /** Quadrat-count variance-mean ratio (the classic CSR dispersion
    * test; VMR > 1 clustered, < 1 regular): counts per `quadrat`-sized
    * cell over a `frame`×`frame` extent (q quadrats, empty ones
    * contribute 0 to both moments so they never materialize), closed
    * exact-integer: VMR = s²/x̄ = (q·Σc² − n²) / ((q−1)·n),
    * micro-quantized ×1e6. One bounded groupBy, one row out. */
  def quadratVmr(pts: DataFrame, quadrat: Int = 32,
                 frame: Int = 256): DataFrame = {
    require(frame % quadrat == 0, "quadrat must divide the frame")
    val q = (frame / quadrat).toLong * (frame / quadrat)
    pts.groupBy(floor(col("px") / quadrat).cast("long").as("qx"),
        floor(col("py") / quadrat).cast("long").as("qy"))
      .agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n"), sum(col("c") * col("c")).as("sum_c2"))
      .select(col("n"), lit(q).as("q"), col("sum_c2"),
        round((col("sum_c2") * lit(q) - col("n") * col("n")) * lit(1000000.0) /
          (lit(q - 1) * col("n"))).cast("long").as("vmr_u"))
  }

  /** Nearest-neighbor distance CDF — the G-function of point-pattern
    * analysis (Diggle): counts of points whose NN distance is ≤ r at
    * the fixed radius ladder, all exact integers off the exact NN d².
    * The NN search reuses the pair join; at corpus scale block it by
    * coarse cell first (the ripleyK bucketing). One row:
    * (n, g{r}... BIGINT). */
  def nnDistanceCdf(pts: DataFrame, radii: Seq[Int] = Seq(2, 4, 8, 16)): DataFrame = {
    require(radii.nonEmpty && radii.forall(_ > 0), "radii must be positive")
    val a = pts.select(col("pid").as("i"), col("px").as("ax"), col("py").as("ay"))
    val b = pts.select(col("pid").as("j"), col("px").as("bx"), col("py").as("by"))
    val nn = a.join(b, col("i") =!= col("j"))
      .groupBy("i")
      .agg(min((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by"))).as("d2"))
    val aggCols = count(lit(1)).as("n") +: radii.map(r =>
      sum(when(col("d2") <= lit(r * r), 1L).otherwise(0L)).as(s"g$r"))
    nn.agg(aggCols.head, aggCols.tail: _*)
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
