package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gray-level co-occurrence texture (Haralick, Shanmugam & Dinstein
  * 1973 — the classic remote-sensing texture family; GDAL exposes it
  * as gdal_texture, ArcGIS via Focal Statistics plugins).
  *
  * The GLCM here is SYMMETRIC and pooled over the four standard
  * offsets {(1,0),(0,1),(1,1),(1,−1)}: counting each offset in both
  * directions makes the pooled matrix exactly "all ordered pairs of
  * queen-adjacent cells", which one 8-offset shift + one co-keyed
  * equi-join produces without any range join.
  *
  * Determinism: levels are an integer modulus of the integral cell
  * value; every matrix entry and every summary numerator is an exact
  * integer. The one non-integral statistic (homogeneity
  * Σ c/(1+(i−j)²)) is micro-quantized PER TERM before its sum (the
  * bm25 pattern), so the total is an order-free integer.
  *
  * Scale: the shifted-copy union is a projection (no shuffle); the
  * pair join hashes on (x, y) — co-partitioned with the cell grid —
  * and the matrix aggregate is map-side combined down to ≤ levels²
  * rows. Nothing holds per-cell state after the join.
  */
object Texture {
  /** Pooled symmetric GLCM: (gi, gj, cnt) over ordered queen-adjacent
    * cell pairs, g = value mod `levels`. */
  def glcm(l: RasterLayer, levels: Int = 16): DataFrame = {
    // r20: pin — the center side and all 8 shifted neighbor branches
    // consume the same cells; unpinned, each branch re-ran the whole
    // layer build (TileBuildAgg instances defeat ReuseExchange)
    val cells = l.toCells.select(col("x"), col("y"),
      pmod(col("v").cast("long"), lit(levels.toLong)).as("g"))
      .localCheckpoint()
    val offs = Seq((1, 0), (0, 1), (1, 1), (1, -1),
      (-1, 0), (0, -1), (-1, -1), (-1, 1))
    val nbrs = offs.map { case (dx, dy) =>
      cells.select((col("x") + dx).as("x"), (col("y") + dy).as("y"),
        col("g").as("gj"))
    }.reduce(_ unionAll _)
    cells.join(nbrs, Seq("x", "y"))
      .groupBy(col("g").as("gi"), col("gj"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Box-counting occupancy series (the raw data of the box-counting
    * fractal dimension, Mandelbrot 1982): a cell is occupied when its
    * integral value is odd; n_boxes(s) = #distinct s×s boxes holding
    * an occupied cell. The log-log slope fit is left to the caller —
    * the series itself is exact integers. One explode-by-scale + one
    * two-column distinct aggregate (map-side combined). */
  def boxCounts(l: RasterLayer, scales: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame =
    l.toCells.where(pmod(col("v").cast("long"), lit(2L)) === 1)
      .select(explode(typedLit(scales)).as("scale"), col("x"), col("y"))
      .groupBy("scale")
      .agg(countDistinct(floor(col("x") / col("scale")).cast("long"),
        floor(col("y") / col("scale")).cast("long")).as("n_boxes"))

  /** Haralick summary over the pooled matrix, one row:
    * contrast_num = Σ c·(i−j)², dissim_num = Σ c·|i−j|,
    * asm_num = Σ c² (energy numerator; ASM = asm_num/n_pairs²),
    * n_pairs = Σ c, homogeneity_u = Σ round(c·10⁶/(1+(i−j)²)). */
  def glcmStats(l: RasterLayer, levels: Int = 16): DataFrame = {
    val d = col("gi") - col("gj")
    glcm(l, levels).agg(
      sum(col("cnt") * d * d).as("contrast_num"),
      sum(col("cnt") * abs(d)).as("dissim_num"),
      sum(col("cnt") * col("cnt")).as("asm_num"),
      sum(col("cnt")).as("n_pairs"),
      sum(round((col("cnt") * lit(1000000L)).cast("double") /
        (lit(1L) + d * d).cast("double")).cast("long")).as("homogeneity_u"))
  }
}
