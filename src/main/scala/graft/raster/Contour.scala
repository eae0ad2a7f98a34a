package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Contour extraction by marching squares (the standard iso-line
  * algorithm; geotrellis exposes the vector form via its vectorizer —
  * this is the per-level summary shape): every complete 2×2 cell
  * block gets a 4-bit case from its corners' level tests (v00=1,
  * v10=2, v01=4, v11=8), and the case maps to 0, 1 or 2 iso-line
  * segments — the diagonal saddles under this bit layout are cases 6
  * and 9 (opposite corners set) and carry two segments; the ambiguity
  * resolution is the fixed "always split" rule, stated identically in
  * the oracle.
  * Blocks touching a NoData cell or the grid edge emit nothing —
  * marching squares needs all four corners.
  *
  * Scale shape: one lead() window keyed by grid row pairs each cell
  * with its right neighbor (gap check drops NoData holes), then ONE
  * equi-join on (x, y+1) stacks a row-pair onto the pair below it —
  * per-cell rows cross exactly two keyed exchanges, no self-join
  * explosion, no unpartitioned window. Levels are a bounded literal
  * array exploded per block; the output is |levels| rows of exact
  * integer counts.
  */
object Contour {

  /** Per-level marching-squares summary: (level, n_segments, n_blocks)
    * where n_blocks counts blocks the level crosses (case not 0/15). */
  def segmentCounts(layer: RasterLayer, levels: Seq[Double]): DataFrame = {
    require(levels.nonEmpty && levels.size <= 1024, "1..1024 levels")
    val wx = Window.partitionBy("y").orderBy("x")
    val pairs = layer.toCells
      .withColumn("vr", lead("v", 1).over(wx))
      .withColumn("xr", lead("x", 1).over(wx))
      .where(col("xr") === col("x") + 1)
      .select(col("x"), col("y"), col("v"), col("vr"))
      .localCheckpoint() // both sides of the self-join read it once
    val blocks = pairs.as("t").join(pairs.as("b"),
        col("t.x") === col("b.x") && col("t.y") + 1 === col("b.y"))
      .select(col("t.v").as("v00"), col("t.vr").as("v10"),
        col("b.v").as("v01"), col("b.vr").as("v11"))
    def bit(v: String, w: Int) =
      when(col(v) >= col("level"), w).otherwise(0)
    blocks
      .select(col("v00"), col("v10"), col("v01"), col("v11"),
        explode(lit(levels.toArray)).as("level"))
      .select(col("level"),
        (bit("v00", 1) + bit("v10", 2) + bit("v01", 4) + bit("v11", 8)).as("c"))
      .groupBy("level")
      .agg(
        sum(when(col("c") === 0 || col("c") === 15, 0)
          .when(col("c") === 6 || col("c") === 9, 2)
          .otherwise(1)).cast("long").as("n_segments"),
        sum(when(col("c") === 0 || col("c") === 15, 0).otherwise(1))
          .cast("long").as("n_blocks"))
  }
}
