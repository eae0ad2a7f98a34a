package graft.raster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid resampling — the cell-value side of the reference's
  * ResampleMethod (constants.py:123) used by reproject/tile_to_layout
  * (layer.py:876,900). Bilinear here; Average/Max/Min/Sum/Nearest live
  * in Pyramid.downsample.
  *
  * Verification-scale shape: the 4 corner gathers are cell-level joins
  * (exact, oracle-matching). At production scale the same gather runs
  * tile-wise: a target tile maps to a bounded source-tile rect
  * (ceil(scale)+1 tiles square), shipped with the focal-style halo
  * machinery — same math, one keyed shuffle.
  */
object Resample {

  /** Bilinear resample of a unit-grid layer (srcN x srcN cells) to
    * dstN x dstN. Output cells (x, y, v); a target cell is NoData
    * unless all 4 source corners exist. */
  def bilinearCells(layer: RasterLayer, srcN: Int, dstN: Int): DataFrame = {
    val spark = layer.spark
    val cells = layer.toCells
    val t = spark.range(dstN).select(col("id").as("i"))
      .crossJoin(spark.range(dstN).select(col("id").as("j")))
      .withColumn("sx", (col("i") + lit(0.5)) * srcN / dstN - lit(0.5))
      .withColumn("sy", (col("j") + lit(0.5)) * srcN / dstN - lit(0.5))
      .withColumn("x0", floor(col("sx")).cast("long"))
      .withColumn("y0", floor(col("sy")).cast("long"))
      .withColumn("fx", col("sx") - col("x0"))
      .withColumn("fy", col("sy") - col("y0"))
    def corner(n: String, dx: Int, dy: Int) =
      cells.select((col("x") - dx).as("x0"), (col("y") - dy).as("y0"), col("v").as(n))
    t.join(corner("va", 0, 0), Seq("x0", "y0"))
      .join(corner("vb", 1, 0), Seq("x0", "y0"))
      .join(corner("vc", 0, 1), Seq("x0", "y0"))
      .join(corner("vd", 1, 1), Seq("x0", "y0"))
      .select(col("i").as("x"), col("j").as("y"),
        (col("va") * (lit(1.0) - col("fx")) * (lit(1.0) - col("fy")) +
         col("vb") * col("fx") * (lit(1.0) - col("fy")) +
         col("vc") * (lit(1.0) - col("fx")) * col("fy") +
         col("vd") * col("fx") * col("fy")).as("v"))
  }
}
