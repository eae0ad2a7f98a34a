package graft.raster

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.LayoutDefinition
import graft.vector.Polygon

/** Geometry burning — reference rasterize.py rasterize (:13) /
  * rasterize_features (:86): polygons (each with a burn value) become
  * a tiled layer; overlaps resolve by the CellOp (reference uses
  * zindex priority — Max here, deterministic).
  *
  * Shape: the cell space is generated distributed over each geometry's
  * bbox (spark.range cross), geometries broadcast in the closure, the
  * contains test is a partition-local filter and the tiling is the
  * usual one-shuffle TileBuildAgg. Value-aggregation rasterize of an
  * existing table is `RasterLayer.fromCells` directly.
  */
object Rasterize {

  def features(spark: SparkSession, geoms: Seq[(Polygon, Double)],
               layout: LayoutDefinition, op: CellOp = CellOp.Max): RasterLayer = {
    import spark.implicits._
    val cellDfs = geoms.map { case (poly, value) =>
      val (bxmin, bymin, bxmax, bymax) = poly.bbox
      val x0 = math.max(0L, math.floor(bxmin).toLong)
      val x1 = math.min(layout.tileLayout.totalCols, math.ceil(bxmax).toLong)
      val y0 = math.max(0L, math.floor(bymin).toLong)
      val y1 = math.min(layout.tileLayout.totalRows, math.ceil(bymax).toLong)
      spark.range(x0, x1).select(col("id").as("x"))
        .crossJoin(spark.range(y0, y1).select(col("id").as("y")))
        .as[(Long, Long)]
        .filter { case (x, y) => poly.contains(x + 0.5, y + 0.5) }
        .map { case (x, y) => (x, y, value) }
        .toDF("x", "y", "v")
    }
    RasterLayer.fromCells(cellDfs.reduce(_ unionByName _), layout, op)
  }

  /** Data-driven rasterize: a table of WKT features `(wkt STRING,
    * v DOUBLE)` burns to a layer. Geometries parse IN THE EXECUTORS
    * (one row at a time — the 100 TB shape: feature count scales out,
    * each feature's cell scan is bounded by its bbox), cells flow
    * straight into the usual one-shuffle TileBuildAgg. Overlaps
    * resolve by `op` (Max default, like the reference's zindex
    * priority in rasterize.py:86 rasterize_features). */
  def fromWktTable(features: org.apache.spark.sql.DataFrame,
                   layout: LayoutDefinition, op: CellOp = CellOp.Max): RasterLayer = {
    val spark = features.sparkSession
    import spark.implicits._
    val totC = layout.tileLayout.totalCols
    val totR = layout.tileLayout.totalRows
    val cells = features
      .select(col("wkt").cast("string"), col("v").cast("double"))
      // null wkt/v rows carry no geometry to burn — drop them here
      // rather than NPE inside the executor-side parser
      .where(col("wkt").isNotNull && col("v").isNotNull)
      .as[(String, Double)]
      .flatMap { case (wkt, value) =>
        graft.vector.Wkt.parsePolygons(wkt).iterator.flatMap { poly =>
          val (bxmin, bymin, bxmax, bymax) = poly.bbox
          val x0 = math.max(0L, math.floor(bxmin).toLong)
          val x1 = math.min(totC, math.ceil(bxmax).toLong)
          val y0 = math.max(0L, math.floor(bymin).toLong)
          val y1 = math.min(totR, math.ceil(bymax).toLong)
          for {
            x <- (x0 until x1).iterator
            y <- (y0 until y1).iterator
            if poly.contains(x + 0.5, y + 0.5)
          } yield (x, y, value)
        }
      }
      .toDF("x", "y", "v")
    RasterLayer.fromCells(cells, layout, op)
  }
}
