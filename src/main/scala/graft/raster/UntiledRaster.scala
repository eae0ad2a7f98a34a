package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Extent, LayoutDefinition}

/** Untiled rasters — the reference's `RasterLayer`
  * (geopyspark/geotrellis/layer.py:396): a bag of arbitrarily-placed
  * scenes (extent + cell grid each), the form data has right after
  * reading, BEFORE tile_to_layout. Physical model: one row per scene,
  * `(scene_id LONG, xmin/ymin/xmax/ymax DOUBLE, cols INT, rows INT,
  * cells ARRAY<DOUBLE>)`.
  *
  * collect_metadata (layer.py:858) = min/max-combine of scene extents;
  * tile_to_layout (layer.py:900) = explode scenes to cells once,
  * then the one-shuffle TileBuildAgg path. Scenes overlapping a tile
  * boundary land in the right tiles automatically; overlapping scenes
  * combine by the CellOp (reference resolves by merge).
  */
final class UntiledRaster(val df: DataFrame) {

  /** Combined extent + cell size of all scenes (collect_metadata). */
  def collectMetadata(): (Extent, Double, Double) = {
    val r = df.select(
      min("xmin"), min("ymin"), max("xmax"), max("ymax"),
      max((col("xmax") - col("xmin")) / col("cols")),
      max((col("ymax") - col("ymin")) / col("rows"))).head()
    (Extent(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)),
      r.getDouble(4), r.getDouble(5))
  }

  /** World-anchored cells of every scene: (wx, wy[, instant], v) cell
    * centers. Scenes carrying an `instant` column (temporal ingest —
    * [[GeoTiff.fromGeoTiffTemporal]]) keep it per cell. */
  def toWorldCells: DataFrame = {
    val temporal = df.columns.contains("instant")
    val keep = if (temporal) Seq(col("instant")) else Nil
    df.select(Seq(col("xmin"), col("ymax"), col("cols"), col("rows"),
        ((col("xmax") - col("xmin")) / col("cols")).as("cw"),
        ((col("ymax") - col("ymin")) / col("rows")).as("ch"),
        posexplode(col("cells")).as(Seq("off", "v"))) ++ keep: _*)
      .where(!isnan(col("v")))
      .select(Seq(
        (col("xmin") + (col("off") % col("cols") + 0.5) * col("cw")).as("wx"),
        (col("ymax") - (floor(col("off") / col("cols")) + 0.5) * col("ch")).as("wy")) ++
        keep :+ col("v"): _*)
  }

  /** Cut scenes into a target layout (tile_to_layout): scene cells ->
    * grid coords -> TileBuildAgg, one shuffle. */
  def tileToLayout(layout: LayoutDefinition, op: CellOp = CellOp.Max): RasterLayer = {
    val e = layout.extent
    val cells = toWorldCells.select(
      floor((col("wx") - lit(e.xmin)) / layout.cellWidth).cast("long").as("x"),
      floor((lit(e.ymax) - col("wy")) / layout.cellHeight).cast("long").as("y"),
      col("v"))
      .where(col("x") >= 0 && col("x") < layout.tileLayout.totalCols &&
             col("y") >= 0 && col("y") < layout.tileLayout.totalRows)
    RasterLayer.fromCells(cells, layout, op)
  }

  /** Temporal tile_to_layout (reference layer_type=SPACETIME): scenes
    * carry an `instant` column (tag-306 acquisition time); cells key
    * by (col, row, instant) so each acquisition stays its own frame.
    * Same one-shuffle TileBuildAgg path as the spatial cut. */
  def tileToLayoutTemporal(layout: LayoutDefinition, op: CellOp = CellOp.Max): RasterLayer = {
    require(df.columns.contains("instant"),
      "tileToLayoutTemporal needs an instant column (GeoTiff.fromGeoTiffTemporal)")
    val e = layout.extent
    val cells = toWorldCells.select(
      floor((col("wx") - lit(e.xmin)) / layout.cellWidth).cast("long").as("x"),
      floor((lit(e.ymax) - col("wy")) / layout.cellHeight).cast("long").as("y"),
      col("instant"), col("v"))
      .where(col("x") >= 0 && col("x") < layout.tileLayout.totalCols &&
             col("y") >= 0 && col("y") < layout.tileLayout.totalRows)
    RasterLayer.fromCellsTemporal(cells, layout, op)
  }
}

object UntiledRaster {
  /** Build from scene rows (id, extent corners, dims, cells). */
  def apply(df: DataFrame): UntiledRaster = new UntiledRaster(df)
}
