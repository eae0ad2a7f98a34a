package graft.core

/** Tile grid dimensions: how many tiles across the layout, and how many
  * cells across a tile.
  *
  * Mirrors the reference's `TileLayout` (geopyspark/geotrellis/__init__.py)
  * — the WHAT (a keyed grid of fixed-size tiles); physical representation
  * here is a DataFrame keyed by (col, row).
  */
final case class TileLayout(layoutCols: Int, layoutRows: Int, tileCols: Int, tileRows: Int) {
  def totalCols: Long = layoutCols.toLong * tileCols
  def totalRows: Long = layoutRows.toLong * tileRows
  def tileSize: Int   = tileCols * tileRows
}

/** Extent + tile grid: everything needed to map world coords <-> keys <->
  * cell offsets. Reference: `LayoutDefinition` in
  * geopyspark/geotrellis/__init__.py.
  *
  * Grid convention ("north-up" row-major like GeoTrellis): cell (0,0) of
  * tile key (0,0) is the top-left / (xmin, ymax) corner; world y decreases
  * as grid row increases.
  */
final case class LayoutDefinition(extent: Extent, tileLayout: TileLayout) {
  val cellWidth: Double  = extent.width / tileLayout.totalCols
  val cellHeight: Double = extent.height / tileLayout.totalRows

  /** World coords -> spatial key (tile col, tile row). */
  def mapToKey(x: Double, y: Double): (Int, Int) = {
    val c = math.floor((x - extent.xmin) / (cellWidth * tileLayout.tileCols)).toInt
    val r = math.floor((extent.ymax - y) / (cellHeight * tileLayout.tileRows)).toInt
    (c, r)
  }

  /** All keys whose tiles intersect the given extent — reference
    * key_conversion.py geom_to_key / extent_to_key. */
  def keysForExtent(e: Extent): Seq[(Int, Int)] = {
    val (c0, r1) = mapToKey(e.xmin, e.ymin)
    val (c1, r0) = mapToKey(e.xmax, e.ymax)
    def clampC(c: Int) = math.max(0, math.min(tileLayout.layoutCols - 1, c))
    def clampR(r: Int) = math.max(0, math.min(tileLayout.layoutRows - 1, r))
    for (c <- clampC(c0) to clampC(c1); r <- clampR(r0) to clampR(r1)) yield (c, r)
  }

  /** Spatial key -> extent of that tile. */
  def keyToExtent(col: Int, row: Int): Extent = {
    val w = cellWidth * tileLayout.tileCols
    val h = cellHeight * tileLayout.tileRows
    Extent(extent.xmin + col * w, extent.ymax - (row + 1) * h,
           extent.xmin + (col + 1) * w, extent.ymax - row * h)
  }
}

/** Power-of-two pyramid scheme over a world extent — the reference's
  * `ZoomedLayoutScheme` (geopyspark/geotrellis/layer.py pyramid(),
  * key_conversion.py). Zoom z has 2^z x 2^z tiles.
  */
final case class ZoomedLayoutScheme(worldExtent: Extent, tileSize: Int = 256) {
  def levelFor(zoom: Int): LayoutDefinition = {
    val n = 1 << zoom
    LayoutDefinition(worldExtent, TileLayout(n, n, tileSize, tileSize))
  }
}
