package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * Scale shape (r13, the §4 "no per-cell rows in the physical path"
  * discipline): a radius-1 [[Focal.gatherPartials]] halo — each tile
  * scans the 2×2 blocks ANCHORED at its own cells (blocks crossing the
  * tile seam read the halo strip; the anchor's owning tile counts each
  * block exactly once; NaN padding past the grid edge drops edge
  * blocks) and emits one (level, n_segments, n_blocks) partial row per
  * level. Per-cell rows never cross an exchange — only border strips
  * and |levels| partials per tile do. The previous shape (a lead()
  * window keyed by grid row + a row-pair self-join) pushed every cell
  * through two keyed exchanges and made each grid line a single-task
  * window scan at 10^6-cell widths. Levels are a bounded (≤1024)
  * driver-side array; output is |levels| rows of exact integer counts.
  */
object Contour {

  /** Per-level marching-squares summary: (level, n_segments, n_blocks)
    * where n_blocks counts blocks the level crosses (case not 0/15). */
  def segmentCounts(layer: RasterLayer, levels: Seq[Double]): DataFrame = {
    require(levels.nonEmpty && levels.size <= 1024, "1..1024 levels")
    val spark = layer.df.sparkSession
    import spark.implicits._
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val lvl = levels.toArray
    Focal.gatherPartials[(Double, Long, Long)](layer, 1) { (_, _, padded, w) =>
      val segs = new Array[Long](lvl.length)
      val blocks = new Array[Long](lvl.length)
      var j = 0
      while (j < tr) {
        var i = 0
        while (i < tc) {
          val v00 = padded((j + 1) * w + (i + 1))
          val v10 = padded((j + 1) * w + (i + 2))
          val v01 = padded((j + 2) * w + (i + 1))
          val v11 = padded((j + 2) * w + (i + 2))
          if (!v00.isNaN && !v10.isNaN && !v01.isNaN && !v11.isNaN) {
            var li = 0
            while (li < lvl.length) {
              val level = lvl(li)
              val c = (if (v00 >= level) 1 else 0) + (if (v10 >= level) 2 else 0) +
                      (if (v01 >= level) 4 else 0) + (if (v11 >= level) 8 else 0)
              if (c != 0 && c != 15) {
                blocks(li) += 1
                segs(li) += (if (c == 6 || c == 9) 2L else 1L)
              }
              li += 1
            }
          }
          i += 1
        }
        j += 1
      }
      lvl.indices.iterator.map(li => (lvl(li), segs(li), blocks(li)))
    }.toDF("level", "sc", "bc")
      .groupBy("level")
      .agg(sum("sc").cast("long").as("n_segments"),
        sum("bc").cast("long").as("n_blocks"))
  }
}
