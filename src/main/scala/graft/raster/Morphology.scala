package graft.raster

/** Zone-raster morphology — the ArcGIS Generalization toolset trio
  * that geotrellis/geopyspark users reach for right after
  * RegionGroup/Sieve: Expand, Shrink, and Nibble.
  *
  * All three ride [[Focal.gather]]'s halo exchange (one shuffle, the
  * strips each tile needs from its neighbors), so the physical plan is
  * identical to the focal family: no per-cell rows, no global windows,
  * scale-safe at arbitrary layer sizes. Neighborhoods are Chebyshev
  * squares (the morphological structuring element; radius 1 == the
  * ArcGIS 8-neighbor behavior).
  */
object Morphology {

  /** ArcGIS Expand: grow the listed zone classes by `r` cells. A data
    * cell becomes `classes(i)` for the FIRST i whose class appears
    * anywhere in its (2r+1)² window (list order is zone priority,
    * matching ArcGIS's "first zone listed wins" rule); cells touching
    * no listed class, and NoData cells, pass through. */
  def expand(layer: RasterLayer, classes: Seq[Double], r: Int = 1): RasterLayer = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val cls = classes.toArray
    Focal.gather(layer, r) { (padded, w) =>
      val out = new Array[Double](tc * tr)
      var cy = 0
      while (cy < tr) {
        var cx = 0
        while (cx < tc) {
          val center = padded((cy + r) * w + (cx + r))
          out(cy * tc + cx) =
            if (center.isNaN) Double.NaN
            else {
              var best = -1 // smallest matching priority index
              var ky = -r
              while (ky <= r) {
                var kx = -r
                while (kx <= r) {
                  val v = padded((cy + ky + r) * w + (cx + kx + r))
                  if (!v.isNaN) {
                    var i = 0
                    val stop = if (best < 0) cls.length else best
                    while (i < stop) {
                      if (v == cls(i)) { best = i; i = stop } else i += 1
                    }
                  }
                  kx += 1
                }
                ky += 1
              }
              if (best >= 0) cls(best) else center
            }
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  /** ArcGIS Shrink: contract zone `cls` by `r` cells. A cell of `cls`
    * whose (2r+1)² window contains any OTHER data class is replaced by
    * the most frequent such class (ties -> smallest value, the Mode
    * rule); interior `cls` cells and all non-`cls` cells pass
    * through. */
  def shrink(layer: RasterLayer, cls: Double, r: Int = 1): RasterLayer = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    Focal.gather(layer, r) { (padded, w) =>
      val out = new Array[Double](tc * tr)
      val win = (2 * r + 1) * (2 * r + 1)
      val vals = new Array[Double](win)
      var cy = 0
      while (cy < tr) {
        var cx = 0
        while (cx < tc) {
          val center = padded((cy + r) * w + (cx + r))
          out(cy * tc + cx) =
            if (center.isNaN || center != cls) center
            else {
              var n = 0
              var ky = -r
              while (ky <= r) {
                var kx = -r
                while (kx <= r) {
                  val v = padded((cy + ky + r) * w + (cx + kx + r))
                  if (!v.isNaN && v != cls) { vals(n) = v; n += 1 }
                  kx += 1
                }
                ky += 1
              }
              if (n == 0) center
              else {
                // mode with smallest-value tie-break, O(n²) over ≤ win
                var bestV = 0.0; var bestC = 0
                var i = 0
                while (i < n) {
                  val v = vals(i); var c = 0; var j = 0
                  while (j < n) { if (vals(j) == v) c += 1; j += 1 }
                  if (c > bestC || (c == bestC && v < bestV)) { bestV = v; bestC = c }
                  i += 1
                }
                bestV
              }
            }
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  /** ArcGIS Nibble, bounded-radius form: cells matching `masked`
    * (e.g. a cloud/sentinel flag) take the value of the nearest
    * non-masked data cell within Chebyshev radius `r` — nearest by
    * squared euclidean cell distance, ties broken north-first then
    * west-first ((d², dy, dx) lexicographic, identical to the oracle's
    * ORDER BY d2, n.y, n.x). Masked cells with no donor in range, and
    * everything else, pass through. To nibble against a separate mask
    * LAYER, first stamp a sentinel via
    * `value.localBinary(mask, (v, m) => when(m === 1, SENTINEL).otherwise(v))`
    * and nibble the sentinel. */
  def nibble(layer: RasterLayer, masked: Double => Boolean, r: Int = 8): RasterLayer = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    Focal.gather(layer, r) { (padded, w) =>
      val out = new Array[Double](tc * tr)
      var cy = 0
      while (cy < tr) {
        var cx = 0
        while (cx < tc) {
          val center = padded((cy + r) * w + (cx + r))
          out(cy * tc + cx) =
            if (center.isNaN || !masked(center)) center
            else {
              var bestD = Int.MaxValue; var bestKy = 0; var bestKx = 0
              var bestV = center
              var ky = -r
              while (ky <= r) {
                var kx = -r
                while (kx <= r) {
                  val v = padded((cy + ky + r) * w + (cx + kx + r))
                  if (!v.isNaN && !masked(v)) {
                    val d = ky * ky + kx * kx
                    if (d < bestD || (d == bestD && (ky < bestKy ||
                        (ky == bestKy && kx < bestKx)))) {
                      bestD = d; bestKy = ky; bestKx = kx; bestV = v
                    }
                  }
                  kx += 1
                }
                ky += 1
              }
              bestV
            }
          cx += 1
        }
        cy += 1
      }
      out
    }
  }
}
