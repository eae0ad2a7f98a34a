package graft.raster

/** Geomorphon landform classification (Jasiewicz & Stepinski 2013;
  * GRASS r.geomorphon): per cell, look along the 8 compass rays up to
  * `radius` steps, reduce each ray to a ternary "terrain rises above /
  * falls below / flat within the cone" symbol, and map the (hi, lo)
  * symbol counts through the 10-landform lookup table.
  *
  * Documented conventions (on integral-valued grids — the oracle's
  * case — every quantity below is an exact integer carried in a
  * double, so the DuckDB oracle can restate it verbatim):
  *  - ray distance is CHEBYSHEV (cell steps along the ray), so the
  *    per-step slope of step k is (z_k - z0)/k — a rational with
  *    denominator k <= 4; multiplying by 12/k (integer for k = 1..4)
  *    makes every comparison exact on integral grids, no trigonometry
  *    anywhere (the zenith/nadir ANGLE comparison of the paper is
  *    monotone in the tangent, so comparing tangents is the same
  *    decision). The comparison itself is done in DOUBLES — identical
  *    bit-for-bit to integer arithmetic when cells are integral
  *    (integral-double × int products are exact), and free of the
  *    1/12-tangent zero-ward quantization a `.toLong` would impose on
  *    non-integral float DEMs;
  *  - the flatness threshold is t12/12 height units per step
  *    (default t12 = 12, i.e. 45 deg on a unit grid);
  *  - per ray: up12 = max_k 12·(z_k - z0)/k, dn12 = max_k 12·(z0 - z_k)/k;
  *    the ray is `hi` when up12 > t12 and up12 > dn12, `lo` when
  *    dn12 > t12 and dn12 > up12, neutral otherwise (exact ties ->
  *    neutral);
  *  - the FULL 32-sample window is required: any missing ray cell
  *    (NoData or grid edge) makes the cell NoData — the focal
  *    full-window rule, mirrored by the oracle's count(*) = 32.
  *
  * Scale shape: ONE multi-ring halo exchange ([[Focal.gather]],
  * radius 4) and a per-tile kernel — identical cost class to any
  * radius-4 focal op; nothing grows with grid size beyond the scan.
  */
object Geomorphon {

  /** Landform codes (the 10 geomorphons). */
  val Flat = 1; val Peak = 2; val Ridge = 3; val Shoulder = 4; val Spur = 5
  val Slope = 6; val Hollow = 7; val Footslope = 8; val Valley = 9; val Pit = 10

  val FormNames: Map[Int, String] = Map(
    Flat -> "flat", Peak -> "peak", Ridge -> "ridge", Shoulder -> "shoulder",
    Spur -> "spur", Slope -> "slope", Hollow -> "hollow",
    Footslope -> "footslope", Valley -> "valley", Pit -> "pit")

  /** (hi, lo) -> form: hi = rays where terrain rises above the cone,
    * lo = rays where it falls below (the paper's Table 1 with that
    * orientation: all-below = peak, all-above = pit). Complete over
    * hi + lo <= 8. */
  val Lut: Map[(Int, Int), Int] = Map(
    (0, 0) -> Flat, (0, 1) -> Flat, (0, 2) -> Flat, (0, 3) -> Shoulder,
    (0, 4) -> Shoulder, (0, 5) -> Ridge, (0, 6) -> Ridge, (0, 7) -> Ridge,
    (0, 8) -> Peak,
    (1, 0) -> Flat, (1, 1) -> Flat, (1, 2) -> Shoulder, (1, 3) -> Shoulder,
    (1, 4) -> Shoulder, (1, 5) -> Ridge, (1, 6) -> Ridge, (1, 7) -> Ridge,
    (2, 0) -> Flat, (2, 1) -> Footslope, (2, 2) -> Slope, (2, 3) -> Slope,
    (2, 4) -> Spur, (2, 5) -> Spur, (2, 6) -> Ridge,
    (3, 0) -> Footslope, (3, 1) -> Footslope, (3, 2) -> Slope, (3, 3) -> Slope,
    (3, 4) -> Slope, (3, 5) -> Spur,
    (4, 0) -> Footslope, (4, 1) -> Footslope, (4, 2) -> Slope, (4, 3) -> Slope,
    (4, 4) -> Slope,
    (5, 0) -> Valley, (5, 1) -> Valley, (5, 2) -> Hollow, (5, 3) -> Hollow,
    (6, 0) -> Valley, (6, 1) -> Valley, (6, 2) -> Valley,
    (7, 0) -> Valley, (7, 1) -> Valley,
    (8, 0) -> Pit)

  /** The LUT as a SQL VALUES list — ONE source of truth for engine and
    * oracle. */
  def lutValuesSql: String =
    Lut.toSeq.sortBy(_._1).map { case ((h, l), f) => s"($h, $l, $f)" }.mkString(", ")

  private[raster] val Dirs = Array((0, -1), (1, -1), (1, 0), (1, 1),
    (0, 1), (-1, 1), (-1, 0), (-1, -1))

  /** Topographic openness (Yokoyama, Shirasawa & Pike 2002): the mean
    * over the 8 compass rays of the zenith (positive) or nadir
    * (negative) angle 90° − atan(max slope along the ray), degrees.
    * Positive openness highlights convexity (ridges bright), negative
    * concavity — the standard DEM visualization/feature pair.
    *
    * Shares geomorphon's ray reduction: max slope is the max12/12
    * tangent (Chebyshev steps, radius 4, full-32-sample rule; exact on
    * integral grids, un-quantized doubles on float DEMs),
    * and the only floating math is one atan per ray plus a PINNED
    * 8-term left-associated sum — restated identically in the oracle,
    * so the round(,5) closing sits ~1e9 ulps from any boundary.
    *
    * One halo exchange per sign (the gather kernel emits one value per
    * cell; a production single-pass variant would emit a struct tile). */
  def openness(layer: RasterLayer, positive: Boolean): RasterLayer = {
    val radius = 4
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    Focal.gather(layer, radius) { (padded, w) =>
      val out = new Array[Double](tc * tr)
      var cy = 0
      while (cy < tr) {
        var cx = 0
        while (cx < tc) {
          val z0 = padded((cy + radius) * w + cx + radius)
          var res = Double.NaN
          if (!z0.isNaN) {
            var sum = 0.0
            var ok = true
            var di = 0
            while (di < 8 && ok) {
              val dx = Dirs(di)._1; val dy = Dirs(di)._2
              var m12 = Double.NegativeInfinity
              var k = 1
              while (k <= radius && ok) {
                val z = padded((cy + radius + dy * k) * w + (cx + radius + dx * k))
                if (z.isNaN) ok = false
                else {
                  val d12 = (if (positive) z - z0 else z0 - z) * (12 / k)
                  if (d12 > m12) m12 = d12
                }
                k += 1
              }
              // pinned order: the += chain IS the left-assoc 8-term sum
              if (ok) sum += 90.0 - math.toDegrees(math.atan(m12 / 12.0))
              di += 1
            }
            if (ok) res = sum / 8.0
          }
          out(cy * tc + cx) = res
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  def apply(layer: RasterLayer, t12: Long = 12): RasterLayer = {
    val radius = 4 // the 12/k LCM trick is derived for k = 1..4
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    Focal.gather(layer, radius) { (padded, w) =>
      val out = new Array[Double](tc * tr)
      var cy = 0
      while (cy < tr) {
        var cx = 0
        while (cx < tc) {
          val z0 = padded((cy + radius) * w + cx + radius)
          var res = Double.NaN
          if (!z0.isNaN) {
            var hi = 0; var lo = 0; var ok = true
            var di = 0
            while (di < 8 && ok) {
              val dx = Dirs(di)._1; val dy = Dirs(di)._2
              var up = Double.NegativeInfinity; var dn = Double.NegativeInfinity
              var k = 1
              while (k <= radius && ok) {
                val z = padded((cy + radius + dy * k) * w + (cx + radius + dx * k))
                if (z.isNaN) ok = false
                else {
                  val d12 = (z - z0) * (12 / k)
                  if (d12 > up) up = d12
                  if (-d12 > dn) dn = -d12
                }
                k += 1
              }
              if (ok) {
                if (up > t12 && up > dn) hi += 1
                else if (dn > t12 && dn > up) lo += 1
              }
              di += 1
            }
            if (ok) res = Lut((hi, lo)).toDouble
          }
          out(cy * tc + cx) = res
          cx += 1
        }
        cy += 1
      }
      out
    }
  }
}
