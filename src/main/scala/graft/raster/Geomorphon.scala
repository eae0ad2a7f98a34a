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

  /** Weiss (2001) multi-scale TPI landform classes: 10 classes from
    * the SIGNS of the topographic position index at two scales (small
    * = the 3×3 ring, large = the Chebyshev-3..4 annulus, 56 cells)
    * plus the 3×3 relief range splitting plains from open slopes.
    * This is the NON-standardized variant — thresholds `t` (TPI, in z
    * units) and `relief` are raw heights, so on integral grids every
    * decision is exact integer arithmetic: tpi ≤ −t compares
    * z0·n − Σring against ±t·n with no division anywhere, restated
    * verbatim by the oracle. Full-81-window rule (the geomorphon
    * full-window discipline). ONE radius-4 halo computes both rings
    * and the relief — the fused-chain discipline, nothing per-cell
    * crosses an exchange.
    *
    * Classes: 1 canyon, 2 midslope drainage, 3 upland drainage,
    * 4 U-shaped valley, 5 plains, 6 open slope, 7 upper slope,
    * 8 local ridge, 9 midslope ridge, 10 mountain top. */
  def landforms(layer: RasterLayer, t: Long = 1L, relief: Long = 4L): RasterLayer = {
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
            var sumS = 0.0; var sumL = 0.0
            var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
            var ok = true
            var dy = -radius
            while (dy <= radius && ok) {
              var dx = -radius
              while (dx <= radius && ok) {
                val z = padded((cy + radius + dy) * w + (cx + radius + dx))
                if (z.isNaN) ok = false
                else {
                  val cheb = math.max(math.abs(dx), math.abs(dy))
                  if (cheb == 1) sumS += z
                  if (cheb >= 3) sumL += z
                  if (cheb <= 1) { if (z < mn) mn = z; if (z > mx) mx = z }
                }
                dx += 1
              }
              dy += 1
            }
            if (ok) {
              // sign of tpi vs ±t without division: z0·n − Σ vs ±t·n
              def cat(n: Long, s: Double): Int = {
                val d = z0 * n - s
                if (d <= -t * n) -1 else if (d >= t * n) 1 else 0
              }
              val cs = cat(8L, sumS)
              val cl = cat(56L, sumL)
              res = ((cs, cl) match {
                case (-1, -1) => 1 // canyon / deeply incised stream
                case (-1, 0)  => 2 // midslope drainage
                case (-1, 1)  => 3 // upland drainage / headwater
                case (0, -1)  => 4 // U-shaped valley
                case (0, 0)   => if (mx - mn <= relief) 5 else 6 // plains / open slope
                case (0, 1)   => 7 // upper slope / mesa
                case (1, -1)  => 8 // local ridge in a valley
                case (1, 0)   => 9 // midslope ridge / small hill
                case _        => 10 // mountain top / high ridge
              }).toDouble
            }
          }
          out(cy * tc + cx) = res
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  /** Cast-shadow mask — the shadow step of GRASS r.sun / r.shade: a
    * cell is shadowed (1) when terrain toward the sun rises faster
    * than the sun altitude, i.e. max_{k=1..radius} of
    * z_k − z0 − tanAlt·d_k exceeds 0 along the sun azimuth (one of
    * the 8 compass rays; d_k = k on axis rays, k·√2 on diagonals —
    * the identical IEEE product in both engines). On integral grids
    * with a rational tanAlt the axis-ray decision is exact. Full-ray
    * rule: any missing ray cell makes the cell NoData. One radius-R
    * halo, nothing per-cell crosses an exchange. */
  def castShadow(layer: RasterLayer, dirIdx: Int = 2, tanAlt: Double = 0.5,
                 radius: Int = 4): RasterLayer = {
    require(dirIdx >= 0 && dirIdx < 8, "dirIdx indexes the 8 compass rays")
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val (dx, dy) = Dirs(dirIdx)
    val diag = dx != 0 && dy != 0
    Focal.gather(layer, radius) { (padded, w) =>
      val out = new Array[Double](tc * tr)
      var cy = 0
      while (cy < tr) {
        var cx = 0
        while (cx < tc) {
          val z0 = padded((cy + radius) * w + cx + radius)
          var res = Double.NaN
          if (!z0.isNaN) {
            var sh = 0.0
            var ok = true
            var k = 1
            while (k <= radius && ok) {
              val z = padded((cy + radius + dy * k) * w + (cx + radius + dx * k))
              if (z.isNaN) ok = false
              else {
                val d = if (diag) k * math.sqrt(2.0) else k.toDouble
                if (z - z0 - tanAlt * d > 0) sh = 1.0
              }
              k += 1
            }
            if (ok) res = sh
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
