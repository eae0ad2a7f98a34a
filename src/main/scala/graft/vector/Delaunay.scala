package graft.vector

import scala.collection.mutable

/** Delaunay triangulation — the geotrellis
  * `geotrellis.vector.triangulation.DelaunayTriangulation` surface
  * (public Bowyer-Watson algorithm) re-implemented for the TIN
  * rasterization path and the Voronoi dual.
  *
  * Exactness: input coordinates must be integral after multiplying by
  * a caller-declared `scale` (the TIN path's half-integral contract is
  * scale = 2; the Voronoi fixtures' .31/.74 offsets are scale = 100);
  * every orientation / in-circumcircle predicate is exact integer
  * arithmetic — no epsilons, no robustness heuristics, and therefore a
  * DETERMINISTIC triangulation the oracle can restate as literals (the
  * LSH planeWeights precedent). Finite-point predicates run in Long
  * while the worst in-circle term provably fits (max |coord| ≤ 14000
  * keeps 192·M⁴ < 2⁶³) and switch to exact BigInt signs past that;
  * the final orientation filter likewise widens to BigInt past the
  * 8M² Long bound (M > 10⁹). Predicates touching a super-triangle
  * vertex always run in BigInt (super coordinates are BigInt by
  * construction, see below). Bigger scales trade speed for the same
  * determinism, never correctness.
  *
  * The super-triangle is placed PROVABLY outside every finite-triple
  * circumcircle (integer coordinates bound circumradii: area ≥ 1/2 and
  * sides ≤ 2√2·M give R ≤ 12·M³), so the finite restriction of the
  * Bowyer–Watson result IS the true Delaunay triangulation — no
  * hull-adjacent deviation — which is what [[graft.vector.Voronoi
  * .cellsDual]]'s duality theorem requires.
  *
  * Degeneracies: exact duplicates are dropped; fully collinear inputs
  * return zero triangles; cocircular quadruples resolve by insertion
  * order (points sorted by (x, y) first), which is deterministic.
  */
object Delaunay {

  /** Half-integral contract (TIN / IDW / allocation point grids).
    * @param pts (x, y), half-integral
    * @return triangles as index triples into `pts`, each triple sorted
    *         ascending, the list sorted lexicographically */
  def triangulate(pts: Array[(Double, Double)]): Array[(Int, Int, Int)] = {
    require(pts.forall { case (x, y) =>
      (x * 2) == math.floor(x * 2) && (y * 2) == math.floor(y * 2) },
      "triangulate: coordinates must be half-integral so predicates are exact")
    triangulateScaled(pts, 2L)
  }

  /** General integral-at-scale contract. Coordinates must satisfy
    * |x·scale − rint(x·scale)| < 1e-6 (the rint is what triangulates,
    * so a declared scale IS the exactness contract: two inputs equal
    * at the scale produce identical triangulations). */
  def triangulateScaled(pts: Array[(Double, Double)],
                        scale: Long): Array[(Int, Int, Int)] = {
    require(scale > 0, "scale must be positive")
    def toL(v: Double, what: String): Long = {
      val s = v * scale
      val r = math.rint(s)
      require(math.abs(s - r) < 1e-6,
        s"triangulateScaled: $what = $v is not integral at scale $scale")
      r.toLong
    }
    // exact integer coords; dedupe keeping the FIRST original index
    val seen = mutable.HashMap.empty[(Long, Long), Int]
    val order = mutable.ArrayBuffer.empty[Int] // distinct original indices
    val lx = new Array[Long](pts.length)
    val ly = new Array[Long](pts.length)
    pts.iterator.zipWithIndex.foreach { case ((x, y), i) =>
      lx(i) = toL(x, "x"); ly(i) = toL(y, "y")
      val k = (lx(i), ly(i))
      if (!seen.contains(k)) { seen(k) = i; order += i }
    }
    val idx = order.toArray.sortBy(i => (lx(i), ly(i)))
    if (idx.length < 3) return Array.empty
    val px = idx.map(lx)
    val py = idx.map(ly)
    val n = idx.length
    // Super-triangle: finite but PROVABLY outside every circumcircle
    // of every non-degenerate finite triple, so the finite restriction
    // of the result is the TRUE Delaunay triangulation (the empty-
    // circumcircle property restricted to finite triangles holds
    // exactly). The bound: integer coordinates with |coord| ≤ M give
    // triangle area ≥ 1/2 and side lengths ≤ 2√2·M, hence circumradius
    // R = |ab||bc||ca| / (4·area) ≤ (2√2·M)³/2 < 12·M³, and every
    // circumcenter lies within M + R of the origin. Each super vertex
    // below sits ≥ 7D from the origin with D = 4M³ + M + 16, and
    // 7D ≥ 28M³ > 25M³ ≥ M + 2R, so dist(super, center) > R. M³
    // overflows Long past M ≈ 2·10⁶, so super coordinates are BigInt
    // and every predicate touching one runs in BigInt (an O(hull)
    // minority of the work).
    val minX = px.min; val minY = py.min
    val dataMax = math.max(
      math.max(math.abs(px.min), math.abs(px.max)),
      math.max(math.abs(py.min), math.abs(py.max))).max(1L)
    val D: BigInt = {
      val m = BigInt(dataMax)
      4 * m * m * m + m + 16
    }
    val sxB = Array(BigInt(minX) - 8 * D, BigInt(minX) + 16 * D, BigInt(minX) - 8 * D)
    val syB = Array(BigInt(minY) - 4 * D, BigInt(minY) - 4 * D, BigInt(minY) + 16 * D)
    def XB(v: Int): BigInt = if (v >= n) sxB(v - n) else BigInt(px(v))
    def YB(v: Int): BigInt = if (v >= n) syB(v - n) else BigInt(py(v))
    // Long orient is exact while 8M² < 2⁶³ (differences ≤ 2M, each
    // product ≤ 4M², their difference ≤ 8M²) — only finite triangles
    // reach it (the final filter), so M here is dataMax.
    val bigOrient = dataMax > 1000000000L
    def orientNonZero(a: Int, b: Int, c: Int): Boolean =
      if (!bigOrient)
        (px(b) - px(a)) * (py(c) - py(a)) - (py(b) - py(a)) * (px(c) - px(a)) != 0L
      else
        ((XB(b) - XB(a)) * (YB(c) - YB(a)) - (YB(b) - YB(a)) * (XB(c) - XB(a))).signum != 0
    // Long in-circle is exact while 192·M⁴ < 2⁶³ (M = max |finite
    // coord|, differences ≤ 2M, a2 ≤ 8M², one term ≤ 64M⁴, three
    // ≤ 192M⁴); past M = 14000 — or whenever a super vertex (BigInt
    // coords) participates — every sign comes from BigInt instead.
    val useBig = dataMax > 14000L
    /** > 0 iff p strictly inside the circumcircle of CCW (a,b,c). */
    def inCircleSign(a: Int, b: Int, c: Int, p: Int): Int = {
      if (useBig || a >= n || b >= n || c >= n || p >= n) {
        val Px = XB(p); val Py = YB(p)
        val Ax = XB(a) - Px; val Ay = YB(a) - Py
        val Bx = XB(b) - Px; val By = YB(b) - Py
        val Cx = XB(c) - Px; val Cy = YB(c) - Py
        val a2 = Ax * Ax + Ay * Ay
        val b2 = Bx * Bx + By * By
        val c2 = Cx * Cx + Cy * Cy
        (Ax * (By * c2 - b2 * Cy) - Ay * (Bx * c2 - b2 * Cx) + a2 * (Bx * Cy - By * Cx)).signum
      } else {
        val ax = px(a) - px(p); val ay = py(a) - py(p)
        val bx = px(b) - px(p); val by = py(b) - py(p)
        val cx = px(c) - px(p); val cy = py(c) - py(p)
        val a2 = ax * ax + ay * ay
        val b2 = bx * bx + by * by
        val c2 = cx * cx + cy * cy
        java.lang.Long.signum(
          ax * (by * c2 - b2 * cy) - ay * (bx * c2 - b2 * cx) + a2 * (bx * cy - by * cx))
      }
    }
    // triangles stored CCW
    var tris = mutable.ArrayBuffer[(Int, Int, Int)]((n, n + 1, n + 2))
    for (p <- 0 until n) {
      val inBad = tris.map { case (a, b, c) => inCircleSign(a, b, c, p) > 0 }
      val bad = tris.iterator.zip(inBad.iterator).collect { case (t, true) => t }.toSeq
      if (bad.nonEmpty) {
        // cavity boundary = edges appearing in exactly one bad triangle
        val edgeCount = mutable.HashMap.empty[(Int, Int), Int]
        def key(u: Int, v: Int) = if (u < v) (u, v) else (v, u)
        bad.foreach { case (a, b, c) =>
          Seq((a, b), (b, c), (c, a)).foreach { case (u, v) =>
            edgeCount(key(u, v)) = edgeCount.getOrElse(key(u, v), 0) + 1 }
        }
        val boundary = bad.flatMap { case (a, b, c) =>
          Seq((a, b), (b, c), (c, a)).filter { case (u, v) => edgeCount(key(u, v)) == 1 }
        }
        tris = tris.iterator.zip(inBad.iterator).collect { case (t, false) => t }
          .to(mutable.ArrayBuffer)
        boundary.foreach { case (u, v) =>
          // keep CCW: boundary edges of CCW triangles are already
          // oriented so the cavity interior (and p) lies to the left
          tris += ((u, v, p))
        }
      } else {
        // p outside every circumcircle can't happen inside the super
        // triangle unless p duplicates a vertex (deduped above)
        throw new IllegalStateException("triangulate: point in no circumcircle")
      }
    }
    tris.iterator
      .filter { case (a, b, c) => a < n && b < n && c < n }
      .filter { case (a, b, c) => orientNonZero(a, b, c) }
      .map { case (a, b, c) =>
        val s = Array(idx(a), idx(b), idx(c)).sorted
        (s(0), s(1), s(2))
      }
      .toArray.sorted
  }

  /** Delaunay NEIGHBOR lists (sorted, per original index) — the dual
    * contract [[Voronoi.cellsDual]] clips against: V(i) is exactly the
    * intersection of the bisector half-planes of i's Delaunay
    * neighbors (non-neighbor bisectors are redundant). Indices absent
    * from every triangle (collinear inputs) get empty lists. */
  def neighborsScaled(pts: Array[(Double, Double)],
                      scale: Long): Array[Array[Int]] = {
    val nbr = Array.fill(pts.length)(mutable.SortedSet.empty[Int])
    triangulateScaled(pts, scale).foreach { case (a, b, c) =>
      nbr(a) += b; nbr(a) += c
      nbr(b) += a; nbr(b) += c
      nbr(c) += a; nbr(c) += b
    }
    nbr.map(_.toArray)
  }
}
