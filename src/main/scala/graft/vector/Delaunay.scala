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
  * LSH planeWeights precedent). Predicates run in Long while the
  * worst in-circle term provably fits (max |coord| ≤ 14000 keeps
  * 192·M⁴ < 2⁶³) and switch to exact BigInt signs past that — bigger
  * scales trade speed for the same determinism, never correctness.
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
    // Super-triangle: finite, outside the hull. It can still sit
    // inside the near-infinite circumcircle of an almost-collinear
    // hull triple — in that case the result deviates from true
    // Delaunay ONLY in hull-adjacent faces, deterministically; the
    // TIN contract (a consistent piecewise-linear surface over the
    // emitted triangles, oracle sharing the same literals) holds
    // regardless.
    val minX = px.min; val maxX = px.max; val minY = py.min; val maxY = py.max
    val d = math.max(maxX - minX, maxY - minY) + 16
    val sx = Array(minX - 8 * d, minX + 16 * d, minX - 8 * d)
    val sy = Array(minY - 4 * d, minY - 4 * d, minY + 16 * d)
    def X(v: Int): Long = if (v >= n) sx(v - n) else px(v)
    def Y(v: Int): Long = if (v >= n) sy(v - n) else py(v)
    def orient(a: Int, b: Int, c: Int): Long =
      (X(b) - X(a)) * (Y(c) - Y(a)) - (Y(b) - Y(a)) * (X(c) - X(a))
    // Long in-circle is exact while 192·M⁴ < 2⁶³ (M = max |coord|,
    // differences ≤ 2M, a2 ≤ 8M², one term ≤ 64M⁴, three ≤ 192M⁴);
    // past M = 14000 every sign comes from BigInt instead.
    val maxAbs = math.max(
      math.max(math.abs(sx.min), math.abs(sx.max)),
      math.max(math.abs(sy.min), math.abs(sy.max)))
    val useBig = maxAbs > 14000L
    /** > 0 iff p strictly inside the circumcircle of CCW (a,b,c). */
    def inCircleSign(a: Int, b: Int, c: Int, p: Int): Int = {
      val ax = X(a) - X(p); val ay = Y(a) - Y(p)
      val bx = X(b) - X(p); val by = Y(b) - Y(p)
      val cx = X(c) - X(p); val cy = Y(c) - Y(p)
      if (!useBig) {
        val a2 = ax * ax + ay * ay
        val b2 = bx * bx + by * by
        val c2 = cx * cx + cy * cy
        java.lang.Long.signum(
          ax * (by * c2 - b2 * cy) - ay * (bx * c2 - b2 * cx) + a2 * (bx * cy - by * cx))
      } else {
        val Ax = BigInt(ax); val Ay = BigInt(ay)
        val Bx = BigInt(bx); val By = BigInt(by)
        val Cx = BigInt(cx); val Cy = BigInt(cy)
        val a2 = Ax * Ax + Ay * Ay
        val b2 = Bx * Bx + By * By
        val c2 = Cx * Cx + Cy * Cy
        (Ax * (By * c2 - b2 * Cy) - Ay * (Bx * c2 - b2 * Cx) + a2 * (Bx * Cy - By * Cx)).signum
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
      .filter { case (a, b, c) => orient(a, b, c) != 0 }
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
