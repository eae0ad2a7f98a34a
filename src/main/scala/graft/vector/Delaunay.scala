package graft.vector

import scala.collection.mutable

/** Delaunay triangulation — the geotrellis
  * `geotrellis.vector.triangulation.DelaunayTriangulation` surface
  * (public Bowyer-Watson algorithm) re-implemented for the TIN
  * rasterization path.
  *
  * Exactness: input coordinates must be half-integral (k + 0.5, the
  * engine's point contract shared with IDW/allocation); they are
  * doubled to integers and every orientation / in-circumcircle
  * predicate is exact Long arithmetic — no epsilons, no robustness
  * heuristics, and therefore a DETERMINISTIC triangulation the oracle
  * can restate as literals (the LSH planeWeights precedent).
  * Magnitudes: doubled grid coords and the super-triangle stay under
  * 2^13, so the worst in-circle term (c * c * c^2-sum) is below 2^52.
  *
  * Degeneracies: exact duplicates are dropped; fully collinear inputs
  * return zero triangles; cocircular quadruples resolve by insertion
  * order (points sorted by (x, y) first), which is deterministic.
  */
object Delaunay {

  /** @param pts (x, y), half-integral
    * @return triangles as index triples into `pts`, each triple sorted
    *         ascending, the list sorted lexicographically */
  def triangulate(pts: Array[(Double, Double)]): Array[(Int, Int, Int)] = {
    require(pts.forall { case (x, y) =>
      (x * 2) == math.floor(x * 2) && (y * 2) == math.floor(y * 2) },
      "triangulate: coordinates must be half-integral so predicates are exact")
    // doubled exact coords; dedupe keeping the FIRST original index
    val seen = mutable.HashMap.empty[(Long, Long), Int]
    val order = mutable.ArrayBuffer.empty[Int] // distinct original indices
    pts.iterator.zipWithIndex.foreach { case ((x, y), i) =>
      val k = ((x * 2).toLong, (y * 2).toLong)
      if (!seen.contains(k)) { seen(k) = i; order += i }
    }
    val idx = order.toArray.sortBy(i => ((pts(i)._1 * 2).toLong, (pts(i)._2 * 2).toLong))
    if (idx.length < 3) return Array.empty
    val px = idx.map(i => (pts(i)._1 * 2).toLong)
    val py = idx.map(i => (pts(i)._2 * 2).toLong)
    val n = idx.length
    // Super-triangle: as large as exact Long in-circle arithmetic
    // allows (|coord| < 2^15 keeps the worst term under 2^62). A
    // finite super-triangle can still sit inside the near-infinite
    // circumcircle of an almost-collinear hull triple — in that case
    // the result deviates from true Delaunay ONLY in hull-adjacent
    // faces, deterministically; the TIN contract (a consistent
    // piecewise-linear surface over the emitted triangles, oracle
    // sharing the same literals) holds regardless.
    val minX = px.min; val maxX = px.max; val minY = py.min; val maxY = py.max
    val d = math.max(maxX - minX, maxY - minY) + 16
    val sx = Array(minX - 8 * d, minX + 16 * d, minX - 8 * d)
    val sy = Array(minY - 4 * d, minY - 4 * d, minY + 16 * d)
    def X(v: Int): Long = if (v >= n) sx(v - n) else px(v)
    def Y(v: Int): Long = if (v >= n) sy(v - n) else py(v)
    def orient(a: Int, b: Int, c: Int): Long =
      (X(b) - X(a)) * (Y(c) - Y(a)) - (Y(b) - Y(a)) * (X(c) - X(a))
    /** > 0 iff p strictly inside the circumcircle of CCW (a,b,c). */
    def inCircle(a: Int, b: Int, c: Int, p: Int): Long = {
      val ax = X(a) - X(p); val ay = Y(a) - Y(p)
      val bx = X(b) - X(p); val by = Y(b) - Y(p)
      val cx = X(c) - X(p); val cy = Y(c) - Y(p)
      val a2 = ax * ax + ay * ay
      val b2 = bx * bx + by * by
      val c2 = cx * cx + cy * cy
      ax * (by * c2 - b2 * cy) - ay * (bx * c2 - b2 * cx) + a2 * (bx * cy - by * cx)
    }
    // triangles stored CCW
    var tris = mutable.ArrayBuffer[(Int, Int, Int)]((n, n + 1, n + 2))
    for (p <- 0 until n) {
      val bad = tris.filter { case (a, b, c) => inCircle(a, b, c, p) > 0 }
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
        tris = tris.filterNot { case (a, b, c) => inCircle(a, b, c, p) > 0 }
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
}
