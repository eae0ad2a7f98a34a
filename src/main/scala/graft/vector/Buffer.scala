package graft.vector

/** Polygon offsetting (the shapely/JTS `buffer` every mask-building
  * workflow reaches for before `mask` — reference layer.py:2044 users
  * buffer in shapely first).
  *
  * Flat-cap / miter-join offset for SIMPLE CONVEX rings: each edge
  * translates distance |d| along its outward normal and adjacent
  * offset lines intersect (JTS join_style=mitre with no limit). For a
  * convex ring this IS the Minkowski sum with the d-ball under the
  * polygon's own edge metric — exact vertices, no arc approximation —
  * and erosion (d < 0) is the same construction inward.
  *
  * Concave strategy (documented, not implemented here): a concave
  * ring's miter offset can self-intersect; the standard plan is
  * convex decomposition (triangulate via [[Delaunay]] or ear-clip,
  * buffer each piece, rasterize the UNION — mask ops already take
  * Seq[Polygon] with union semantics), or the arc-sampled JTS
  * offset-curve construction. `buffer` therefore REJECTS concave
  * rings loudly instead of returning a self-intersecting ring.
  */
object Buffer {

  /** Miter-join offset of a convex, hole-free ring by `d` (> 0 grows,
    * < 0 shrinks; shrinking past the inradius throws). Collinear and
    * duplicate vertices are dropped first; input orientation (CW or
    * CCW) is preserved in the output. */
  def buffer(poly: Polygon, d: Double): Polygon = {
    require(poly.holes.isEmpty,
      "buffer supports simple rings; buffer holes separately (shrink by -d)")
    val ring = dropCollinear(poly.exterior)
    require(ring.length >= 3, "degenerate ring")
    val n = ring.length
    // orientation from the shoelace sum: > 0 = CCW in y-up coords
    var area2 = 0.0
    var i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      area2 += a.x * b.y - b.x * a.y
      i += 1
    }
    val sgn = if (area2 > 0) 1.0 else -1.0
    // convexity: every turn has the orientation's sign (collinear gone)
    i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n); val c = ring((i + 2) % n)
      val cross = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
      require(cross * sgn > 0,
        s"buffer requires a convex ring (concave turn at ${b}); " +
          "convex-decompose and buffer the pieces (see scaladoc)")
      i += 1
    }
    // offset each edge along its outward normal, intersect neighbors
    def edge(i: Int): (Pt, Pt) = (ring(i), ring((i + 1) % n))
    def offsetLine(i: Int): (Double, Double, Double, Double) = {
      val (a, b) = edge(i)
      val ex = b.x - a.x; val ey = b.y - a.y
      val len = math.hypot(ex, ey)
      // CCW (y-up) outward normal of (ex, ey) is (ey, -ex)/len; CW flips
      val nx = sgn * ey / len; val ny = -sgn * ex / len
      (a.x + nx * d, a.y + ny * d, ex, ey)
    }
    val out = (0 until n).map { i =>
      // vertex i joins edge i-1 and edge i
      val (x1, y1, dx1, dy1) = offsetLine((i + n - 1) % n)
      val (x2, y2, dx2, dy2) = offsetLine(i)
      val det = dx1 * dy2 - dy1 * dx2
      if (math.abs(det) < 1e-12 * (math.abs(dx1) + math.abs(dy1)) *
            (math.abs(dx2) + math.abs(dy2)))
        Pt(x2, y2) // parallel neighbors (shouldn't survive dropCollinear)
      else {
        val t = ((x2 - x1) * dy2 - (y2 - y1) * dx2) / det
        Pt(x1 + t * dx1, y1 + t * dy1)
      }
    }
    // erosion past the inradius flips edges over their neighbors (the
    // result can even look like a smaller VALID ring — a plain
    // area-sign test misses it): every output edge must preserve its
    // input edge's direction
    i = 0
    while (i < n) {
      val (a, b) = edge(i)
      val oa = out(i); val ob = out((i + 1) % n)
      require((ob.x - oa.x) * (b.x - a.x) + (ob.y - oa.y) * (b.y - a.y) > 0,
        s"erosion by ${-d} collapses the ring (inradius exceeded)")
      i += 1
    }
    Polygon(out)
  }

  private def dropCollinear(ring: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    val dedup = ring.foldLeft(Vector.empty[Pt]) { (acc, p) =>
      if (acc.nonEmpty && acc.last == p) acc else acc :+ p
    }
    val base = if (dedup.length > 1 && dedup.head == dedup.last) dedup.dropRight(1) else dedup
    val n = base.length
    if (n < 3) return base
    (0 until n).collect {
      case i if {
        val a = base((i + n - 1) % n); val b = base(i); val c = base((i + 1) % n)
        math.abs((b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)) > 1e-12
      } => base(i)
    }
  }
}
