package graft.vector

/** Voronoi diagrams — the geotrellis
  * `geotrellis.vector.voronoi.VoronoiDiagram` surface (the dual the
  * repo's Delaunay/TIN path was missing): per site, the convex cell of
  * points nearer to it than to any other site, clipped to a bounding
  * extent.
  *
  * Construction: cell(i) = extent rectangle ∩ (∩_{j≠i} bisector
  * half-plane closer to i) — one Sutherland–Hodgman pass per bisector.
  * Clipping against ALL other sites is the definition itself (exact,
  * no neighbor-list dependence, no coordinate contract); restricting
  * to Delaunay neighbors is the classic optimization for big site
  * sets and drops in where the half-integral Delaunay contract holds.
  * Unbounded hull cells are bounded by the extent clip.
  *
  * Scale shape: sites are the DIM side (model-constant, like
  * kriging's variogram fit and the TIN triangulation) — this runs
  * driver-side under a loud [[MaxSites]] guard; the GRID side stays
  * distributed (cells feed Rasterize.features / mask / spatial joins).
  */
object Voronoi {

  /** Driver-side guard: all-pairs clipping is n² in sites. */
  val MaxSites = 4096

  /** Voronoi cells clipped to [xmin,xmax]×[ymin,ymax].
    * @param sites distinct points (duplicate sites rejected)
    * @return (index into `sites`, convex cell polygon); sites whose
    *         cell misses the extent entirely are dropped. */
  def cells(sites: IndexedSeq[Pt], xmin: Double, ymin: Double,
            xmax: Double, ymax: Double): Seq[(Int, Polygon)] = {
    require(sites.nonEmpty, "no sites")
    require(sites.length <= MaxSites,
      s"${sites.length} sites exceed MaxSites=$MaxSites — Voronoi sites are " +
        "the dim side (use the Delaunay-neighbor variant for bigger sets)")
    require(sites.distinct.length == sites.length, "duplicate sites")
    require(xmin < xmax && ymin < ymax, "degenerate extent")
    val box = IndexedSeq(Pt(xmin, ymin), Pt(xmax, ymin), Pt(xmax, ymax), Pt(xmin, ymax))
    sites.indices.flatMap { i =>
      var ring = box
      var j = 0
      while (j < sites.length && ring.length >= 3) {
        if (j != i) ring = clipBisector(ring, sites(i), sites(j))
        j += 1
      }
      if (ring.length >= 3) Some(i -> Polygon(ring)) else None
    }
  }

  /** One Sutherland–Hodgman pass keeping the side of the perpendicular
    * bisector of (a, b) closer to `a`: points p with
    * (p − m)·(b − a) ≤ 0, m the midpoint (boundary kept — cells are
    * closed; the fixtures' margin audit keeps decisions off it). */
  private def clipBisector(ring: IndexedSeq[Pt], a: Pt, b: Pt): IndexedSeq[Pt] = {
    val mx = (a.x + b.x) / 2; val my = (a.y + b.y) / 2
    val dx = b.x - a.x; val dy = b.y - a.y
    def g(p: Pt): Double = (p.x - mx) * dx + (p.y - my) * dy
    val out = IndexedSeq.newBuilder[Pt]
    val n = ring.length
    var i = 0
    while (i < n) {
      val cur = ring(i); val nxt = ring((i + 1) % n)
      val gc = g(cur); val gn = g(nxt)
      if (gc <= 0) out += cur
      if ((gc < 0 && gn > 0) || (gc > 0 && gn < 0)) {
        val t = gc / (gc - gn)
        out += Pt(cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y))
      }
      i += 1
    }
    out.result()
  }
}
