package graft.vector

/** Voronoi diagrams — the geotrellis
  * `geotrellis.vector.voronoi.VoronoiDiagram` surface (the dual the
  * repo's Delaunay/TIN path was missing): per site, the convex cell of
  * points nearer to it than to any other site, clipped to a bounding
  * extent.
  *
  * Construction, two paths sharing one clipBisector kernel:
  *  - [[cells]]: cell(i) = extent rectangle ∩ (∩_{j≠i} bisector
  *    half-plane closer to i) — one Sutherland–Hodgman pass per
  *    bisector. Clipping against ALL other sites is the definition
  *    itself (exact, no neighbor-list dependence, no coordinate
  *    contract) but n² in sites — the dim-sized path, guarded by
  *    [[MaxSites]].
  *  - [[cellsDual]] (r18, the geotrellis VoronoiDiagram construction):
  *    clip only against i's DELAUNAY NEIGHBORS — V(i) is exactly the
  *    intersection of its neighbors' bisector half-planes (every
  *    non-neighbor bisector is redundant), so total clip work is
  *    O(#Delaunay edges) = O(n) instead of O(n²). Needs the
  *    integral-at-scale coordinate contract the exact Bowyer-Watson
  *    predicates demand ([[Delaunay.triangulateScaled]]); guarded by
  *    the much larger [[MaxSitesDual]].
  * Unbounded hull cells are bounded by the extent clip in both.
  *
  * Scale shape: sites are the DIM side (model-constant, like
  * kriging's variogram fit and the TIN triangulation) — both paths
  * run driver-side under loud guards; the GRID side stays
  * distributed (cells feed Rasterize.features / mask / spatial joins).
  */
object Voronoi {

  /** Driver-side guard: all-pairs clipping is n² in sites. Past it,
    * use [[cellsDual]] — the implemented Delaunay-neighbor swap. */
  val MaxSites = 4096

  /** [[cellsDual]] guard. Clip work is linear in sites, but the
    * Bowyer-Watson build scans every live triangle per insertion —
    * O(n²) triangle predicates total — and runs on the driver (sites
    * are the model-constant dim side). 32k sites ≈ 1e9 Long
    * predicates ≈ tens of seconds; the honest driver ceiling. Past it
    * use [[DelaunayDist.triangulate]] (r20): the distributed
    * certified-star build with no site ceiling — its
    * [[DelaunayDist.neighbors]] output is exactly the neighbor list
    * this path clips against. */
  val MaxSitesDual = 32768

  /** Voronoi cells clipped to [xmin,xmax]×[ymin,ymax].
    * @param sites distinct points (duplicate sites rejected)
    * @return (index into `sites`, convex cell polygon); sites whose
    *         cell misses the extent entirely are dropped. */
  def cells(sites: IndexedSeq[Pt], xmin: Double, ymin: Double,
            xmax: Double, ymax: Double): Seq[(Int, Polygon)] = {
    require(sites.nonEmpty, "no sites")
    require(sites.length <= MaxSites,
      s"${sites.length} sites exceed MaxSites=$MaxSites — Voronoi sites are " +
        "the dim side; use cellsDual (the Delaunay-neighbor path) for " +
        "bigger sets")
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

  /** Voronoi cells via the Delaunay dual: clip each site's box only
    * against its Delaunay neighbors' bisectors. Region-identical to
    * [[cells]] (the duality theorem: V(i) = ∩ neighbor half-planes;
    * VoronoiDualSpec proves agreement on the 65,536-center audit
    * grid), with O(n) total clip work instead of n².
    *
    * @param scale the exact-predicate coordinate contract: every
    *              site coordinate must be integral after ·scale
    *              (half-integral grids: 2; the .31/.74 query
    *              fixtures: 100). See [[Delaunay.triangulateScaled]].
    * The duality claim is unconditional: [[Delaunay.triangulateScaled]]
    * places its super-triangle provably outside every finite
    * circumcircle, so the triangulation (and therefore the neighbor
    * lists clipped against here) is the TRUE Delaunay triangulation —
    * including hull-adjacent faces of almost-collinear triples.
    *
    * Degenerate site sets (< 3 sites or all collinear — zero
    * triangles) fall back to the exact all-pairs clip while they fit
    * [[MaxSites]]; past that, collinear sites take the slab path (on
    * a shared line only the two ADJACENT sites' bisectors are
    * non-redundant), which has no size wall. */
  def cellsDual(sites: IndexedSeq[Pt], xmin: Double, ymin: Double,
                xmax: Double, ymax: Double,
                scale: Long = 100L): Seq[(Int, Polygon)] = {
    require(sites.nonEmpty, "no sites")
    require(sites.length <= MaxSitesDual,
      s"${sites.length} sites exceed MaxSitesDual=$MaxSitesDual")
    require(sites.distinct.length == sites.length, "duplicate sites")
    require(xmin < xmax && ymin < ymax, "degenerate extent")
    val nbrs = Delaunay.neighborsScaled(
      sites.map(p => (p.x, p.y)).toArray, scale)
    if (nbrs.forall(_.isEmpty)) { // < 3 sites or fully collinear
      // small sets keep the exact all-pairs clip (byte-identical to
      // cells(), which the degenerate-fixture spec pins); past
      // MaxSites the all-pairs wall would turn a valid collinear set
      // into a confusing rejection, so clip only the two bisectors
      // that matter: on a shared line, V(i) is bounded by the
      // bisectors of i's ADJACENT sites along the line (every other
      // bisector is redundant) — order by the same rint-scaled
      // integers the triangulation keys on (lexicographic (x, y) is
      // monotone along any line: x strictly, or y when vertical).
      if (sites.length <= MaxSites)
        return cells(sites, xmin, ymin, xmax, ymax)
      val keyed = sites.indices.map { i =>
        (math.rint(sites(i).x * scale).toLong,
         math.rint(sites(i).y * scale).toLong, i)
      }
      require(keyed.map(k => (k._1, k._2)).distinct.length == sites.length,
        s"sites collide at scale $scale — raise the scale to the " +
          "coordinates' true resolution")
      val ord = keyed.sortBy(k => (k._1, k._2)).map(_._3)
      val box0 = IndexedSeq(Pt(xmin, ymin), Pt(xmax, ymin),
        Pt(xmax, ymax), Pt(xmin, ymax))
      val cellOf = new Array[Option[Polygon]](sites.length)
      ord.indices.foreach { pos =>
        val i = ord(pos)
        var ring = box0
        if (pos > 0) ring = clipBisector(ring, sites(i), sites(ord(pos - 1)))
        if (pos < ord.length - 1 && ring.length >= 3)
          ring = clipBisector(ring, sites(i), sites(ord(pos + 1)))
        cellOf(i) = if (ring.length >= 3) Some(Polygon(ring)) else None
      }
      return sites.indices.flatMap(i => cellOf(i).map(i -> _))
    }
    // a mixed empty/non-empty neighbor map means two distinct-double
    // sites collided after the scale rint — the triangulation dropped
    // one and its "cell" would silently stay the whole box
    require(nbrs.forall(_.nonEmpty),
      s"sites collide at scale $scale — raise the scale to the " +
        "coordinates' true resolution")
    val box = IndexedSeq(Pt(xmin, ymin), Pt(xmax, ymin), Pt(xmax, ymax), Pt(xmin, ymax))
    sites.indices.flatMap { i =>
      var ring = box
      val nb = nbrs(i)
      var k = 0
      while (k < nb.length && ring.length >= 3) {
        ring = clipBisector(ring, sites(i), sites(nb(k)))
        k += 1
      }
      if (ring.length >= 3) Some(i -> Polygon(ring)) else None
    }
  }

  /** One Sutherland–Hodgman pass keeping the side of the perpendicular
    * bisector of (a, b) closer to `a`: points p with
    * (p − m)·(b − a) ≤ 0, m the midpoint (boundary kept — cells are
    * closed; the fixtures' margin audit keeps decisions off it). */
  private[vector] def clipBisector(ring: IndexedSeq[Pt], a: Pt, b: Pt): IndexedSeq[Pt] = {
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
