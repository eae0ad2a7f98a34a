package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** The Delaunay-dual Voronoi path (r18): cellsDual must be
  * region-identical to the all-pairs definition — proven here by
  * exhaustive nearest-site labeling over the q_voronoi fixture's full
  * 65,536-center audit grid, per-cell area agreement, and the guard /
  * degeneracy contracts. */
class VoronoiDualSpec extends AnyFunSuite {

  private def label(cells: Seq[(Int, Polygon)], cx: Double, cy: Double): Int =
    cells.collectFirst { case (i, p) if p.contains(cx, cy) => i }.getOrElse(-1)

  test("dual == all-pairs on the 65,536-center audit grid (q_voronoi fixture)") {
    val sites = (1 to 10).map(k =>
      Pt((k * 13 % 256) + 0.31, (k * 29 % 256) + 0.74))
    val allPairs = Voronoi.cells(sites, 0, 0, 256, 256)
    val dual = Voronoi.cellsDual(sites, 0, 0, 256, 256, scale = 100L)
    assert(dual.map(_._1).sorted == allPairs.map(_._1).sorted)
    val apByIdx = allPairs.toMap
    val duByIdx = dual.toMap
    // per-cell areas agree (the regions are the same convex polygons;
    // vertex doubles may differ in the last ulp through the different
    // clip orders, never more)
    apByIdx.foreach { case (i, p) =>
      assert(math.abs(Overlay.area(p) - Overlay.area(duByIdx(i))) < 1e-6,
        s"cell $i area")
    }
    // every one of the 256x256 centers lands in the same cell
    var y = 0
    while (y < 256) {
      var x = 0
      while (x < 256) {
        val cx = x + 0.5; val cy = y + 0.5
        assert(label(allPairs, cx, cy) == label(dual, cx, cy), s"($cx,$cy)")
        x += 1
      }
      y += 1
    }
  }

  test("dual matches all-pairs on a denser 80-site half-integral set") {
    // 80 sites on half-integral coords (scale 2 — the Long-predicate
    // regime), scattered by coprime multipliers
    val sites = (1 to 80).map(k =>
      Pt((k * 37 % 200) + 0.5, (k * 53 % 200) + 0.5))
    val allPairs = Voronoi.cells(sites, 0, 0, 200, 200)
    val dual = Voronoi.cellsDual(sites, 0, 0, 200, 200, scale = 2L)
    assert(dual.map(_._1).sorted == allPairs.map(_._1).sorted)
    val duByIdx = dual.toMap
    allPairs.foreach { case (i, p) =>
      assert(math.abs(Overlay.area(p) - Overlay.area(duByIdx(i))) < 1e-6,
        s"cell $i area")
    }
    // probe the grid, skipping centers whose brute argmin has no
    // margin (a probe ON a shared cell edge is owned by neither
    // polygon under floating-point contains — both paths agree on
    // every decided point, which is the region-identity claim)
    var y = 0
    while (y < 200) {
      var x = 0
      while (x < 200) {
        val cx = x + 0.25; val cy = y + 0.75
        var best = -1; var bd = Double.MaxValue; var second = Double.MaxValue
        sites.indices.foreach { i =>
          val d = (cx - sites(i).x) * (cx - sites(i).x) +
            (cy - sites(i).y) * (cy - sites(i).y)
          if (d < bd) { second = bd; bd = d; best = i }
          else if (d < second) second = d
        }
        if (second - bd > 1e-6) {
          assert(label(allPairs, cx, cy) == label(dual, cx, cy), s"($cx,$cy)")
        }
        x += 4 // ~10k probes keeps the suite fast
      }
      y += 1
    }
  }

  test("dual == all-pairs on an almost-collinear hull set (r19 exact super-triangle)") {
    // the bottom chain (0.5,0.5)-(100.5,1.5)-(200.5,3.5) is nearly
    // collinear: its circumcircle is ~10^6 x the span, so the r18
    // span-sized super-triangle sat INSIDE it and the dual could miss
    // a required hull bisector — exactly the ADVICE deviation case
    val sites = IndexedSeq(
      Pt(0.5, 0.5), Pt(100.5, 1.5), Pt(200.5, 3.5),
      Pt(50.5, 40.5), Pt(150.5, 60.5), Pt(100.5, 80.5), Pt(30.5, 70.5))
    val ap = Voronoi.cells(sites, 0, 0, 201, 81)
    val dual = Voronoi.cellsDual(sites, 0, 0, 201, 81, scale = 2L)
    assert(dual.map(_._1).sorted == ap.map(_._1).sorted)
    val by = dual.toMap
    ap.foreach { case (i, p) =>
      assert(math.abs(Overlay.area(p) - Overlay.area(by(i))) < 1e-6, s"cell $i area")
    }
    // margin-filtered nearest-site probe across the extent
    var y = 0
    while (y < 81) {
      var x = 0
      while (x < 201) {
        val cx = x + 0.25; val cy = y + 0.75
        var best = -1; var bd = Double.MaxValue; var second = Double.MaxValue
        sites.indices.foreach { i =>
          val d = (cx - sites(i).x) * (cx - sites(i).x) +
            (cy - sites(i).y) * (cy - sites(i).y)
          if (d < bd) { second = bd; bd = d; best = i }
          else if (d < second) second = d
        }
        if (second - bd > 1e-6) {
          assert(label(ap, cx, cy) == label(dual, cx, cy), s"($cx,$cy)")
        }
        x += 2
      }
      y += 1
    }
  }

  test("dual lifts the all-pairs guard: a site set past MaxSites still builds") {
    // 4,200 sites > MaxSites = 4096 — all-pairs rejects, dual builds.
    // Compact quarter-integral lattice (scale 4) keeps the exact
    // predicates on the fast Long path; the column-parity jitter
    // keeps the set non-collinear and collision-free.
    val sites = (0 until 4200).map { k =>
      Pt((k % 70) + 0.5, (k / 70) + 0.25 * ((k % 70) % 2) + 0.25)
    }
    assert(sites.distinct.length == sites.length)
    intercept[IllegalArgumentException] {
      Voronoi.cells(sites, -5, -5, 75, 65)
    }
    val dual = Voronoi.cellsDual(sites, -5, -5, 75, 65, scale = 4L)
    assert(dual.length == sites.length)
    // cells partition the extent
    val total = dual.map { case (_, p) => Overlay.area(p) }.sum
    assert(math.abs(total - 80.0 * 70.0) < 1e-4, s"sum $total")
    // each sampled site sits in its own cell
    val byIdx = dual.toMap
    (0 until 4200 by 8).foreach { i =>
      assert(byIdx(i).contains(sites(i).x, sites(i).y), s"site $i")
    }
  }

  test("degenerate and contract failures stay loud") {
    // collinear set falls back to the exact all-pairs path
    val line = (0 until 7).map(i => Pt(i * 3 + 0.5, 5.5))
    val dual = Voronoi.cellsDual(line, 0, 0, 30, 11, scale = 2L)
    val ap = Voronoi.cells(line, 0, 0, 30, 11)
    assert(dual == ap)
    // scale too coarse for the coordinates rejects (not silently rints)
    intercept[IllegalArgumentException] {
      Voronoi.cellsDual(IndexedSeq(Pt(0.31, 0), Pt(5, 5), Pt(9, 1)), 0, 0, 10, 10, scale = 2L)
    }
    // distinct doubles colliding at the scale reject loudly (the
    // 1e-9 offset rints onto its neighbor at scale 1)
    intercept[IllegalArgumentException] {
      Voronoi.cellsDual(
        IndexedSeq(Pt(1.0, 1.0), Pt(1.0 + 1e-9, 1.0), Pt(5.0, 5.0), Pt(1.0, 8.0)),
        0, 0, 10, 10, scale = 1L)
    }
    // over the dual guard rejects
    intercept[IllegalArgumentException] {
      Voronoi.cellsDual(IndexedSeq.tabulate(Voronoi.MaxSitesDual + 1)(i =>
        Pt(i.toDouble, 0)), 0, 0, 1e7, 10, scale = 1L)
    }
  }

  test("collinear sites past MaxSites take the slab path (r19)") {
    // 4,200 collinear sites: all-pairs would reject (> MaxSites=4096)
    // and r18 raised a confusing 'use cellsDual' from INSIDE cellsDual;
    // now the adjacent-bisector slab path builds the exact diagram
    val n = Voronoi.MaxSites + 104
    val sites = (0 until n).map(i => Pt(i + 0.5, 7.5))
    val dual = Voronoi.cellsDual(sites, 0, 0, n.toDouble, 15, scale = 2L)
    assert(dual.length == n)
    // cells partition the extent
    val total = dual.map { case (_, p) => Overlay.area(p) }.sum
    assert(math.abs(total - n * 15.0) < 1e-4, s"sum $total")
    // interior cells are exactly the unit-wide slabs
    val byIdx = dual.toMap
    Seq(1, 57, n / 2, n - 2).foreach { i =>
      assert(math.abs(Overlay.area(byIdx(i)) - 15.0) < 1e-9, s"cell $i")
      assert(byIdx(i).contains(sites(i).x, sites(i).y), s"site $i")
    }
    // scaled collisions still reject loudly on the slab path (the
    // 1e-9-offset double is integral-within-tolerance at scale 1 but
    // rints onto x=1)
    intercept[IllegalArgumentException] {
      Voronoi.cellsDual(
        Pt(1.0 + 1e-9, 3.0) +: (0 until n).map(i => Pt(i.toDouble, 3.0)),
        0, 0, n.toDouble, 6, scale = 1L)
    }
  }
}
