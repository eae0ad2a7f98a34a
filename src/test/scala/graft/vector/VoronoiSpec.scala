package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** Voronoi cells by all-pairs bisector clipping: geometric identities
  * plus the q_voronoi fixture's boundary-safety audit (the
  * OverlayOracleSpec discipline: every grid center must decide its
  * cell with a real margin, and the vector-cell verdict must agree
  * with the brute nearest-site argmin everywhere). */
class VoronoiSpec extends AnyFunSuite {

  test("one site owns the whole box; two sites split it at the bisector") {
    val whole = Voronoi.cells(IndexedSeq(Pt(3, 4)), 0, 0, 10, 10)
    assert(whole.length == 1)
    assert(math.abs(Overlay.area(whole.head._2) - 100.0) < 1e-9)
    val two = Voronoi.cells(IndexedSeq(Pt(2.5, 5), Pt(7.5, 5)), 0, 0, 10, 10)
    assert(two.length == 2)
    two.foreach { case (_, p) => assert(math.abs(Overlay.area(p) - 50.0) < 1e-9) }
    // left cell contains (1,5), not (9,5)
    val left = two.find(_._1 == 0).get._2
    assert(left.contains(1, 5) && !left.contains(9, 5))
  }

  test("cell areas partition the extent for an irregular site set") {
    val sites = IndexedSeq(Pt(10.31, 20.74), Pt(80.31, 15.74), Pt(40.31, 70.74),
      Pt(90.31, 90.74), Pt(5.31, 95.74), Pt(55.31, 45.74))
    val cells = Voronoi.cells(sites, 0, 0, 100, 100)
    assert(cells.length == 6)
    val total = cells.map { case (_, p) => Overlay.area(p) }.sum
    assert(math.abs(total - 10000.0) < 1e-6, s"sum $total")
    // every cell contains its own site and no other
    cells.foreach { case (i, p) =>
      sites.indices.foreach { j =>
        assert(p.contains(sites(j).x, sites(j).y) == (i == j), s"cell $i site $j")
      }
    }
  }

  test("duplicate sites and oversize site sets reject") {
    intercept[IllegalArgumentException] {
      Voronoi.cells(IndexedSeq(Pt(1, 1), Pt(1, 1)), 0, 0, 10, 10)
    }
    intercept[IllegalArgumentException] {
      Voronoi.cells(IndexedSeq.tabulate(Voronoi.MaxSites + 1)(i => Pt(i, 0)), 0, 0, 1e6, 10)
    }
  }

  test("q_voronoi fixture: every grid center has a real argmin margin " +
       "and the vector cells agree with brute nearest-site everywhere") {
    // the query's site formula over supplier keys 1..10 (TPC-H keys
    // start at 1; identical rows at every SF)
    val sites = (1 to 10).map(k =>
      Pt((k * 13 % 256) + 0.31, (k * 29 % 256) + 0.74))
    val cells = Voronoi.cells(sites, 0, 0, 256, 256)
    assert(cells.length == sites.length)
    val byIdx = cells.toMap
    var worstGap = Double.MaxValue
    var y = 0
    while (y < 256) {
      var x = 0
      while (x < 256) {
        val cx = x + 0.5; val cy = y + 0.5
        var best = -1; var bd = Double.MaxValue; var second = Double.MaxValue
        sites.indices.foreach { i =>
          val d = (cx - sites(i).x) * (cx - sites(i).x) +
            (cy - sites(i).y) * (cy - sites(i).y)
          if (d < bd) { second = bd; bd = d; best = i }
          else if (d < second) second = d
        }
        if (second - bd < worstGap) worstGap = second - bd
        // exactly the brute winner's cell contains the center
        sites.indices.foreach { i =>
          assert(byIdx(i).contains(cx, cy) == (i == best),
            s"($cx,$cy): cell $i vs brute $best")
        }
        x += 1
      }
      y += 1
    }
    assert(worstGap > 1e-6, s"argmin gap $worstGap - the oracle's strict " +
      "order-by and the containment mask could disagree")
  }
}
