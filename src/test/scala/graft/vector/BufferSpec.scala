package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** Miter-join convex polygon offsetting. */
class BufferSpec extends AnyFunSuite {

  private def vertsOf(p: Polygon): Set[(Double, Double)] =
    p.exterior.map(pt => (pt.x, pt.y)).toSet
  private def approxSet(got: Set[(Double, Double)],
                        want: Set[(Double, Double)], tol: Double = 1e-9): Unit = {
    assert(got.size == want.size, s"$got vs $want")
    want.foreach { w =>
      assert(got.exists(g => math.abs(g._1 - w._1) < tol && math.abs(g._2 - w._2) < tol),
        s"missing $w in $got")
    }
  }

  test("rect buffer: each side moves out by d (miter right angles)") {
    val b = Buffer.buffer(Geometry.rect(10, 20, 30, 50), 5.0)
    approxSet(vertsOf(b), Set((5.0, 15.0), (35.0, 15.0), (35.0, 55.0), (5.0, 55.0)))
    // erosion is the inverse
    val e = Buffer.buffer(b, -5.0)
    approxSet(vertsOf(e), vertsOf(Geometry.rect(10, 20, 30, 50)))
  }

  test("diamond buffer: L1 radius grows by d*sqrt(2)") {
    val b = Buffer.buffer(Geometry.diamond(100, 100, 30), 10.0)
    val r2 = 30 + 10 * math.sqrt(2)
    approxSet(vertsOf(b), Set((100.0, 100 - r2), (100 + r2, 100.0),
      (100.0, 100 + r2), (100 - r2, 100.0)))
  }

  test("orientation-independent: CW input offsets outward too") {
    val cw = Polygon(Geometry.rect(0, 0, 10, 10).exterior.reverse)
    val b = Buffer.buffer(cw, 2.0)
    approxSet(vertsOf(b), Set((-2.0, -2.0), (12.0, -2.0), (12.0, 12.0), (-2.0, 12.0)))
  }

  test("containment and point-set sanity on an irregular convex ring") {
    val ring = Polygon(IndexedSeq(Pt(0, 0), Pt(8, -1), Pt(12, 4), Pt(7, 9), Pt(1, 6)))
    val b = Buffer.buffer(ring, 1.5)
    // grown ring contains every original vertex strictly
    ring.exterior.foreach(p => assert(b.contains(p.x, p.y), s"$p"))
    // every original edge midpoint moved out exactly 1.5 along its normal
    // lies ON the offset boundary -> a hair inside at 1.49, outside at 1.51
    val n = ring.exterior.length
    for (i <- 0 until n) {
      val a = ring.exterior(i); val c = ring.exterior((i + 1) % n)
      val mx = (a.x + c.x) / 2; val my = (a.y + c.y) / 2
      val ex = c.x - a.x; val ey = c.y - a.y; val len = math.hypot(ex, ey)
      // ring is CW in y-up terms? use both candidate normals: the one
      // pointing away from the centroid is outward
      val (cx0, cy0) = (ring.exterior.map(_.x).sum / n, ring.exterior.map(_.y).sum / n)
      val cand = Seq((ey / len, -ex / len), (-ey / len, ex / len))
      val (nx, ny) = cand.maxBy { case (nx, ny) => (mx + nx - cx0) * nx + (my + ny - cy0) * ny }
      assert(b.contains(mx + 1.49 * nx, my + 1.49 * ny))
      assert(!b.contains(mx + 1.51 * nx, my + 1.51 * ny))
    }
  }

  test("collinear vertices drop; concave and over-eroded rings reject") {
    val withCollinear = Polygon(IndexedSeq(Pt(0, 0), Pt(5, 0), Pt(10, 0),
      Pt(10, 10), Pt(0, 10)))
    val b = Buffer.buffer(withCollinear, 1.0)
    assert(b.exterior.length == 4)
    val concave = Polygon(IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 10),
      Pt(5, 3), Pt(0, 10)))
    intercept[IllegalArgumentException](Buffer.buffer(concave, 1.0))
    intercept[IllegalArgumentException](
      Buffer.buffer(Geometry.rect(0, 0, 4, 4), -3.0)) // inradius 2
    intercept[IllegalArgumentException](
      Buffer.buffer(Polygon(IndexedSeq(Pt(0, 0), Pt(1, 0), Pt(2, 0)), Nil), 1.0))
  }

  // --- erosion (negative buffer) via the (interior, corridor) pair

  private def erodedIn(pair: (Seq[Polygon], Seq[Polygon]), x: Double, y: Double): Boolean =
    pair._1.exists(_.contains(x, y)) && !pair._2.exists(_.contains(x, y))

  test("erode convex rect matches the exact inward miter offset") {
    val rect = Geometry.rect(10.3, 20.7, 50.3, 60.7)
    val pair = Buffer.erodePieces(rect, 4.1)
    val exact = Buffer.buffer(rect, -4.1)
    // sample a lattice avoiding both boundaries (offset edges sit at
    // .4/.2-ish fractions; sample at integers + .55)
    for (x <- 5 to 56; y <- 15 to 66) {
      val px = x + 0.55; val py = y + 0.55
      assert(erodedIn(pair, px, py) == exact.contains(px, py), s"($px,$py)")
    }
  }

  test("erode concave L: reflex corner carves a quarter-disk, arms shrink") {
    // L with arms 40 wide; erode by 6
    val L = Polygon(IndexedSeq(Pt(0, 0), Pt(100, 0), Pt(100, 40),
      Pt(40, 40), Pt(40, 100), Pt(0, 100)))
    val pair = Buffer.erodePieces(L, 6.0, Buffer.Round(8))
    // deep interior survives
    assert(erodedIn(pair, 20.5, 20.5))
    assert(erodedIn(pair, 80.5, 20.5))
    assert(erodedIn(pair, 20.5, 80.5))
    // the 6-band inside every wall is gone
    assert(!erodedIn(pair, 3.5, 50.5))
    assert(!erodedIn(pair, 50.5, 37.5))
    // the reflex corner (40,40): interior points within 6 of the
    // corner VERTEX are carved even though they are > 6 from any wall
    assert(!erodedIn(pair, 36.0, 36.0)) // dist to corner ~5.66 < 6
    assert(erodedIn(pair, 33.5, 33.5))  // dist ~9.19 > 6, walls 33.5
    // convex corner (0,0): the surviving corner is the miter point
    assert(erodedIn(pair, 6.5, 6.5))
    assert(!erodedIn(pair, 5.5, 5.5))
  }

  test("erosion past the inradius yields the empty set") {
    val pair = Buffer.erodePieces(Geometry.rect(0, 0, 10, 10), 5.3)
    for (x <- 0 to 10; y <- 0 to 10)
      assert(!erodedIn(pair, x + 0.49, y + 0.49))
  }

  test("corridor covers the d-band of the boundary, inside and out") {
    val L = Polygon(IndexedSeq(Pt(0, 0), Pt(100, 0), Pt(100, 40),
      Pt(40, 40), Pt(40, 100), Pt(0, 100)))
    val corridor = Buffer.ringCorridorPieces(L, 6.0, Buffer.Round(8))
    def inC(x: Double, y: Double) = corridor.exists(_.contains(x, y))
    // points straddling a wall: both sides within 6 are covered
    assert(inC(-3.5, 50.5) && inC(3.5, 50.5))   // left wall
    assert(inC(50.5, -3.5) && inC(50.5, 3.5))   // bottom wall
    assert(inC(44.0, 44.0))                     // reflex-corner disk
    assert(inC(-4.0, -4.0))                     // convex-corner fan (d~5.66)
    // points clear of the band are not
    assert(!inC(20.5, 20.5) && !inC(50.5, 50.5) && !inC(-8.5, 50.5))
  }
}
