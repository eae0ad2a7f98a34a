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
}
