package graft.vector

import graft.SparkSpec

class MeasuresSpec extends SparkSpec {
  import spark.implicits._

  test("convex-clip intersection: hand cases, symmetry, rect equivalence (r15)") {
    def ix(xs: Seq[Double], ys: Seq[Double], cx: Seq[Double], cy: Seq[Double]) =
      Clip.clipRingConvex(xs.toIndexedSeq, ys.toIndexedSeq,
        cx.toIndexedSeq, cy.toIndexedSeq)
    val sq = (Seq(0.0, 10, 10, 0), Seq(0.0, 0, 10, 10))
    // identity: A ∩ A = A
    val (sx, sy) = ix(sq._1, sq._2, sq._1, sq._2)
    assert(Clip.ringArea(sx, sy) == 100.0)
    // rectangle clip must equal the axis-aligned 4-pass path exactly
    val dia = (Seq(-4.0, 0, 4, 0), Seq(5.0, 1, 5, 9))
    val (rx, ry) = Clip.clipRing(dia._1.toIndexedSeq, dia._2.toIndexedSeq, 0, 0, 10, 10)
    val (gx, gy) = ix(dia._1, dia._2, sq._1, sq._2)
    assert(Clip.ringArea(gx, gy) == Clip.ringArea(rx, ry))
    // two unit-overlap squares: A = [0,4]^2, B = [3,7]^2 -> area 1,
    // and intersection is SYMMETRIC (clip A by B == clip B by A)
    val a = (Seq(0.0, 4, 4, 0), Seq(0.0, 0, 4, 4))
    val b = (Seq(3.0, 7, 7, 3), Seq(3.0, 3, 7, 7))
    val (abx, aby) = ix(a._1, a._2, b._1, b._2)
    val (bax, bay) = ix(b._1, b._2, a._1, a._2)
    assert(Clip.ringArea(abx, aby) == 1.0 && Clip.ringArea(bax, bay) == 1.0)
    // disjoint -> empty; CW clip ring normalizes (same answer)
    assert(ix(a._1, a._2, Seq(20.0, 24, 24, 20), Seq(20.0, 20, 24, 24))._1.isEmpty)
    val (cwx, cwy) = ix(a._1, a._2, b._1.reverse, b._2.reverse)
    assert(Clip.ringArea(cwx, cwy) == 1.0)
    // triangle ∩ square, independent half-plane derivation: triangle
    // (0,0)(8,0)(0,8) clipped to [0,5]^2 loses the corner above
    // x + y = 8 -> area = 25 - (1/2)*2*2 = 23
    val (tx, ty) = ix(Seq(0.0, 8, 0), Seq(0.0, 0, 8), Seq(0.0, 5, 5, 0), Seq(0.0, 0, 5, 5))
    assert(Clip.ringArea(tx, ty) == 23.0)
    // inclusion-exclusion union: |A ∪ B| = 16 + 16 - 1 = 31
    import spark.implicits._
    val u = Clip.unionAreaConvex(
        Seq((1L, a._1, a._2)).toDF("pid", "xs", "ys"),
        Polygon(b._1.zip(b._2).map(p => Pt(p._1, p._2)).toIndexedSeq))
      .collect().head.getDouble(1)
    assert(u == 31.0)
  }

  test("sutherland-hodgman clip: hand cases") {
    def clip(xs: Seq[Double], ys: Seq[Double]) =
      Clip.clipRing(xs.toIndexedSeq, ys.toIndexedSeq, 0, 0, 10, 10)
    // square half outside: [-5,5]x[2,8] -> [0,5]x[2,8], area 30
    val (ax, ay) = clip(Seq(-5, 5, 5, -5), Seq(2, 2, 8, 8))
    assert(ax.length == 4 && Clip.ringArea(ax, ay) == 30.0)
    // fully inside: unchanged
    val (bx, by) = clip(Seq(1, 3, 3, 1), Seq(1, 1, 3, 3))
    assert(bx == IndexedSeq(1.0, 3.0, 3.0, 1.0) && Clip.ringArea(bx, by) == 4.0)
    // fully outside: empty
    assert(clip(Seq(20, 22, 21), Seq(20, 20, 22))._1.isEmpty)
    // diamond poking through the left edge: triangle tip clipped
    // diamond centered (0,5) r=4 -> clipped area = right half = 16
    val (cx, cy) = clip(Seq(-4, 0, 4, 0), Seq(5, 1, 5, 9))
    assert(Clip.ringArea(cx, cy) == 16.0)
    // concave (L-shaped) ring survives with the notch intact
    val (dx, dy) = clip(Seq(-2, 6, 6, 2, 2, -2), Seq(0, 0, 2, 2, 8, 8))
    // original L area = 8x2 + 4x6 = 40 minus the x<0 strip (2x2 + 2x6 = 16)
    assert(Clip.ringArea(dx, dy) == 40.0 - 16.0)
  }

  test("semivariogram: hand bins and gamma on a 3-point line") {
    // points at x = 0, 10, 40 with values 1, 3, 7; binWidth 16
    // pairs: (0,10) d=10 lag0 dv2=4; (0,40) d=40 lag2 dv2=36; (10,40) d=30 lag1 dv2=16
    val pts = Seq((1L, 0.0, 0.0, 1.0), (2L, 10.0, 0.0, 3.0), (3L, 40.0, 0.0, 7.0))
      .toDF("pid", "px", "py", "v")
    val out = PointStats.semivariogram(pts).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(0L -> (1L, 2.0), 1L -> (1L, 8.0), 2L -> (1L, 18.0)))
  }

  test("clark-evans: square lattice is dispersed (r > 1), pile is clustered") {
    // 2x2 unit-ish lattice on a 4-area frame: NN dist 2 everywhere;
    // expected CSR = 0.5*sqrt(16/4) = 1 -> r = 2
    val lattice = Seq((1L, 0.0, 0.0), (2L, 2.0, 0.0), (3L, 0.0, 2.0), (4L, 2.0, 2.0))
      .map { case (i, x, y) => (i, x, y) }.toDF("pid", "px", "py")
    val (n, meanNn, r) = PointStats.clarkEvans(lattice, 16.0)
      .as[(Long, Double, Double)].head()
    assert(n == 4L && meanNn == 2.0 && r == 2.0)
    // near-coincident points: tiny mean NN, r near 0
    val pile = Seq((1L, 0.0, 0.0), (2L, 0.0, 0.0), (3L, 8.0, 8.0), (4L, 8.0, 8.0))
      .toDF("pid", "px", "py")
    val (_, m2, r2) = PointStats.clarkEvans(pile, 16.0).as[(Long, Double, Double)].head()
    assert(m2 == 0.0 && r2 == 0.0)
  }

  // (area DOUBLE, cx_u/cy_u micro-quantized BIGINTs — the r18 closing)
  def run(polys: Seq[(Long, String, Seq[Double], Seq[Double])]): Map[String, (Double, Long, Long)] =
    Measures.measures(polys.toDF("pid", "shape", "xs", "ys"))
      .as[(Long, String, Double, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap

  test("measures: square, both orientations, off-origin") {
    // unit square at (10,20), CCW and CW — orientation must cancel
    val sq = Seq(10.0, 11, 11, 10, 10)
    val sy = Seq(20.0, 20, 21, 21, 20)
    val m = run(Seq(
      (1L, "ccw", sq, sy),
      (2L, "cw", sq.reverse, sy.reverse)))
    assert(m("ccw") == (1.0, 10500000L, 20500000L))
    assert(m("cw") == (1.0, 10500000L, 20500000L))
  }

  test("measures: concave L-polygon matches decomposition") {
    // L: [0,1]x[0,2] plus [1,2]x[0,1] -> area 3, centroid (2.5/3, 2.5/3)
    val m = run(Seq((1L, "L",
      Seq(0.0, 2, 2, 1, 1, 0, 0), Seq(0.0, 0, 1, 1, 2, 2, 0))))
    val (area, cx, cy) = m("L")
    assert(area == 3.0)
    assert(cx == math.rint(2.5 / 3 * 1e6).toLong && cy == cx)
  }

  test("measures: triangle thirds centroid") {
    val m = run(Seq((1L, "t", Seq(0.0, 3, 0, 0), Seq(0.0, 0, 3, 0))))
    assert(m("t") == (4.5, 1000000L, 1000000L))
  }

  test("geodesic: quarter-circle east, due north, due south by hand") {
    def geo(lon: Double, lat: Double, alon: Double, alat: Double) =
      Measures.geodesic(Seq((1L, lon, lat)).toDF("pid", "lon", "lat"), alon, alat)
        .as[(Long, Long, Long)].collect().head
    // 1e-4-km quantized BIGINT closings (the r18 contract)
    def u4(x: Double) = math.rint(x * 1e4).toLong
    val quarter = u4(6371.0 * math.Pi / 2)
    // equator point to a point 90 deg east: quarter circumference, due east
    assert(geo(0, 0, 90, 0) == ((1L, quarter, 900000L)))
    // equator to the north pole: same distance, bearing 0
    assert(geo(0, 0, 0, 90) == ((1L, quarter, 0L)))
    // due south along a meridian: 30 deg of arc, bearing 180
    val d30 = u4(6371.0 * math.toRadians(30))
    assert(geo(10, 0, 10, -30) == ((1L, d30, 1800000L)))
    // zero distance at the anchor itself
    assert(geo(2.25, 48.85, 2.25, 48.85)._2 == 0L)
  }

  test("spherical excess: octant triangle is exactly pi/2 steradians") {
    import org.apache.spark.sql.functions._
    val e = Measures.triangleExcessSql(
      ("radians(0)", "radians(0)"), ("radians(90)", "radians(0)"),
      ("radians(0)", "radians(90)"))
    val v = Seq(1).toDF("one").select(expr(e).as("e")).as[Double].head()
    assert(math.abs(v - math.Pi / 2) < 1e-9)
  }

  test("diamond geodesic area approaches the planar 2 d^2 cos(lat) R^2 for small d") {
    import org.apache.spark.sql.functions._
    val d = 0.05
    val rows = Seq((1L, 10.0, 0.0), (2L, 10.0, 60.0)).toDF("pid", "lon", "lat")
    val out = rows.select(col("pid"),
      expr(Measures.diamondAreaSql(d)).as("a")).as[(Long, Double)].collect().toMap
    def planar(lat: Double): Double = {
      val dr = math.toRadians(d)
      2 * dr * dr * math.cos(math.toRadians(lat)) * 6371.0 * 6371.0
    }
    assert(math.abs(out(1L) / planar(0.0) - 1) < 1e-3)
    assert(math.abs(out(2L) / planar(60.0) - 1) < 1e-3)
    // equatorial diamond is bigger than the 60-deg-lat one by ~cos
    assert(out(1L) > out(2L) * 1.9)
  }
}
