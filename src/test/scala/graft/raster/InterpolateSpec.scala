package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  val layout8 = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(1, 1, 8, 8))

  test("idw: exact hits take the point value, weighted cells hand-check, radius bounds coverage") {
    val pts = Seq((1L, 2.5, 2.5, 7L), (2L, 5.5, 2.5, 9L))
      .toDF("pid", "px", "py", "value")
    val out = Interpolate.idw(pts, layout8, radius = 4)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // exact hits
    assert(out((2L, 2L)) == 7.0)
    assert(out((5L, 2L)) == 9.0)
    // cell (3,2), center (3.5,2.5): d2=1 to p1 (w=1e9), d2=4 to p2
    // (w=25e7) -> (1e9*7 + 25e7*9) / 1.25e9 = 7.4
    assert(out((3L, 2L)) == 7.4)
    // cell (4,2), center (4.5,2.5): d2=4 to p1, d2=1 to p2 ->
    // (25e7*7 + 1e9*9) / 1.25e9 = 8.6
    assert(out((4L, 2L)) == 8.6)
    // beyond the radius of both points: absent, not extrapolated
    assert(!out.contains((0L, 7L)))
    // all emitted cells stay inside the layout grid
    assert(out.keys.forall { case (x, y) => x >= 0 && x < 8 && y >= 0 && y < 8 })
  }

  test("kernel density: parabola stamp, overlap adds, support excludes d2 == r2") {
    // two points with values 2 and 3, radius 2 (r2 = 4)
    val pts = Seq((1L, 2.5, 2.5, 2L), (2L, 4.5, 2.5, 3L))
      .toDF("pid", "px", "py", "value")
    val out = Interpolate.kernelDensity(pts, layout8, radius = 2)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // cell (2,0), center (2.5,0.5): d2 = 4 to p1 — support is STRICT,
    // so the ring at d2 == r2 is outside; (0,0) is at d2 = 8
    assert(!out.contains((2L, 0L)))
    assert(!out.contains((0L, 0L)))
    // cell (3,2) center (3.5,2.5): d2=1 to both -> 3*2 + 3*3 = 15
    assert(out((3L, 2L)) == 15.0)
    // cell (2,2): d2=0 to p1 (w4*2=8), d2=4 to p2 (excluded) -> 8
    assert(out((2L, 2L)) == 8.0)
    // cell (4,2): d2=4 to p1 excluded, d2=0 to p2 -> 12
    assert(out((4L, 2L)) == 12.0)
  }

  test("idw: single isolated point yields a symmetric disk") {
    val pts = Seq((1L, 4.5, 4.5, 5L)).toDF("pid", "px", "py", "value")
    val out = Interpolate.idw(pts, layout8, radius = 2)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // every non-hit cell interpolates to exactly the point value (only
    // one point -> ratio collapses) and the disk has 13 cells (r2<=4)
    assert(out.size == 13)
    assert(out.values.forall(_ == 5.0))
    assert(out((4L, 2L)) == 5.0 && !out.contains((2L, 2L)))
  }

  test("kriging: weights solve the system, surface honors samples, covariance edges") {
    // spherical covariance pins: cov(0)=1 (sill), 0 at/H beyond range
    assert(Interpolate.sphericalCov(0.0, 10.0) == 1.0)
    assert(Interpolate.sphericalCov(10.0, 10.0) == 0.0)
    assert(Interpolate.sphericalCov(15.0, 10.0) == 0.0)
    val mid = Interpolate.sphericalCov(5.0, 10.0)
    assert(mid > 0.0 && mid < 1.0)
    // one point: (1 + nugget) b = z exactly
    val b1 = Interpolate.krigingWeights(Array((3.0, 3.0, 12.0)), 10.0, 0.25)
    assert(b1.length == 1 && b1(0) == 12.0 / 1.25)
    // three points: the solved weights satisfy (C + nugget I) b = z
    val pts = Array((1.0, 1.0, 10.0), (6.0, 1.0, 20.0), (3.0, 5.0, 40.0))
    val (rng, nug) = (8.0, 0.01)
    val b = Interpolate.krigingWeights(pts, rng, nug)
    pts.indices.foreach { i =>
      val lhs = pts.indices.map { j =>
        val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
        val c = Interpolate.sphericalCov(math.sqrt(dx * dx + dy * dy), rng)
        (if (i == j) c + nug else c) * b(j)
      }.sum
      assert(math.abs(lhs - pts(i)._3) < 1e-9, s"row $i")
    }
    // the surface passes near the samples (small nugget) and decays to
    // 0 outside every point's range
    val surf = Interpolate.simpleKriging(spark, pts, 16, rng, nug)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3 / 1000000.0).toMap // v_u (r18)
    assert(surf.size == 256)
    pts.foreach { case (px, py, z) =>
      assert(math.abs(surf((px.toLong, py.toLong)) - z) < 0.05 * z, s"at ($px,$py)")
    }
    assert(surf((15L, 15L)) == 0.0) // > range from every sample
  }

  test("tin: planar samples reproduce the plane exactly inside the hull") {
    // corners of the 8x8 grid on the plane z(px,py) = px + py - 1
    // (integral at half-aligned points); TIN linear interpolation must
    // return x + y at every cell center, whichever diagonal wins
    val pts = Seq(
      (1L, 0.5, 0.5, 0L), (2L, 7.5, 0.5, 7L),
      (3L, 0.5, 7.5, 7L), (4L, 7.5, 7.5, 14L))
      .toDF("pid", "px", "py", "value")
    val out = Interpolate.tin(spark, pts, layout8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // hull covers cell centers x,y in 0..7 -> all 64 cells
    assert(out.size == 64)
    out.foreach { case ((x, y), v) => assert(v == (x + y).toDouble, s"at ($x,$y)") }
  }

  test("tin: vertex cells take the sample value; outside the hull stays NoData") {
    // a thin triangle in the grid corner
    val pts = Seq((1L, 0.5, 0.5, 10L), (2L, 4.5, 0.5, 20L), (3L, 0.5, 4.5, 30L))
      .toDF("pid", "px", "py", "value")
    val out = Interpolate.tin(spark, pts, layout8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((0L, 0L)) == 10.0 && out((4L, 0L)) == 20.0 && out((0L, 4L)) == 30.0)
    // midpoint of the hypotenuse
    assert(out((2L, 2L)) == 25.0)
    // outside the hull: absent
    assert(!out.contains((4L, 4L)) && !out.contains((7L, 7L)))
  }
}
