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
}
