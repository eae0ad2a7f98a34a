package graft.vector

import graft.SparkSpec

class HullSpec extends SparkSpec {
  import spark.implicits._

  test("monotone chain: CCW order, strict hull drops collinear boundary points") {
    // unit square with a collinear edge midpoint and an interior point
    val pts = Array((0L, 0L), (2L, 0L), (1L, 0L), (2L, 2L), (0L, 2L), (1L, 1L))
    assert(Hull.chain(pts).toSeq == Seq((0L, 0L), (2L, 0L), (2L, 2L), (0L, 2L)))
    // degenerate: all collinear -> the two endpoints
    assert(Hull.chain(Array((0L, 0L), (3L, 0L), (1L, 0L))).toSeq ==
      Seq((0L, 0L), (3L, 0L)))
    // duplicates collapse
    assert(Hull.chain(Array((0L, 0L), (0L, 0L), (1L, 1L), (1L, 0L))).toSeq ==
      Seq((0L, 0L), (1L, 0L), (1L, 1L)))
  }

  test("convex: every input point is inside or on the hull; area/perimeter exact on a square") {
    val pts = Seq((1L, 0.5, 0.5), (2L, 10.5, 0.5), (3L, 10.5, 8.5), (4L, 0.5, 8.5),
      (5L, 5.5, 4.5), (6L, 3.5, 0.5)) // interior + edge-collinear
      .toDF("pid", "px", "py")
    val out = Hull.convex(pts).collect()
    assert(out.length == 4) // strict hull: corners only
    val verts = out.map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(verts == Set((0.5, 0.5), (10.5, 0.5), (10.5, 8.5), (0.5, 8.5)))
    assert(out.head.getLong(2) == 4L)
    assert(out.head.getDouble(3) == 10.0 * 8.0) // exact shoelace area
    assert(out.head.getDouble(4) == 36.0)       // exact perimeter
  }

  test("convex: maxPoints ceiling fails loudly") {
    val pts = Seq((1L, 0.5, 0.5), (2L, 1.5, 0.5), (3L, 0.5, 1.5))
      .toDF("pid", "px", "py")
    val e = intercept[IllegalArgumentException](Hull.convex(pts, maxPoints = 2))
    assert(e.getMessage.contains("maxPoints"))
  }
}
