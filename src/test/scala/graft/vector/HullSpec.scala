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
    assert(out.head.getLong(4) == 3600000L)     // exact perimeter (1e-5 units)
  }

  test("property: every input point is left-or-on every directed hull edge; hull is idempotent") {
    def cross(a: (Long, Long), b: (Long, Long), c: (Long, Long)): Long =
      (b._1 - a._1) * (c._2 - a._2) - (b._2 - a._2) * (c._1 - a._1)
    for (seed <- 1 to 5) {
      val pts = (0 until 120).map { i =>
        val r = (i * 2654435761L + seed * 40503L) & 0xffffffffL
        ((r % 97).toLong * 2 + 1, ((r >> 16) % 89).toLong * 2 + 1) // odd = half-aligned doubled
      }.distinct.toArray
      val hull = Hull.chain(pts)
      assert(hull.length >= 3, s"seed $seed degenerate")
      // CCW convexity: consecutive turns strictly left
      hull.indices.foreach { i =>
        val a = hull(i); val b = hull((i + 1) % hull.length); val c = hull((i + 2) % hull.length)
        assert(cross(a, b, c) > 0, s"seed $seed non-strict turn at $i")
      }
      // containment: every point left-or-on every edge
      hull.indices.foreach { i =>
        val a = hull(i); val b = hull((i + 1) % hull.length)
        pts.foreach(p => assert(cross(a, b, p) >= 0, s"seed $seed point $p outside $a->$b"))
      }
      // idempotence
      assert(Hull.chain(hull).toSeq == hull.toSeq)
      // partition-independence of the distributed reduction is
      // guaranteed by chain(candidates) == chain(all): check directly
      val (l, r) = pts.splitAt(pts.length / 2)
      assert(Hull.chain(Hull.chain(l) ++ Hull.chain(r)).toSeq == hull.toSeq)
    }
  }

  test("convex: maxPoints ceiling fails loudly") {
    val pts = Seq((1L, 0.5, 0.5), (2L, 1.5, 0.5), (3L, 0.5, 1.5))
      .toDF("pid", "px", "py")
    val e = intercept[IllegalArgumentException](Hull.convex(pts, maxPoints = 2))
    assert(e.getMessage.contains("maxPoints"))
  }
}
