package graft.vector

import org.scalatest.funsuite.AnyFunSuite

class DelaunaySpec extends AnyFunSuite {

  /** Independent exact in-circumcircle check (BigInt, not the
    * implementation's Long math). */
  private def inCircle(a: (Double, Double), b: (Double, Double),
                       c: (Double, Double), p: (Double, Double)): BigInt = {
    def d(v: (Double, Double)) = (BigInt((v._1 * 2).toLong), BigInt((v._2 * 2).toLong))
    val (px0, py0) = d(p)
    val Seq((ax, ay), (bx, by), (cx, cy)) =
      Seq(a, b, c).map(d).map { case (x, y) => (x - px0, y - py0) }
    val (a2, b2, c2) = (ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy)
    val det = ax * (by * c2 - b2 * cy) - ay * (bx * c2 - b2 * cx) + a2 * (bx * cy - by * cx)
    // normalize by orientation so "inside" is always positive
    val orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if (orient < 0) -det else det
  }

  test("unit square: two triangles sharing a diagonal, all four corners used") {
    val pts = Array((0.5, 0.5), (4.5, 0.5), (0.5, 4.5), (4.5, 4.5))
    val tris = Delaunay.triangulate(pts)
    assert(tris.length == 2)
    assert(tris.flatMap { case (a, b, c) => Seq(a, b, c) }.distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    // the two triangles share exactly one edge (the diagonal)
    val edges = tris.flatMap { case (a, b, c) => Seq((a, b), (b, c), (a, c)) }
    assert(edges.length - edges.distinct.length == 1)
  }

  test("delaunay property: no input point strictly inside any circumcircle") {
    val pts = (1 to 12).map { i =>
      ((i * 13 % 31).toDouble + 0.5, (i * 29 % 37).toDouble + 0.5) }.toArray
    val tris = Delaunay.triangulate(pts)
    assert(tris.nonEmpty)
    for ((a, b, c) <- tris; (p, i) <- pts.zipWithIndex
         if i != a && i != b && i != c) {
      assert(inCircle(pts(a), pts(b), pts(c), p) <= 0,
        s"point $i inside circumcircle of ($a,$b,$c)")
    }
  }

  test("triangles tile the convex hull: areas sum to the hull area") {
    val pts = (1 to 10).map { i =>
      ((i * 13 % 256).toDouble + 0.5, (i * 29 % 256).toDouble + 0.5) }.toArray
    val tris = Delaunay.triangulate(pts)
    def dbl(p: (Double, Double)) = ((p._1 * 2).toLong, (p._2 * 2).toLong)
    val area2 = tris.map { case (a, b, c) =>
      val (ax, ay) = dbl(pts(a)); val (bx, by) = dbl(pts(b)); val (cx, cy) = dbl(pts(c))
      math.abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
    }.sum
    // hull by gift wrapping over doubled coords (independent)
    val ps = pts.map(dbl).distinct
    val start = ps.minBy(p => (p._1, p._2))
    var hull = List(start)
    var cur = start
    var done = false
    while (!done) {
      var cand = ps.find(_ != cur).get
      for (p <- ps if p != cur) {
        val cross = (cand._1 - cur._1) * (p._2 - cur._2) - (cand._2 - cur._2) * (p._1 - cur._1)
        if (cross < 0 || (cross == 0 &&
            (p._1 - cur._1).abs + (p._2 - cur._2).abs >
            (cand._1 - cur._1).abs + (cand._2 - cur._2).abs)) cand = p
      }
      cur = cand
      if (cur == start) done = true else hull = cur :: hull
    }
    val h = hull.toArray
    val hullArea2 = math.abs(h.indices.map { i =>
      val (x1, y1) = h(i); val (x2, y2) = h((i + 1) % h.length)
      x1 * y2 - x2 * y1
    }.sum)
    assert(area2 == hullArea2 && area2 > 0)
  }

  test("collinear points produce no triangles; duplicates are dropped") {
    val line = Array((0.5, 0.5), (1.5, 1.5), (2.5, 2.5), (3.5, 3.5))
    assert(Delaunay.triangulate(line).isEmpty)
    val dup = Array((0.5, 0.5), (0.5, 0.5), (4.5, 0.5), (0.5, 4.5))
    val tris = Delaunay.triangulate(dup)
    assert(tris.length == 1)
    // the duplicate resolves to the FIRST original index
    assert(tris.head == ((0, 2, 3)))
  }

  test("almost-collinear hull triples stay true Delaunay (r19 far super-triangle)") {
    // (0.5,0.5)-(100.5,1.5)-(200.5,3.5) has a circumradius ~10^6 x the
    // data span: a span-sized super-triangle sits INSIDE it and
    // deviates the hull faces; the provably-far placement may not.
    val pts = Array(
      (0.5, 0.5), (100.5, 1.5), (200.5, 3.5),
      (50.5, 40.5), (150.5, 60.5), (100.5, 80.5), (30.5, 70.5))
    val tris = Delaunay.triangulate(pts)
    assert(tris.nonEmpty)
    for ((a, b, c) <- tris; (p, i) <- pts.zipWithIndex
         if i != a && i != b && i != c) {
      assert(inCircle(pts(a), pts(b), pts(c), p) <= 0,
        s"point $i inside circumcircle of ($a,$b,$c)")
    }
    // the near-collinear bottom chain must appear as hull EDGES (a
    // deviated triangulation drops the middle vertex from the hull
    // fan): vertex 1 is used by some triangle
    assert(tris.exists { case (a, b, c) => a == 1 || b == 1 || c == 1 })
  }

  test("orient survives coordinates past the Long bound (r19 BigInt widen)") {
    // scaled coords ~1.5e9 put 8M^2 past 2^63: the Long cross product
    // would overflow and could drop valid triangles as degenerate
    val base = 1.5e7
    val pts = Array(
      (base + 0.25, base + 0.25), (base + 100.25, base + 0.5),
      (base + 50.5, base + 90.25), (base + 120.75, base + 40.75))
    val tris = Delaunay.triangulateScaled(pts, 100L)
    assert(tris.length == 2)
    // independent BigInt Delaunay check at the same scale
    def d(v: (Double, Double)) =
      (BigInt(math.rint(v._1 * 100).toLong), BigInt(math.rint(v._2 * 100).toLong))
    for ((a, b, c) <- tris; (p, i) <- pts.zipWithIndex
         if i != a && i != b && i != c) {
      val (px0, py0) = d(p)
      val Seq((ax, ay), (bx, by), (cx, cy)) =
        Seq(pts(a), pts(b), pts(c)).map(d).map { case (x, y) => (x - px0, y - py0) }
      val (a2, b2, c2) = (ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy)
      val det = ax * (by * c2 - b2 * cy) - ay * (bx * c2 - b2 * cx) + a2 * (bx * cy - by * cx)
      val orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
      assert((if (orient < 0) -det else det) <= 0,
        s"point $i inside circumcircle of ($a,$b,$c)")
    }
  }

  test("rejects non-half-integral coordinates") {
    val e = intercept[IllegalArgumentException] {
      Delaunay.triangulate(Array((0.3, 0.5), (1.5, 0.5), (0.5, 1.5)))
    }
    assert(e.getMessage.contains("half-integral"))
  }
}
