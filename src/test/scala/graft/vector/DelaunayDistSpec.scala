package graft.vector

import graft.SparkSpec

/** Distributed Delaunay (the past-MaxSitesDual scale path): the
  * local-star + exact-certificate construction must reproduce the
  * driver Bowyer-Watson exactly on general-position inputs, resolve
  * cocircular degeneracies canonically, and honor the degenerate /
  * guard contracts. */
class DelaunayDistSpec extends SparkSpec {
  import spark.implicits._

  private def dist(pts: Seq[(Long, Double, Double)], scale: Long): Set[(Long, Long, Long)] =
    DelaunayDist.triangulate(spark, pts.toDF("id", "x", "y"), scale)
      .as[(Long, Long, Long)].collect().toSet

  private def driver(pts: Seq[(Long, Double, Double)], scale: Long): Set[(Long, Long, Long)] = {
    val arr = pts.map(p => (p._2, p._3)).toArray
    val ids = pts.map(_._1).toArray
    Delaunay.triangulateScaled(arr, scale).map { case (a, b, c) =>
      val s = Array(ids(a), ids(b), ids(c)).sorted
      (s(0), s(1), s(2))
    }.toSet
  }

  test("q_voronoi fixture (10 sites, scale 100): dist == driver") {
    val pts = (1 to 10).map(k =>
      (k.toLong, (k * 13 % 256) + 0.31, (k * 29 % 256) + 0.74))
    val d = dist(pts, 100L)
    assert(d == driver(pts, 100L))
    assert(d.nonEmpty)
  }

  test("1,500 pseudo-random general-position sites: dist == driver across buckets") {
    // two-decimal offsets, coords < 140 so scale-100 integers stay on
    // the driver's Long fast path; dedup keeps the fixture honest
    val raw = (0 until 1700).map { i =>
      ((i * 7919 % 139) + ((i * 31 + 7) % 97) / 100.0,
        (i * 104729 % 139) + ((i * 53 + 11) % 97) / 100.0)
    }.distinct.take(1500)
    val pts = raw.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val d = dist(pts, 100L)
    val drv = driver(pts, 100L)
    assert(d == drv, s"dist ${d.size} vs driver ${drv.size} triangles")
    // Euler sanity: n sites, h hull vertices -> 2n - h - 2 triangles
    val h = Hull.chain(pts.map(p =>
      (math.rint(p._2 * 100).toLong, math.rint(p._3 * 100).toLong)).toArray).length
    assert(d.size >= 2 * pts.length - h - 2 - 8 && d.size <= 2 * pts.length)
  }

  test("cocircular square resolves as the canonical fan from the lex-min point") {
    // ids chosen so id order != lex coordinate order
    val pts = Seq((0L, 0.0, 0.0), (1L, 0.0, 2.0), (2L, 2.0, 0.0), (3L, 2.0, 2.0))
    val d = dist(pts, 1L)
    // fan from (0,0): CCW ring (0,0)-(2,0)-(2,2)-(0,2) -> triangles
    // {0,2,3} and {0,1,3} — deterministic regardless of which diagonal
    // the driver's insertion order would pick
    assert(d == Set((0L, 2L, 3L), (0L, 1L, 3L)))
  }

  test("cocircular square embedded in a general-position cloud") {
    // a perfect square (circumcircle radius sqrt(2)) with the
    // surrounding cloud cleared off its circumcircle; away from the
    // square both paths agree exactly, on it the fan is canonical
    val square = Seq((9000L, 50.0, 50.0), (9001L, 50.0, 52.0),
      (9002L, 52.0, 50.0), (9003L, 52.0, 52.0))
    val cloud = (0 until 900).map { i =>
      ((i * 7919 % 103) + ((i * 31 + 7) % 97) / 100.0,
        (i * 104729 % 103) + ((i * 53 + 11) % 97) / 100.0)
    }.distinct
      .filter { case (x, y) =>
        val dx = x - 51.0; val dy = y - 51.0
        dx * dx + dy * dy > 9.0 // clear of the square's circumcircle
      }
    val pts = square ++ cloud.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val d = dist(pts, 100L)
    val squareIds = square.map(_._1).toSet
    val fan = d.filter { case (a, b, c) =>
      squareIds(a) && squareIds(b) && squareIds(c) }
    assert(fan == Set((9000L, 9002L, 9003L), (9000L, 9001L, 9003L)))
    val drv = driver(pts, 100L)
    val drvRest = drv.filterNot { case (a, b, c) =>
      squareIds(a) && squareIds(b) && squareIds(c) }
    val dRest = d.filterNot { case (a, b, c) =>
      squareIds(a) && squareIds(b) && squareIds(c) }
    assert(dRest == drvRest)
  }

  test("ring expansion: sparse outliers around a dense core certify after doubling") {
    // a dense 20x20 core plus far-flung outliers: the outliers' star
    // triangles have circumdisks far wider than one bucket ring
    // (buckets are sized by global density), so their sites must fail
    // the disk certificate at k=1 and re-gather at k=2,4,... — the
    // multi-round path — and still reproduce the driver exactly
    val core = for (i <- 0 until 20; j <- 0 until 20)
      yield (i * 1.0 + (i * 7 + j * 3) % 10 / 100.0,
        j * 1.0 + (i * 5 + j * 11) % 10 / 100.0)
    val far = Seq((400.0, 400.0), (420.0, 7.0), (3.0, 390.0), (410.0, 200.0))
    val pts = (core ++ far).distinct.zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, x, y) }
    val d = dist(pts, 100L)
    assert(d == driver(pts, 100L))
  }

  test("collinear input yields zero triangles; tiny inputs too") {
    val line = (0 until 50).map(i => (i.toLong, i.toDouble, 2.0 * i))
    assert(dist(line, 1L).isEmpty)
    assert(dist(Seq((0L, 1.0, 1.0), (1L, 2.0, 5.0)), 1L).isEmpty)
  }

  test("guards: duplicate sites and non-integral coordinates fail loudly") {
    val dup = Seq((0L, 1.0, 1.0), (1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 5.0, 1.0))
    val e1 = intercept[Exception] { dist(dup, 1L) }
    assert(e1.getMessage.contains("duplicate sites"))
    val bad = Seq((0L, 1.005, 1.0), (1L, 2.0, 3.0), (2L, 5.0, 1.0))
    val e2 = intercept[Exception] { dist(bad, 10L) }
    assert(e2.getMessage.contains("not integral"))
  }

  test("cells(): distributed clip labels every audit center like the all-pairs path") {
    val pts = (1 to 10).map(k =>
      (k.toLong, (k * 13 % 256) + 0.31, (k * 29 % 256) + 0.74))
    val got = DelaunayDist.cells(spark, pts.toDF("id", "x", "y"),
        100L, 0, 0, 256, 256)
      .as[(Long, Seq[Double], Seq[Double])].collect()
      .map { case (id, xs, ys) =>
        id -> Polygon(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq) }
      .toMap
    val want = Voronoi.cells(
      pts.map(p => Pt(p._2, p._3)).toIndexedSeq, 0, 0, 256, 256)
      .map { case (i, p) => pts(i)._1 -> p }.toMap
    assert(got.keySet == want.keySet)
    // sparse audit grid: every probed center lands in the same cell
    for (x <- 0 until 256 by 3; y <- 0 until 256 by 3) {
      val cx = x + 0.5; val cy = y + 0.5
      def label(cs: Map[Long, Polygon]): Long =
        cs.collectFirst { case (i, p) if p.contains(cx, cy) => i }.getOrElse(-1L)
      assert(label(got) == label(want), s"($cx,$cy)")
    }
  }

  test("neighbors() matches the driver neighbor lists") {
    val pts = (1 to 10).map(k =>
      (k.toLong, (k * 13 % 256) + 0.31, (k * 29 % 256) + 0.74))
    val tri = DelaunayDist.triangulate(spark, pts.toDF("id", "x", "y"), 100L)
    val got = DelaunayDist.neighbors(tri).as[(Long, Long)].collect().toSet
    val nbr = Delaunay.neighborsScaled(pts.map(p => (p._2, p._3)).toArray, 100L)
    val ids = pts.map(_._1).toArray
    val want = nbr.zipWithIndex.flatMap { case (ns, i) =>
      ns.map { j =>
        val (u, v) = (ids(i), ids(j)); if (u < v) (u, v) else (v, u)
      }
    }.toSet
    assert(got == want)
  }
}
