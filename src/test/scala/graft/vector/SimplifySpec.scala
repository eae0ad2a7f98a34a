package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimplifySpec extends SparkSpec {
  import spark.implicits._

  test("dpKeep: endpoints always, spike above eps kept, wiggle below eps dropped") {
    // doubled coords; eps 4.0 -> e2 = 64
    val flatLine = IndexedSeq((1L, 1L), (3L, 1L), (5L, 1L), (7L, 1L), (9L, 1L))
    assert(Simplify.dpKeep(flatLine, 4.0).toSeq ==
      Seq(true, false, false, false, true))
    val spike = IndexedSeq((1L, 1L), (3L, 1L), (5L, 11L), (7L, 1L), (9L, 1L))
    assert(Simplify.dpKeep(spike, 4.0).toSeq ==
      Seq(true, false, true, false, true))
    // degenerate: identical endpoints, interior point beyond eps kept
    val loop = IndexedSeq((1L, 1L), (1L, 20L), (1L, 1L))
    assert(Simplify.dpKeep(loop, 4.0).toSeq == Seq(true, true, true))
    assert(Simplify.dpKeep(IndexedSeq.empty, 4.0).isEmpty)
  }

  test("simplifyLines: per-feature DP over pid order, kept rows only") {
    val rows = Seq(
      (0L, 1L, 0.5, 0.5), (0L, 2L, 1.5, 0.5), (0L, 3L, 2.5, 5.5),
      (0L, 4L, 3.5, 0.5), (0L, 5L, 4.5, 0.5),
      (1L, 6L, 0.5, 0.5), (1L, 7L, 1.5, 0.5), (1L, 8L, 2.5, 0.5))
      .toDF("fid", "pid", "px", "py")
    val out = Simplify.simplifyLines(rows, eps = 4.0)
      .as[(Long, Long, Double, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(out == Set((0L, 1L), (0L, 3L), (0L, 5L), (1L, 6L), (1L, 8L)))
    // keptPids (the oracle twin) agrees with the distributed path
    assert(Simplify.keptPids(Seq((1L, 0.5, 0.5), (2L, 1.5, 0.5), (3L, 2.5, 5.5),
      (4L, 3.5, 0.5), (5L, 4.5, 0.5)), 4.0) == Seq(1L, 3L, 5L))
  }

  test("property: every removed vertex lies within eps of its bracketing kept chord") {
    val eps = 4.0
    for (seed <- 1 to 5) {
      val pts = (0 until 60).map { i =>
        val r = (i * 2654435761L + seed * 97L) & 0xffffffffL
        (i.toLong * 8 + 1, ((r % 61).toLong * 2 + 1)) // x strictly increasing, doubled coords
      }.toIndexedSeq
      val keep = Simplify.dpKeep(pts, eps)
      assert(keep.head && keep.last)
      val keptIdx = pts.indices.filter(keep)
      // for each removed vertex, find its bracketing kept pair and
      // check the perpendicular line distance <= eps (doubled: 2 eps)
      pts.indices.filterNot(keep).foreach { i =>
        val lo = keptIdx.filter(_ < i).max
        val hi = keptIdx.filter(_ > i).min
        val (ax, ay) = pts(lo); val (bx, by) = pts(hi)
        val dx = bx - ax; val dy = by - ay
        val c = dx * (pts(i)._2 - ay) - dy * (pts(i)._1 - ax)
        val dist2Doubled = c.toDouble * c / (dx * dx + dy * dy)
        assert(dist2Doubled <= 4.0 * eps * eps + 1e-9,
          s"seed $seed vertex $i deviates ${math.sqrt(dist2Doubled) / 2} > $eps")
      }
      // tighter eps never keeps fewer vertices
      val keepTight = Simplify.dpKeep(pts, 1.0)
      assert(keepTight.count(identity) >= keep.count(identity))
    }
  }

  test("vwKeep: endpoints always; collinear drops first; spike area gates the drop") {
    // doubled coords; minArea in ORIGINAL units (|cross| < 8·minArea drops)
    val flatLine = IndexedSeq((0L, 0L), (2L, 0L), (4L, 0L), (6L, 0L))
    assert(Simplify.vwKeep(flatLine, 1.0).toSeq == Seq(true, false, false, true))
    // spike at (4, 10): its flank vertices drop first (area 2.5 each),
    // after which the spike's effective triangle (0,0)(4,10)(8,0) has
    // cross 80 = 8·10 -> survives minArea ≤ 10, drops past it
    val spike = IndexedSeq((0L, 0L), (2L, 0L), (4L, 10L), (6L, 0L), (8L, 0L))
    assert(Simplify.vwKeep(spike, 4.0)(2), "area-10 spike survives minArea 4")
    assert(!Simplify.vwKeep(spike, 12.0)(2), "area-10 spike drops at minArea 12")
    // removal cascades: after the middle drops, its neighbors' areas
    // recompute against the NEW live neighbors
    val stair = IndexedSeq((0L, 0L), (2L, 1L), (4L, 0L), (6L, 1L), (8L, 0L))
    val k = Simplify.vwKeep(stair, 10.0)
    assert(k(0) && k(4) && !k(1) && !k(2) && !k(3))
  }

  test("vw kept set shrinks monotonically with minArea; engine == twin") {
    // the q_simplify_vw fixture: supplier walk + half-integral wobble
    // (without it the constant (13, 29) step is collinear everywhere)
    def coords(lo: Int, hi: Int): Seq[(Long, Double, Double)] =
      (lo to hi).map(i =>
        (i.toLong, (i * 13 % 256) + 0.5, (i * 29 % 256) + (i % 3) * 1.5 + 0.5))
    val keptSmall = Simplify.keptPidsVW(coords(1, 16), 1.0).toSet
    val keptBig = Simplify.keptPidsVW(coords(1, 16), 500.0).toSet
    assert(keptBig.subsetOf(keptSmall))
    assert(keptSmall.size > keptBig.size)
    assert(keptBig.size >= 2 && keptSmall.size < 16) // both genuinely simplify
    val lines = coords(1, 32).toDF("pid", "px", "py")
      .withColumn("fid", expr("(pid - 1) div 16"))
    val out = Simplify.simplifyLinesVW(lines, minArea = 30.0)
      .select("pid").as[Long].collect().toSet
    val twin = (Simplify.keptPidsVW(coords(1, 16), 30.0) ++
      Simplify.keptPidsVW(coords(17, 32), 30.0)).toSet
    assert(out == twin)
  }

  test("simplifyLines: maxVertices ceiling fails loudly") {
    val rows = (1 to 5).map(i => (0L, i.toLong, i + 0.5, 0.5)).toDF("fid", "pid", "px", "py")
    val e = intercept[org.apache.spark.SparkException](
      Simplify.simplifyLines(rows, 4.0, maxVertices = 3).collect())
    assert(e.getMessage.contains("maxVertices") ||
      Option(e.getCause).exists(_.getMessage.contains("maxVertices")))
  }
}
