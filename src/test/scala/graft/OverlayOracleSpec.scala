package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.vector.{Overlay, Polygon}

/** Boundary-safety audit for the r16 concave-overlay oracles.
  *
  * q_buffer_concave's DuckDB twin decides point-in-union with STRICT
  * half-plane tests over the buffer pieces, while the engine decides
  * with the ray-cast mask expression. Both verdicts agree whenever no
  * grid cell center sits near a piece boundary — this spec proves the
  * decision margin for EVERY center x piece pair, and that the two
  * predicates (half-plane AND vs ray cast) agree everywhere on the
  * grid (the LibmBoundarySpec discipline applied to geometry).
  */
class OverlayOracleSpec extends AnyFunSuite {

  private def decisionMargin(p: Polygon, px: Double, py: Double): Double = {
    // CCW-normalized min edge cross product, scaled per-edge to a
    // DISTANCE so the margin is in grid units
    val e0 = p.exterior
    val ring = if (Overlay.signedArea2(e0) >= 0) e0 else e0.reverse
    val n = ring.length
    var m = Double.MaxValue
    var i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      val len = math.hypot(b.x - a.x, b.y - a.y)
      val c = ((b.x - a.x) * (py - a.y) - (b.y - a.y) * (px - a.x)) / len
      if (c < m) m = c
      i += 1
    }
    m // > 0 strictly inside, < 0 outside; |m| = distance-scale margin
  }

  test("every grid center clears every buffer piece boundary by > 1e-6") {
    val pieces = SparkEntry.bufferConcavePieces
    assert(pieces.nonEmpty && pieces.length < 64, pieces.length)
    var worst = Double.MaxValue
    var y = 0
    while (y < 256) {
      var x = 0
      while (x < 256) {
        val px = x + 0.5; val py = y + 0.5
        pieces.foreach { p =>
          val m = math.abs(decisionMargin(p, px, py))
          if (m < worst) worst = m
        }
        x += 1
      }
      y += 1
    }
    assert(worst > 1e-6, s"cell center within $worst of a piece boundary " +
      "- the strict-> oracle and the ray-cast mask could disagree")
  }

  test("half-plane verdict == ray-cast verdict for every center and piece") {
    val pieces = SparkEntry.bufferConcavePieces
    var disagreements = 0
    var y = 0
    while (y < 256) {
      var x = 0
      while (x < 256) {
        val px = x + 0.5; val py = y + 0.5
        pieces.foreach { p =>
          if ((decisionMargin(p, px, py) > 0) != p.contains(px, py))
            disagreements += 1
        }
        x += 1
      }
      y += 1
    }
    assert(disagreements == 0)
  }

  test("line-buffer pieces: every grid center clears every boundary; verdicts agree") {
    val pieces = SparkEntry.bufferLinePieces
    assert(pieces.nonEmpty && pieces.length < 64, pieces.length)
    var worst = Double.MaxValue
    var disagreements = 0
    var y = 0
    while (y < 256) {
      var x = 0
      while (x < 256) {
        val px = x + 0.5; val py = y + 0.5
        pieces.foreach { p =>
          val m = decisionMargin(p, px, py)
          if (math.abs(m) < worst) worst = math.abs(m)
          if ((m > 0) != p.contains(px, py)) disagreements += 1
        }
        x += 1
      }
      y += 1
    }
    assert(worst > 1e-6, s"cell center within $worst of a line-buffer piece boundary")
    assert(disagreements == 0)
  }

  test("erode pieces (interior + corridor): margins clear, verdicts agree") {
    val (keep, drop) = SparkEntry.erodeConcavePieces
    assert(keep.nonEmpty && drop.nonEmpty && keep.length + drop.length < 80,
      s"${keep.length}+${drop.length}")
    var worst = Double.MaxValue
    var disagreements = 0
    var y = 0
    while (y < 256) {
      var x = 0
      while (x < 256) {
        val px = x + 0.5; val py = y + 0.5
        (keep ++ drop).foreach { p =>
          val m = decisionMargin(p, px, py)
          if (math.abs(m) < worst) worst = math.abs(m)
          if ((m > 0) != p.contains(px, py)) disagreements += 1
        }
        x += 1
      }
      y += 1
    }
    assert(worst > 1e-6, s"cell center within $worst of an erode piece boundary " +
      "- the strict-> oracle (negated on the corridor side) and the mask could disagree")
    assert(disagreements == 0)
  }

  test("dissolve fixtures: simple rings, genuine in-group overlap") {
    SparkEntry.dissolveFixtures.foreach { case (key, pid, xs, ys) =>
      val ring = xs.zip(ys).map { case (x, y) => graft.vector.Pt(x, y) }.toIndexedSeq
      assert(Overlay.isSimple(ring), s"dissolve member $key/$pid not simple")
    }
    SparkEntry.dissolveFixtures.groupBy(_._1).foreach { case (key, members) =>
      val polys = members.sortBy(_._2).map { case (_, _, xs, ys) =>
        Polygon(xs.zip(ys).map { case (x, y) => graft.vector.Pt(x, y) }.toIndexedSeq)
      }
      val sumAreas = polys.map(Overlay.area).sum
      val union = Overlay.unionAreaAll(polys)
      assert(union < sumAreas - 1.0,
        s"group $key members don't overlap (union $union vs sum $sumAreas) " +
          "- the fixture must exercise inclusion-exclusion")
      assert(union > polys.map(Overlay.area).max - 1e-9, s"group $key union too small")
    }
  }

  test("concave star fixtures are simple and genuinely concave; cross clip too") {
    SparkEntry.concaveFixtures.foreach { case (pid, xs, ys) =>
      val ring = xs.zip(ys).map { case (x, y) => graft.vector.Pt(x, y) }.toIndexedSeq
      assert(Overlay.isSimple(ring), s"star $pid not simple")
      // a 5-point star has 5 reflex vertices
      val n = ring.length
      val ccw = if (Overlay.signedArea2(ring) >= 0) ring else ring.reverse
      val reflex = (0 until n).count { i =>
        val a = ccw((i + n - 1) % n); val b = ccw(i); val c = ccw((i + 1) % n)
        (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x) < 0
      }
      assert(reflex == 5, s"star $pid reflex=$reflex")
    }
    assert(Overlay.isSimple(SparkEntry.crossClip.exterior))
    // every star intersects the cross clip (the oracle has 10 rows)
    SparkEntry.concaveFixtures.foreach { case (pid, xs, ys) =>
      val p = Polygon(xs.zip(ys).map { case (x, y) => graft.vector.Pt(x, y) }.toIndexedSeq)
      assert(Overlay.intersectionArea(p, SparkEntry.crossClip) >= 0, s"star $pid")
    }
  }
}
