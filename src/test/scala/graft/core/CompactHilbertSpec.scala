package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Compact Hilbert index (Hamilton CS-2006-07 — the curve geotrellis
  * reaches through uzaygezen for its `hilbert` key-index type).
  *
  * Validation strategy, since the uzaygezen jar itself cannot run in
  * this sandbox: (1) the equal-order 2-D specialization must reproduce
  * the CLASSIC Lam–Shapiro Hilbert curve ([[ZIndex.hilbert]] — an
  * INDEPENDENT table-driven formulation already in the repo) index-for-
  * index at every order — two unrelated formulations agreeing on 4^m
  * points pins the orientation and the (entry, direction) update rules;
  * (2) the unequal-width index must be BIJECTIVE onto [0, 2^Σm) and
  * ORDER-ISOMORPHIC to the standard index — the report's defining
  * property of compact indices (Theorem 2.7); (3) unit-step adjacency
  * (the Hilbert property) on equal-width grids; (4) the hand-derived
  * order-1 table from the report's formulas. */
class CompactHilbertSpec extends AnyFunSuite {

  test("order-1 worked example: gc/entry/direction formulas by hand") {
    // n=2, m=(1,1), initial (e,d) = (0, 2 mod 2 = 0). Level i=0:
    // l = row<<1 | col; T = ror(l ^ 0, 1); w = gc^-1(T); h = w.
    //   (0,0): l=00 -> ror1(00)=00 -> w=0
    //   (0,1): l=10 -> ror1(10)=01 -> w=gcInv(01)=1
    //   (1,1): l=11 -> ror1(11)=11 -> w=gcInv(11)=2
    //   (1,0): l=01 -> ror1(01)=10 -> w=gcInv(10)=3
    val ms = IndexedSeq(1, 1)
    assert(CompactHilbert.index(ms, IndexedSeq(0L, 0L)) == 0L)
    assert(CompactHilbert.index(ms, IndexedSeq(0L, 1L)) == 1L)
    assert(CompactHilbert.index(ms, IndexedSeq(1L, 1L)) == 2L)
    assert(CompactHilbert.index(ms, IndexedSeq(1L, 0L)) == 3L)
  }

  test("equal orders reproduce the independent Lam-Shapiro formulation exactly") {
    for (m <- 1 to 6) {
      val ms = IndexedSeq(m, m)
      var x = 0L
      while (x < (1L << m)) {
        var y = 0L
        while (y < (1L << m)) {
          assert(CompactHilbert.index(ms, IndexedSeq(x, y)) == ZIndex.hilbert(x, y, m),
            s"divergence at ($x, $y) order $m")
          y += 1
        }
        x += 1
      }
    }
  }

  test("equal orders: bijective with unit-step adjacency (the Hilbert property)") {
    val m = 5
    val ms = IndexedSeq(m, m)
    val n = 1 << m
    val byIndex = new Array[(Long, Long)](n * n)
    for (x <- 0L until n; y <- 0L until n) {
      val h = CompactHilbert.index(ms, IndexedSeq(x, y)).toInt
      assert(byIndex(h) == null, s"index $h hit twice")
      byIndex(h) = (x, y)
    }
    (0 until n * n - 1).foreach { i =>
      val (x0, y0) = byIndex(i)
      val (x1, y1) = byIndex(i + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"step $i -> ${i + 1} jumps from ($x0,$y0) to ($x1,$y1)")
    }
  }

  test("unequal widths: bijective and order-isomorphic to the standard index") {
    for (ms <- Seq(IndexedSeq(2, 4), IndexedSeq(4, 2), IndexedSeq(1, 5),
      IndexedSeq(3, 2))) {
      val pts = for (x <- 0L until (1L << ms(0)); y <- 0L until (1L << ms(1)))
        yield (x, y)
      val compact = pts.map(p => CompactHilbert.index(ms, IndexedSeq(p._1, p._2)))
      // bijective onto [0, 2^(m0+m1))
      assert(compact.sorted == (0L until (1L << (ms(0) + ms(1)))).toIndexedSeq,
        s"not bijective for $ms")
      // order-isomorphic to the full-cube standard curve (Theorem 2.7:
      // a compact index is the RANK of the standard one over the box)
      val mMax = ms.max
      val standard = pts.map(p =>
        CompactHilbert.index(IndexedSeq(mMax, mMax), IndexedSeq(p._1, p._2)))
      assert(pts.sortBy(p => compact(pts.indexOf(p))) ==
        pts.sortBy(p => standard(pts.indexOf(p))), s"order broken for $ms")
    }
  }

  test("three dimensions: bijective (the space-time shape)") {
    val ms = IndexedSeq(2, 3, 1)
    val vals = for (x <- 0L until 4L; y <- 0L until 8L; t <- 0L until 2L)
      yield CompactHilbert.index(ms, IndexedSeq(x, y, t))
    assert(vals.sorted == (0L until 64L).toIndexedSeq)
  }

  test("contract failures are loud") {
    intercept[IllegalArgumentException] { // coordinate exceeds its width
      CompactHilbert.index(IndexedSeq(2, 2), IndexedSeq(4L, 0L))
    }
    intercept[IllegalArgumentException] { // one dimension
      CompactHilbert.index(IndexedSeq(4), IndexedSeq(1L))
    }
    intercept[IllegalArgumentException] { // over 62 total bits
      CompactHilbert.index(IndexedSeq(32, 31), IndexedSeq(0L, 0L))
    }
    assert(CompactHilbert.resolutionFor(0) == 1)
    assert(CompactHilbert.resolutionFor(1) == 1)
    assert(CompactHilbert.resolutionFor(2) == 2)
    assert(CompactHilbert.resolutionFor(255) == 8)
    assert(CompactHilbert.resolutionFor(256) == 9)
  }
}
