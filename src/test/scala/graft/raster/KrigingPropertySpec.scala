package graft.raster

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the kriging fit: for random sample sets
  * the unpivoted elimination must actually solve the covariance
  * system (no pivoting is safe because the matrix is PD). */
class KrigingPropertySpec extends AnyFunSuite {

  private val ptsGen: Gen[Array[(Double, Double, Double)]] = for {
    n <- Gen.choose(2, 8)
    // distinct integral coords on a 32-grid; moderate z values
    coords <- Gen.pick(n, for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
    zs <- Gen.listOfN(n, Gen.choose(-1000, 1000))
  } yield coords.zip(zs).map { case ((x, y), z) => (x.toDouble, y.toDouble, z.toDouble) }.toArray

  test("solved weights satisfy (C + nugget I) b = z for random samples") {
    val (rng, nug) = (24.0, 0.01)
    val p = Prop.forAll(ptsGen) { pts =>
      val b = Interpolate.krigingWeights(pts, rng, nug)
      pts.indices.forall { i =>
        val lhs = pts.indices.map { j =>
          val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
          val c = Interpolate.sphericalCov(math.sqrt(dx * dx + dy * dy), rng)
          (if (i == j) c + nug else c) * b(j)
        }.sum
        math.abs(lhs - pts(i)._3) < 1e-6 * math.max(1.0, math.abs(pts(i)._3))
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  test("ordinary kriging: augmented system solved, dual weights sum to zero") {
    val (rng, nug) = (24.0, 0.01)
    val p = Prop.forAll(ptsGen) { pts =>
      val n = pts.length
      val b = Interpolate.ordinaryKrigingWeights(pts, rng, nug)
      // rows 0..n-1: C b + 1 a = z
      val rowsOk = pts.indices.forall { i =>
        val lhs = pts.indices.map { j =>
          val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
          val c = Interpolate.sphericalCov(math.sqrt(dx * dx + dy * dy), rng)
          (if (i == j) c + nug else c) * b(j)
        }.sum + b(n)
        math.abs(lhs - pts(i)._3) < 1e-6 * math.max(1.0, math.abs(pts(i)._3))
      }
      // row n: the unbiasedness constraint in dual form, sum(b) = 0
      rowsOk && math.abs(pts.indices.map(b).sum) < 1e-6
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  test("ordinary kriging reproduces a constant field exactly (b = 0, a = c)") {
    val pts = Array((1.0, 1.0, 42.0), (9.0, 2.0, 42.0), (4.0, 7.0, 42.0), (12.0, 12.0, 42.0))
    val b = Interpolate.ordinaryKrigingWeights(pts, 24.0, 0.01)
    pts.indices.foreach(i => assert(math.abs(b(i)) < 1e-9))
    assert(math.abs(b(pts.length) - 42.0) < 1e-9)
  }

  test("weights are permutation-covariant: reordering samples reorders b") {
    val pts = Array((1.0, 1.0, 10.0), (9.0, 2.0, -20.0), (4.0, 7.0, 35.0), (12.0, 12.0, 5.0))
    val b = Interpolate.krigingWeights(pts, 24.0, 0.01)
    val perm = Array(2, 0, 3, 1)
    val b2 = Interpolate.krigingWeights(perm.map(pts), 24.0, 0.01)
    // same linear system up to row/col permutation -> same solution
    // values attached to the same points (within elimination noise)
    perm.zipWithIndex.foreach { case (orig, at) =>
      assert(math.abs(b2(at) - b(orig)) < 1e-8, s"point $orig")
    }
  }
}
