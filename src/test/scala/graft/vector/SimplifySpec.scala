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

  test("simplifyLines: maxVertices ceiling fails loudly") {
    val rows = (1 to 5).map(i => (0L, i.toLong, i + 0.5, 0.5)).toDF("fid", "pid", "px", "py")
    val e = intercept[org.apache.spark.SparkException](
      Simplify.simplifyLines(rows, 4.0, maxVertices = 3).collect())
    assert(e.getMessage.contains("maxVertices") ||
      Option(e.getCause).exists(_.getMessage.contains("maxVertices")))
  }
}
