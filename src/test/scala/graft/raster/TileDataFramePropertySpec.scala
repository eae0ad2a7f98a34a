package graft.raster

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Extent, LayoutDefinition, TileLayout}

/** Property-based roundtrip checks for the RasterFrames-style tile
  * DataFrame interop (random sparse layers, both overloads). */
class TileDataFramePropertySpec extends AnyFunSuite {

  private val layout = LayoutDefinition(Extent(0, 0, 16, 16), TileLayout(4, 4, 4, 4))

  private val cellsGen: Gen[Map[(Long, Long), Double]] =
    Gen.nonEmptyMap(Gen.zip(
      Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)),
      Gen.choose(-100, 100).map(_.toDouble)))

  test("explicit-layout roundtrip preserves every cell of a random sparse layer") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val p = Prop.forAll(cellsGen) { cells =>
      val df = cells.toSeq.map { case ((x, y), v) => (x, y, v) }.toDF("x", "y", "v")
      val l = RasterLayer.fromCells(df, layout)
      val rt = RasterLayer.fromTileDataFrame(l.toTileDataFrame, layout)
      val got = rt.toCells.as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      got == cells
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(r.passed, r.status.toString)
  }

  test("per-tile extents tile the world exactly: union area == layout area") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // fully dense layer -> all 16 tiles present; extents must partition
    // the world extent (sum of areas equal, no overlaps via distinct)
    val dense = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y, 1.0))
      .toDF("x", "y", "v")
    val rf = RasterLayer.fromCells(dense, layout).toTileDataFrame
    val exts = rf.select("extent.xmin", "extent.ymin", "extent.xmax", "extent.ymax")
      .as[(Double, Double, Double, Double)].collect()
    assert(exts.length == 16 && exts.distinct.length == 16)
    val area = exts.map { case (x0, y0, x1, y1) => (x1 - x0) * (y1 - y0) }.sum
    assert(area == 16.0 * 16.0)
    assert(exts.forall { case (x0, y0, x1, y1) =>
      x0 >= 0 && y0 >= 0 && x1 <= 16 && y1 <= 16 && x1 - x0 == 4.0 && y1 - y0 == 4.0 })
  }
}
