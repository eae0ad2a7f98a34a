package graft.raster

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

class RasterizeSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  test("fromWktTable burns features parsed in the executors") {
    val feats = Seq(
      ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 1.0),
      // overlapping square with larger value wins under Max
      ("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))", 2.0),
      // multipolygon member away from the others
      ("MULTIPOLYGON (((6 6, 8 6, 8 8, 6 8, 6 6)))", 3.0)
    ).toDF("wkt", "v")
    val got = Rasterize.fromWktTable(feats, layout)
      .toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(got((0L, 0L)) == 1.0)
    assert(got((3L, 3L)) == 2.0) // overlap -> Max
    assert(got((5L, 5L)) == 2.0)
    assert(got((7L, 7L)) == 3.0)
    assert(!got.contains((7L, 0L)))
    assert(got.size == 16 + 16 + 4 - 4) // union minus the 2x2 overlap
  }

  test("fromWktTable honors holes") {
    val feats = Seq(
      ("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2))", 1.0)
    ).toDF("wkt", "v")
    val got = Rasterize.fromWktTable(feats, layout)
      .toCells.as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) }.toSet
    assert(got.contains((0L, 0L)) && got.contains((7L, 7L)))
    assert(!got.contains((3L, 3L))) // hole
    assert(got.size == 64 - 16)
  }

  test("traverse visits exactly the cells a segment passes through") {
    // brute-force check: a cell is touched iff the segment intersects
    // its (closed) square — sampled densely along the parameter
    def brute(x0: Double, y0: Double, x1: Double, y1: Double): Set[(Long, Long)] =
      (0 to 100000).map { i =>
        val t = i / 100000.0
        (math.floor(x0 + t * (x1 - x0)).toLong, math.floor(y0 + t * (y1 - y0)).toLong)
      }.toSet
    val cases = Seq(
      (0.5, 0.5, 7.3, 2.9),   // shallow oblique
      (1.2, 6.8, 6.9, 0.4),   // steep downward
      (0.5, 3.5, 7.5, 3.5),   // horizontal
      (4.5, 0.5, 4.5, 7.5),   // vertical
      (2.5, 2.5, 2.5, 2.5))   // degenerate point
    cases.foreach { case (x0, y0, x1, y1) =>
      val got = Rasterize.traverse(x0, y0, x1, y1, 8, 8).toSet
      assert(got == brute(x0, y0, x1, y1), s"segment ($x0,$y0)-($x1,$y1)")
    }
    // clipping: cells outside the grid never appear
    assert(Rasterize.traverse(-2.5, 3.5, 3.5, 3.5, 8, 8).toSet ==
      Set((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("fromWktFeatures dispatches on geometry kind") {
    val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))
    val feats = Seq(
      ("LINESTRING (0.5 0.5, 3.5 0.5)", 1.0),
      ("POINT (6.5 6.5)", 2.0),
      ("MULTIPOINT ((1.5 6.5), (2.5 6.5))", 3.0),
      ("POLYGON ((4.7 4.7, 6.3 4.7, 6.3 6.3, 4.7 6.3, 4.7 4.7))", 4.0)
    ).toDF("wkt", "v")
    val got = Rasterize.fromWktFeatures(feats, layout).toCells
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert((0L to 3L).forall(x => got.get((x, 0L)).contains(1.0)))
    assert(got((6L, 6L)) == 2.0) // point burn; polygon stops at 6.3 < center 6.5
    assert(got((1L, 6L)) == 3.0 && got((2L, 6L)) == 3.0)
    assert(got((5L, 5L)) == 4.0)
  }
}
