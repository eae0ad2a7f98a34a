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
}
