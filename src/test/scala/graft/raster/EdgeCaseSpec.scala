package graft.raster

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

/** Degenerate-input behavior: empty layers, all-NoData tiles,
  * single-tile layouts, out-of-grid points. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))
  def empty: RasterLayer =
    RasterLayer.fromCells(Seq.empty[(Long, Long, Double)].toDF("x", "y", "v"), layout)

  test("empty layer: focal, pyramid, flatten, union all behave") {
    assert(empty.toCells.count() == 0)
    assert(empty.focal(Neighborhood.Square(1), "Mean").toCells.count() == 0)
    assert(Pyramid.levelUp(empty).toCells.count() == 0)
    val one = RasterLayer.fromCells(Seq((0L, 0L, 1.0)).toDF("x", "y", "v"), layout)
    assert(empty.union(one).aggregateByCell("Sum").toCells.count() == 1)
  }

  test("withNoData can blank a whole tile; stats skip it") {
    val l = RasterLayer.fromCells(
      Seq((0L, 0L, 7.0), (5L, 5L, 3.0)).toDF("x", "y", "v"), layout)
      .withNoData(7.0)
    assert(l.minMax() == (3.0, 3.0))
    assert(l.count() == 2) // tile row still exists, cells are NoData
    assert(l.toCells.count() == 1)
  }

  test("single-tile layout focal works without neighbors") {
    val tiny = LayoutDefinition(Extent(0, 0, 4, 4), TileLayout(1, 1, 4, 4))
    val l = RasterLayer.fromCells(Seq((1L, 1L, 4.0), (2L, 1L, 8.0)).toDF("x", "y", "v"), tiny)
    val f = l.focal(Neighborhood.Square(1), "Mean").toCells
      .as[(Long, Long, Double)].collect().toSet
    assert(f == Set((1L, 1L, 6.0), (2L, 1L, 6.0)))
  }

  test("point sampling outside the layer yields no rows") {
    val l = RasterLayer.fromCells(Seq((1L, 1L, 4.0)).toDF("x", "y", "v"), layout)
    val pts = Seq((1L, 100.5, 100.5), (2L, 3.5, 3.5)).toDF("pid", "px", "py")
    assert(ZonalOps.pointValues(l, pts).count() == 0)
  }

  test("terrain indices and fill on degenerate layers") {
    // empty layer -> empty outputs through the index branch too
    assert(empty.tri().toCells.count() == 0)
    assert(Hydrology.fill(empty).toCells.count() == 0)
    // a single isolated cell: no full window -> indices emit nothing,
    // fill passes the cell through
    val one = RasterLayer.fromCells(Seq((3L, 3L, 9.0)).toDF("x", "y", "v"), layout)
    assert(one.roughness().toCells.count() == 0)
    assert(one.curvature().toCells.count() == 0)
    val filled = Hydrology.fill(one).toCells.as[(Long, Long, Double)].collect()
    assert(filled.toSeq == Seq((3L, 3L, 9.0)))
  }

  test("costPath where the farthest reachable cell is a source emits one row") {
    // single data cell = the source itself: path is just (seq 0, source)
    val f = RasterLayer.fromCells(Seq((2L, 2L, 1.0)).toDF("x", "y", "v"), layout)
    val p = Distance.costPath(f, Seq((0L, 2.5, 2.5)).toDF("pid", "px", "py"))
      .as[(Long, Long, Long, Long)].collect()
    assert(p.toSeq == Seq((0L, 2L, 2L, 0L)))
  }

  test("cost distance with no reachable sources returns empty distances") {
    val l = RasterLayer.fromCells(Seq((1L, 1L, 4.0)).toDF("x", "y", "v"), layout)
    val far = Seq((1L, 100.5, 100.5)).toDF("pid", "px", "py")
    val d = Distance.costDistanceTiled(l, far).toCells
    assert(d.count() == 0)
  }
}
