package graft.raster

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

/** Hand-computed Expand/Shrink/Nibble fixtures, with every case
  * placed to straddle the 2x2 tile seam so the halo exchange is
  * exercised, not just the intra-tile scan. */
class MorphologySpec extends SparkSpec {
  import spark.implicits._

  // 8x8 grid, 4x4 tiles (2x2 layout); seam at x=4 / y=4
  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  def layer(cells: (Long, Long, Double)*): RasterLayer =
    RasterLayer.fromCells(cells.toSeq.toDF("x", "y", "v"), layout)

  def cellsOf(l: RasterLayer): Map[(Long, Long), Double] =
    l.toCells.as[(Long, Long, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap

  test("expand grows listed classes across the tile seam, priority by list order") {
    // class 3 at (3,3) sits one cell west of the seam; class 5 at
    // (5,3) one cell east. (4,3) touches BOTH -> priority class 3
    // wins. (6,3) touches only 5. (0,0) touches neither and keeps.
    val l = layer(
      (3L, 3L, 3.0), (5L, 3L, 5.0),
      (4L, 3L, 1.0), (6L, 3L, 1.0), (0L, 0L, 7.0))
    val out = cellsOf(l.expand(Seq(3.0, 5.0)))
    assert(out((4L, 3L)) == 3.0) // both in window; 3 listed first
    assert(out((6L, 3L)) == 5.0)
    assert(out((3L, 3L)) == 3.0) // class cells keep themselves
    assert(out((0L, 0L)) == 7.0) // out of reach, passes through
    assert(out.size == 5)        // NoData cells stay NoData
  }

  test("shrink replaces boundary cells of the class with the mode of other classes") {
    // 3-cells at (3,3) [boundary: sees 2 and 2 and 4 across the seam
    // -> mode 2] and (0,0) [interior: no other class in window].
    val l = layer(
      (3L, 3L, 3.0), (4L, 3L, 2.0), (4L, 2L, 2.0), (4L, 4L, 4.0),
      (0L, 0L, 3.0),
      (6L, 6L, 9.0))
    val out = cellsOf(l.shrink(3.0))
    assert(out((3L, 3L)) == 2.0) // mode{2,2,4} = 2
    assert(out((0L, 0L)) == 3.0) // interior keeps
    assert(out((4L, 3L)) == 2.0) // non-class cells pass through
    assert(out((6L, 6L)) == 9.0)
  }

  test("shrink mode ties break to the smallest class value") {
    val l = layer((3L, 3L, 3.0), (2L, 3L, 6.0), (4L, 3L, 2.0))
    assert(cellsOf(l.shrink(3.0))((3L, 3L)) == 2.0) // tie {6, 2} -> 2
  }

  test("nibble pulls the nearest donor with (d², dy, dx) tie-break; no donor keeps") {
    // masked value = 0. (4,4) has donors at (3,4) d²=1 and (4,6)
    // d²=4 -> takes 7. (0,0)'s only donor within r=2 is (2,1), d²=5.
    // (7,7) has no donor in range and keeps its 0.
    val l = layer(
      (4L, 4L, 0.0), (3L, 4L, 7.0), (4L, 6L, 8.0),
      (0L, 0L, 0.0), (2L, 1L, 9.0),
      (7L, 7L, 0.0))
    val out = cellsOf(l.nibble(_ == 0.0, r = 2))
    assert(out((4L, 4L)) == 7.0)
    assert(out((0L, 0L)) == 9.0)
    assert(out((7L, 7L)) == 0.0)
    assert(out((3L, 4L)) == 7.0) // unmasked cells untouched
  }

  test("nibble equidistant donors: north wins over west (dy before dx)") {
    // donors at (4,3) [dy=-1] and (3,4) [dx=-1], both d²=1 from (4,4)
    val l = layer((4L, 4L, 0.0), (4L, 3L, 5.0), (3L, 4L, 6.0))
    assert(cellsOf(l.nibble(_ == 0.0, r = 2))((4L, 4L)) == 5.0)
  }
}
