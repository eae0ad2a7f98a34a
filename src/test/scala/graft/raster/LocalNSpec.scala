package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

/** N-ary local algebra (Variety/Majority/Minority/Mean) across layers,
  * including the full-outer missing-tile NoData path. */
class LocalNSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  def layer(cells: (Long, Long, Double)*): RasterLayer =
    RasterLayer.fromCells(cells.toSeq.toDF("x", "y", "v"), layout)

  // A covers tiles (0,0) and (1,1); B and C only tile (0,0)
  val a = layer((0L, 0L, 1.0), (1L, 0L, 2.0), (2L, 0L, 5.0), (3L, 0L, 7.0), (5L, 5L, 3.0))
  val b = layer((0L, 0L, 1.0), (1L, 0L, 3.0), (2L, 0L, 5.0), (3L, 0L, 4.0))
  val c = layer((0L, 0L, 2.0), (1L, 0L, 3.0), (2L, 0L, 5.0))

  // mean_u is the 1e-5-quantized BIGINT closing (r18)
  def statsMap = a.localStats(Seq(b, c))
    .as[(Long, Long, Long, Double, Double, Long)].collect()
    .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap

  test("localStats: variety, min-tie-broken majority/minority, exact mean") {
    val m = statsMap
    // (0,0): [1,1,2] — majority the duplicated 1, minority the lone 2
    assert(m((0L, 0L)) == ((2L, 1.0, 2.0, 133333L)))
    // (1,0): [2,3,3]
    assert(m((1L, 0L)) == ((2L, 3.0, 2.0, 266667L)))
    // (2,0): all equal — majority == minority, variety 1
    assert(m((2L, 0L)) == ((1L, 5.0, 5.0, 500000L)))
    // (3,0): [7,4] all counts tie — both stats pin the SMALLEST value
    assert(m((3L, 0L)) == ((2L, 4.0, 4.0, 550000L)))
    // nothing invented outside the union of inputs
    assert(m.keySet == Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (5L, 5L)))
  }

  test("missing tiles act as all-NoData, not as dropped cells") {
    // (5,5) lives in tile (1,1), absent from B and C entirely
    assert(statsMap((5L, 5L)) == ((1L, 3.0, 3.0, 300000L)))
  }

  test("layer variants agree with localStats columns") {
    def cellsOf(l: RasterLayer) =
      l.toCells.as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val m = statsMap
    val variety = cellsOf(a.localVariety(Seq(b, c)))
    val major   = cellsOf(a.localMajority(Seq(b, c)))
    val minor   = cellsOf(a.localMinority(Seq(b, c)))
    val mean    = cellsOf(a.localMeanLayer(Seq(b, c)))
    assert(variety.keySet == m.keySet && major.keySet == m.keySet)
    m.foreach { case (k, (v, mj, mn, me)) =>
      assert(variety(k) == v.toDouble, s"variety at $k")
      assert(major(k) == mj, s"majority at $k")
      assert(minor(k) == mn, s"minority at $k")
      assert(math.abs(mean(k) - me / 100000.0) < 1e-5, s"mean at $k")
    }
  }
}
