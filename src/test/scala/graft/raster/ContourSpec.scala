package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

class ContourSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  def layer(cells: Seq[(Long, Long, Double)]): RasterLayer =
    RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout, CellOp.Last)

  test("contours: plateau ring crosses 8 blocks with 8 segments") {
    // 4x4 full grid, 2x2 plateau of 9s in a field of 0s: the level-5
    // iso-line crosses the 4 corner + 4 edge blocks once each, the
    // center block is all-inside (case 15), outside blocks absent
    val cells = for (y <- 0L to 3L; x <- 0L to 3L)
      yield (x, y, if (x >= 1 && x <= 2 && y >= 1 && y <= 2) 9.0 else 0.0)
    val out = Contour.segmentCounts(layer(cells), Seq(5.0))
      .as[(Double, Long, Long)].collect()
    assert(out.toSeq == Seq((5.0, 8L, 8L)))
  }

  test("contours: diagonal saddle emits two segments") {
    // single 2x2 block with opposite corners above the level:
    // case 1+8 = 9 -> the always-split saddle rule, 2 segments
    val out = Contour.segmentCounts(
        layer(Seq((0L, 0L, 9.0), (1L, 0L, 0.0), (0L, 1L, 0.0), (1L, 1L, 9.0))),
        Seq(5.0)).as[(Double, Long, Long)].collect()
    assert(out.toSeq == Seq((5.0, 2L, 1L)))
    // the other diagonal: case 2+4 = 6
    val out2 = Contour.segmentCounts(
        layer(Seq((0L, 0L, 0.0), (1L, 0L, 9.0), (0L, 1L, 9.0), (1L, 1L, 0.0))),
        Seq(5.0)).as[(Double, Long, Long)].collect()
    assert(out2.toSeq == Seq((5.0, 2L, 1L)))
  }

  test("contours: NoData holes and tile seams drop incomplete blocks only") {
    // v = x+y over y in {0,1}, x in {2..5} (straddles the x=3|4 tile
    // seam). Level 4: block(2,0) case 8 -> 1 seg, block(3,0) case 14
    // -> 1 seg, block(4,0) case 15 -> 0 segs: (2 segments, 2 crossed)
    val full = for (y <- 0L to 1L; x <- 2L to 5L) yield (x, y, (x + y).toDouble)
    val all = Contour.segmentCounts(layer(full), Seq(4.0))
      .as[(Double, Long, Long)].collect().head
    assert(all == ((4.0, 2L, 2L)))
    // removing cell (4,0) kills the two blocks that use it; only
    // block(2,0) remains
    val holed = Contour.segmentCounts(
        layer(full.filterNot(c => c._1 == 4 && c._2 == 0)), Seq(4.0))
      .as[(Double, Long, Long)].collect().head
    assert(holed == ((4.0, 1L, 1L)))
  }

  test("zonal geometry: block, singleton and line shapes by hand") {
    // zone 1: 2x2 block -> A=4 P=8 Q=pi/4; zone 2: singleton -> A=1
    // P=4 Q=pi/4; zone 3: 3-cell line (crosses the tile seam) ->
    // A=3 P=8 Q=3pi/16
    val cells = Seq(
      (1L, 1L, 1.0), (2L, 1L, 1.0), (1L, 2L, 1.0), (2L, 2L, 1.0),
      (5L, 5L, 2.0),
      (3L, 6L, 3.0), (4L, 6L, 3.0), (5L, 6L, 3.0))
    val out = ZonalOps.zonalGeometry(layer(cells))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // compactness_u: 1e-6-quantized BIGINT closing (r18)
    def q(a: Long, p: Long) = math.rint(4 * math.Pi * a / (p * p) * 1e6).toLong
    assert(out(1L) == (1L, 4L, 8L, q(4, 8)))
    assert(out(2L) == (2L, 1L, 4L, q(1, 4)))
    assert(out(3L) == (3L, 3L, 8L, q(3, 8)))
  }

  test("tile seams: shapes straddling the 4-tile corner count once and stay whole") {
    // layout seams at x=4 and y=4: a 2x2 zone block centered on the
    // 4-corner junction (cells in all FOUR tiles) — each tile's scan
    // sees the others' cells only via the halo strip. A=4 P=8, same as
    // an interior block; nothing double-counted, nothing split.
    val corner = Seq((3L, 3L, 5.0), (4L, 3L, 5.0), (3L, 4L, 5.0), (4L, 4L, 5.0))
    val zg = ZonalOps.zonalGeometry(layer(corner))
      .as[(Long, Long, Long, Long)].collect()
    assert(zg.toSeq == Seq((5L, 4L, 8L,
      math.rint(4 * math.Pi * 4 / 64.0 * 1e6).toLong)))
    // marching squares over the same plateau (0-field filled in): the
    // level-3 ring crosses 8 blocks; the block anchored at (3,3) —
    // whose 3 other corners live in 3 OTHER tiles — is the all-inside
    // case 15. Identical to the single-tile plateau ring result.
    val field = for (y <- 2L to 5L; x <- 2L to 5L)
      yield (x, y, if (corner.exists(c => c._1 == x && c._2 == y)) 9.0 else 0.0)
    val sc = Contour.segmentCounts(layer(field), Seq(3.0))
      .as[(Double, Long, Long)].collect()
    assert(sc.toSeq == Seq((3.0, 8L, 8L)))
    // y-seam: vertical 3-cell line across y=4 keeps A=3 P=8
    val vline = ZonalOps.zonalGeometry(
        layer(Seq((6L, 3L, 2.0), (6L, 4L, 2.0), (6L, 5L, 2.0))))
      .as[(Long, Long, Long, Long)].collect()
    assert(vline.head._2 == 3L && vline.head._3 == 8L)
  }

  test("zonal geometry: NoData holes count as boundary") {
    // a 3x1 line with its middle cell missing: two singletons of the
    // same zone, each with perimeter 4 (the hole is boundary)
    val out = ZonalOps.zonalGeometry(
        layer(Seq((1L, 1L, 7.0), (3L, 1L, 7.0))))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((7L, 2L, 8L,
      math.rint(4 * math.Pi * 2 / 64.0 * 1e6).toLong)))
  }

  test("coverage zonal stats: boundary cell splits between zones by exact fractions") {
    // values: v(0,0)=8, v(1,0)=16. Zone 1 covers cell (0,0) fully and
    // the LEFT 1/4 of (1,0); zone 2 covers the RIGHT 1/2 of (1,0).
    val vals = layer(Seq((0L, 0L, 8.0), (1L, 0L, 16.0)))
    val rects = Seq(
      (1L, 0.0, 0.0, 1.25, 1.0),  // 16q over (0,0) + 4q over (1,0)
      (2L, 1.5, 0.0, 2.0, 1.0))   // 8q over (1,0)
      .toDF("zone", "x0", "y0", "x1", "y1")
    val out = ZonalOps.zonalStatsCoverage(vals, rects)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // zone 1: cov 20q, wsum 8*16 + 16*4 = 192, mean 9.6 (wmean_u 1e-6)
    assert(out(1L) == ((1L, 2L, 20L, 192L, 9600000L)))
    // zone 2: cov 8q, wsum 16*8 = 128, mean 16
    assert(out(2L) == ((2L, 1L, 8L, 128L, 16000000L)))
    // a zone over NoData only contributes nothing
    val o2 = ZonalOps.zonalStatsCoverage(vals,
      Seq((9L, 5.0, 5.0, 6.0, 6.0)).toDF("zone", "x0", "y0", "x1", "y1"))
      .collect()
    assert(!o2.exists(_.getLong(0) == 9L))
  }

  test("zonal circular mean: wraparound and quadrature cases by hand") {
    // zone 1: angles 359 and 1 -> circular mean 0 (arithmetic mean
    // would say 180); zone 2: angles 0 and 90 -> mean 45, R = sqrt2/2
    val ang = layer(Seq((0L, 0L, 359.0), (1L, 0L, 1.0),
      (2L, 0L, 0.0), (3L, 0L, 90.0)))
    val zones = layer(Seq((0L, 0L, 1.0), (1L, 0L, 1.0),
      (2L, 0L, 2.0), (3L, 0L, 2.0)))
    val out = ZonalOps.zonalCircularMean(ang, zones)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // mean_deg_u 1e-5, resultant_u 1e-6 quantized BIGINTs (r18)
    assert(out(1L) == (1L, 2L, 0L, 999848L))
    assert(out(2L) == (2L, 2L, 4500000L, math.rint(math.sqrt(2) / 2 * 1e6).toLong))
  }

  test("cell area: telescoping total matches the closed form, equatorward rows grow") {
    val l = ZFactor.cellAreaLayer(spark, graft.GridSource.layoutLatLng)
    val rows = l.toCells.groupBy("y").agg(min("v").as("a"), max("v").as("b"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 256)
    rows.foreach { case (_, a, b) => assert(a == b) } // constant per row
    // telescoping sum over rows = R^2 * dLambda * (sin 64deg - sin 0)
    val total = rows.map(_._2).sum * 256
    val closed = ZFactor.cellAreaScale(graft.GridSource.layoutLatLng) *
      (math.sin(math.toRadians(64)) - 0.0) * 256
    assert(math.abs(total - closed) / closed < 1e-9)
    // area grows toward the equator (y-down: row 255 is lat 0..0.25)
    assert(rows.sliding(2).forall { case Array(p, n) => n._2 > p._2 })
  }
}
