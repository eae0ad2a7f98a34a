package graft.render

import graft.SparkSpec
import VectorTile._

class VectorTileSpec extends SparkSpec {
  import spark.implicits._

  test("point feature encodes to the hand-computed MVT bytes") {
    // layer "pts", extent 4096, one point id=7 at (17, 2):
    // feature: 08 07 (id) 18 01 (type POINT) 22 03 09 22 04
    //   (geometry: MoveTo x1, zigzag(17)=34=0x22, zigzag(2)=4)
    // layer:   0A 03 "pts" | 12 09 feature | 28 80 20 (extent 4096)
    //          78 02 (version 2)
    // tile:    1A 15 layer (5 name + 11 feature + 3 extent + 2 version)
    val bytes = encode("pts", Seq(Feature(7, 1, Seq(IndexedSeq((17L, 2L))))))
    val expected = Array[Int](
      0x1a, 0x15,
      0x0a, 0x03, 'p', 't', 's',
      0x12, 0x09, 0x08, 0x07, 0x18, 0x01, 0x22, 0x03, 0x09, 0x22, 0x04,
      0x28, 0x80, 0x20,
      0x78, 0x02).map(_.toByte)
    assert(bytes.toSeq == expected.toSeq)
  }

  test("mixed-geometry layer roundtrips through encode/decode") {
    val feats = Seq(
      Feature(1, 1, Seq(IndexedSeq((100L, 200L)))),
      wktFeature("LINESTRING (1 1, 3 1, 3 4)", 2, (0.0, 0.0), 64),
      wktFeature("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        3, (0.0, 0.0), 64))
    val back = decode(encode("mixed", feats, extent = 4096))
    assert(back.length == 1)
    val l = back.head
    assert(l.name == "mixed" && l.version == 2 && l.extent == 4096)
    assert(l.features == feats)
    // the polygon kept exterior + hole as separate rings
    assert(l.features(2).rings.length == 2)
    // negative-delta zigzag survived (3,4) -> back toward origin cases
    assert(l.features(1).rings.head == IndexedSeq((64L, 64L), (192L, 64L), (192L, 256L)))
  }

  test("pointTiles: per-tile blobs with exact local coords and sorted ids") {
    import graft.core.{Extent, LayoutDefinition, TileLayout}
    val lo = LayoutDefinition(Extent(0, 0, 128, 128), TileLayout(2, 2, 64, 64))
    // two tiles: (0,0) with pids 5 and 3 (out of order), (1,0) with 9
    val pts = Seq(
      (5L, 10.5, 20.5), (3L, 0.5, 0.5), (9L, 70.5, 1.5))
      .toDF("pid", "px", "py")
    val rows = VectorTile.pointTiles(pts, lo)
      .as[(Int, Int, Long, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(rows.keySet == Set((0, 0), (1, 0)))
    val t00 = decode(rows((0, 0))._2).head
    // sorted by pid; local = cellOffset*64 + 32 (scale 4096/64 = 64)
    assert(t00.features.map(_.id) == Seq(3L, 5L))
    assert(t00.features(0).rings.head.head == ((32L, 32L)))
    assert(t00.features(1).rings.head.head == ((10 * 64 + 32L, 20 * 64 + 32L)))
    val t10 = decode(rows((1, 0))._2).head
    assert(t10.features.map(_.id) == Seq(9L))
    assert(t10.features.head.rings.head.head == ((6 * 64 + 32L, 1 * 64 + 32L)))
    assert(rows((0, 0))._1 == 2L && rows((1, 0))._1 == 1L)
  }

  test("linestring feature encodes to the hand-computed MVT command stream") {
    // id=4, LINESTRING (2,2)->(2,10)->(10,10):
    // MoveTo x1 (cmd 9), zz(2)=4, zz(2)=4;
    // LineTo x2 (cmd (2<<3)|2 = 18 = 0x12), zz(0)=0, zz(8)=16, zz(8)=16, zz(0)=0
    val bytes = encode("l", Seq(Feature(4, 2,
      Seq(IndexedSeq((2L, 2L), (2L, 10L), (10L, 10L))))), extent = 256)
    val expected = Array[Int](
      0x1a, 0x18,
      0x0a, 0x01, 'l',
      0x12, 0x0e, 0x08, 0x04, 0x18, 0x02,
      0x22, 0x08, 0x09, 0x04, 0x04, 0x12, 0x00, 0x10, 0x10, 0x00,
      0x28, 0x80, 0x02,
      0x78, 0x02).map(_.toByte)
    assert(bytes.toSeq == expected.toSeq)
  }

  test("polygon winding: exterior forced positive, holes negative (MVT 4.3.3.3)") {
    val cw = IndexedSeq((0L, 0L), (0L, 8L), (8L, 8L), (8L, 0L))    // negative area
    val ccwHole = IndexedSeq((2L, 2L), (4L, 2L), (4L, 4L), (2L, 4L)) // positive area
    val f = orientPolygon(1, cw, Seq(ccwHole))
    assert(shoelace2(f.rings.head) > 0)
    assert(shoelace2(f.rings(1)) < 0)
    // already-correct rings pass through untouched
    val ok = orientPolygon(2, f.rings.head, Seq(f.rings(1)))
    assert(ok.rings == f.rings)
  }

  test("lineTiles + decodeStats: roundtrip counts and coordinate sums") {
    import graft.core.{Extent, LayoutDefinition, TileLayout}
    import org.apache.spark.sql.functions._
    val lo = LayoutDefinition(Extent(0, 0, 128, 128), TileLayout(2, 2, 64, 64))
    val lines = Seq((5L, 10.5, 20.5), (3L, 0.5, 0.5), (9L, 70.5, 1.5))
      .toDF("pid", "px", "py")
      .select(col("pid"),
        array(col("px"), col("px") + 3, col("px") + 3).as("xs"),
        array(col("py"), col("py"), col("py") + 2).as("ys"))
    val out = VectorTile.decodeStats(VectorTile.lineTiles(lines, lo))
      .as[(Int, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    def x0(px: Double, c: Int) = ((px - 64 * c) * 64).toLong
    // tile (0,0): pids 3 and 5; 3 vertices each
    val exp00 = (2L, 6L,
      3 * x0(0.5, 0) + 384 + 3 * x0(10.5, 0) + 384,
      3 * x0(0.5, 0) + 128 + 3 * x0(20.5, 0) + 128)
    assert(out((0, 0)) == exp00)
    assert(out((1, 0)) == ((1L, 3L, 3 * x0(70.5, 1) + 384, 3 * x0(1.5, 0) + 128)))
  }
}
