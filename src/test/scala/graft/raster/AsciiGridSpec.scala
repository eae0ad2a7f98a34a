package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsciiGridSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decode roundtrip: values, NaN, header numbers") {
    val cells = Array(1.0, 2.5, Double.NaN, -4.0, 0.0, 12345.0)
    val bytes = AsciiGrid.encodeGrid(cells, cols = 3, rows = 2,
      xmin = 10.0, ymin = 20.0, cellSize = 0.5)
    val (c, r, xll, yll, cs, back) = AsciiGrid.decode(bytes)
    assert((c, r, xll, yll, cs) == ((3, 2, 10.0, 20.0, 0.5)))
    assert(back.zip(cells).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) })
    // integral values serialize as plain integers (no trailing .0)
    val text = new String(bytes, "US-ASCII")
    assert(text.contains("1 2.5 -9999") && text.contains("-4 0 12345"))
  }

  test("decode accepts foreign header variants (case, llcenter)") {
    val asc =
      """NCOLS 2
        |NROWS 1
        |XLLCENTER 5.0
        |YLLCENTER 3.0
        |CELLSIZE 2
        |NODATA_VALUE -1
        |7 -1
        |""".stripMargin.getBytes("US-ASCII")
    val (c, r, xll, yll, cs, cells) = AsciiGrid.decode(asc)
    // center-registered corner shifts by half a cell
    assert((c, r, xll, yll, cs) == ((2, 1, 4.0, 2.0, 2.0)))
    assert(cells(0) == 7.0 && cells(1).isNaN)
  }

  test("distributed scene ingest rebuilds the layer") {
    val lay = graft.core.LayoutDefinition(
      graft.core.Extent(0, 0, 8, 8), graft.core.TileLayout(2, 2, 4, 4))
    val cells = Seq((0L, 0L, 5.0), (3L, 3L, 2.0), (4L, 0L, 3.0), (7L, 7L, 9.0))
      .toDF("x", "y", "v")
    val l = RasterLayer.fromCells(cells, lay)
    val scenes = AsciiGrid.toAscii(l)
      .select((col("col") * 2 + col("row")).cast("long").as("scene_id"), col("asc"))
    val back = AsciiGrid.fromAscii(scenes).tileToLayout(lay, CellOp.Max)
    assert(back.toCells.as[(Long, Long, Double)].collect().toSet ==
      cells.as[(Long, Long, Double)].collect().toSet)
  }
}
