package graft.raster

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NetCdfSpec extends SparkSpec {
  import spark.implicits._

  test("encodeGrid/decode roundtrip: values, NaN, coords, attrs") {
    val cells = Array(1.0, 2.5, Double.NaN, -4.0, 0.0, 1e12)
    val bytes = NetCdf.encodeGrid(cells, cols = 3, rows = 2, 10.0, 20.0, 40.0, 40.0)
    // pinned format bytes: magic CDF\1, numrecs 0, dim tag 0x0A
    assert(bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F' && bytes(3) == 1)
    assert(bytes.slice(4, 12).toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 0x0A))
    val nc = NetCdf.decode(bytes)
    assert(nc.dims.map(d => (d.name, d.length)) == Seq(("y", 2), ("x", 3)))
    assert(nc.gatts("xmin") == 10.0 && nc.gatts("ymax") == 40.0)
    val v = nc.readVar("v")
    assert(v.zip(cells).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) })
    // coordinate vars carry cell centers: cw=10, ch=10
    assert(nc.readVar("x").toSeq == Seq(15.0, 25.0, 35.0))
    assert(nc.readVar("y").toSeq == Seq(35.0, 25.0))
  }

  test("record dimension: per-record slabs + time coordinates") {
    val slabs = Array(Array(1.0, 2.0), Array(3.0, 4.0), Array(5.0, 6.0))
    val bytes = NetCdf.encodeScenes(Array(100L, 200L, 300L), slabs,
      cols = 2, rows = 1, 0.0, 0.0, 2.0, 1.0)
    val nc = NetCdf.decode(bytes)
    assert(nc.numrecs == 3)
    assert(nc.dims.head == NetCdf.NcDim("time", 0))
    (0 until 3).foreach { r =>
      assert(nc.readRecord("time", r).head == 100.0 * (r + 1))
      assert(nc.readRecord("v", r).toSeq == slabs(r).toSeq)
    }
    intercept[IllegalArgumentException](nc.readVar("v"))
    intercept[IllegalArgumentException](nc.readRecord("v", 3))
  }

  test("decode accepts a hand-built CDF-1 file with a short variable") {
    // independently constructed from the classic-format spec (not via
    // the writer): dims x=3, one var 's' of nc_type short
    val out = new ByteArrayOutputStream()
    def i4(v: Int): Unit = {
      out.write(v >>> 24); out.write(v >>> 16); out.write(v >>> 8); out.write(v)
    }
    out.write('C'); out.write('D'); out.write('F'); out.write(1)
    i4(0)                                   // numrecs
    i4(0x0A); i4(1); i4(1); out.write('x'); out.write(0); out.write(0); out.write(0); i4(3)
    i4(0); i4(0)                            // gatt_list ABSENT
    i4(0x0B); i4(1)                         // one var
    i4(1); out.write('s'); out.write(0); out.write(0); out.write(0)
    i4(1); i4(0)                            // ndims=1, dimid 0
    i4(0); i4(0)                            // vatt_list ABSENT
    i4(3); i4(8)                            // short, vsize 6 padded to 8
    i4(out.size + 4)                        // begin = right after header
    out.write(0); out.write(7)              // 7
    out.write(0xFF); out.write(0xFE)        // -2
    out.write(0); out.write(100)            // 100, + 2 pad bytes
    out.write(0); out.write(0)
    val nc = NetCdf.decode(out.toByteArray)
    assert(nc.readVar("s").toSeq == Seq(7.0, -2.0, 100.0))
  }

  test("distributed scene ingest: fromNetCdf rebuilds the layer") {
    val lay = graft.core.LayoutDefinition(
      graft.core.Extent(0, 0, 8, 8), graft.core.TileLayout(2, 2, 4, 4))
    val cells = Seq((0L, 0L, 5.0), (3L, 3L, 2.0), (4L, 0L, 3.0), (7L, 7L, 9.0))
      .toDF("x", "y", "v")
    val l = RasterLayer.fromCells(cells, lay)
    val scenes = NetCdf.toNetCdf(l)
      .select((col("col") * 2 + col("row")).cast("long").as("scene_id"), col("nc"))
    val back = NetCdf.fromNetCdf(scenes).tileToLayout(lay, CellOp.Max)
    assert(back.toCells.as[(Long, Long, Double)].collect().toSet ==
      cells.as[(Long, Long, Double)].collect().toSet)
  }
}
