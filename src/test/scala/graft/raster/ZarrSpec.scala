package graft.raster

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level Zarr v2 codec contract: `.zarray` metadata fields pinned
  * against the public spec, chunk keys/grid/edge-padding semantics,
  * RFC 1950 zlib streams, `<i8` time coordinates, extent from
  * `.zattrs` vs coordinate-derived, and the malformed-input
  * contract. */
class ZarrSpec extends AnyFunSuite {

  private def node(entries: Seq[(String, Array[Byte])], name: String) =
    Zarr.nodeOf(entries.toMap, name)

  test(".zarray metadata is spec-exact and chunk keys cover the grid") {
    val cells = Array.tabulate(5 * 7)(_.toDouble)
    val entries = Zarr.encodeGrid(cells, cols = 7, rows = 5, 0, 0, 7, 5).toMap
    assert(new String(entries(".zgroup"), "UTF-8") == """{"zarr_format":2}""")
    val meta = graft.vector.GeoJson.parseJsonValue(
      new String(entries("v/.zarray"), "UTF-8")).asInstanceOf[Map[String, Any]]
    assert(meta("zarr_format").asInstanceOf[Double] == 2.0)
    assert(meta("shape").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toInt) == Seq(5, 7))
    // ceil-halves default chunking: (3, 4) over (5, 7) → 2×2 grid
    assert(meta("chunks").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toInt) == Seq(3, 4))
    assert(meta("dtype") == "<f8")
    assert(meta("order") == "C")
    assert(meta("filters") == null)
    assert(meta("compressor").asInstanceOf[Map[String, Any]]("id") == "zlib")
    val chunkKeys = entries.keySet.filter(k => k.startsWith("v/") && !k.endsWith(".zarray"))
    assert(chunkKeys == Set("v/0.0", "v/0.1", "v/1.0", "v/1.1"))
    // coordinate arrays are single-chunk 1-D
    assert(entries.contains("x/.zarray") && entries.contains("x/0"))
    assert(entries.contains("y/.zarray") && entries.contains("y/0"))
  }

  test("chunks are RFC 1950 zlib streams padded to the full chunk shape") {
    val cells = Array.tabulate(5 * 7)(_.toDouble)
    val entries = Zarr.encodeGrid(cells, 7, 5, 0, 0, 7, 5).toMap
    // CMF byte: low nibble 8 = deflate (zlib header, not raw deflate)
    assert((entries("v/0.0")(0) & 0x0f) == 8)
    // edge chunk 1.1 inflates to the FULL 3×4 chunk, not the 2×3 remainder
    val inf = new java.util.zip.Inflater()
    inf.setInput(entries("v/1.1"))
    val out = new Array[Byte](3 * 4 * 8 + 16)
    val n = inf.inflate(out)
    inf.end()
    assert(n == 3 * 4 * 8)
  }

  test("edge-padded grid roundtrips exactly, NaN and signed zero included") {
    val cells = Array.tabulate(5 * 7)(i => i * 1.25 - 3) :+ 0.0
    cells(3) = Double.NaN; cells(11) = -0.0; cells(17) = 1e300
    val vals = cells.take(35)
    val entries = Zarr.encodeGrid(vals, 7, 5, -10, 20, 4, 30)
    val (shape, back) = Zarr.readArray(node(entries, "v"))
    assert(shape == Seq(5, 7))
    vals.zip(back).foreach { case (a, c) =>
      assert(java.lang.Double.compare(a, c) == 0 || (a.isNaN && c.isNaN))
    }
    assert(Zarr.extentOf(entries.toMap) == ((-10.0, 20.0, 4.0, 30.0)))
  }

  test("extent derives from coordinate cell centers when .zattrs is absent") {
    val entries = Zarr.encodeGrid(Array.tabulate(6)(_.toDouble), 3, 2, 0, 0, 6, 4)
      .filterNot(_._1 == ".zattrs")
    assert(Zarr.extentOf(entries.toMap) == ((0.0, 0.0, 6.0, 4.0)))
  }

  test("temporal stack: <i8 time exact, one chunk per record, slabs slice back") {
    val slabs = Array(Array.tabulate(6)(_ * 2.0), Array.tabulate(6)(_ * 3.0 + 1))
    val instants = Array(1700000000L, 1700086400L)
    val entries = Zarr.encodeScenes(instants, slabs, cols = 3, rows = 2, 0, 0, 3, 2)
    val (tShape, times) = Zarr.readArray(node(entries, "time"))
    assert(tShape == Seq(2) && times.map(_.toLong).toSeq == instants.toSeq)
    val (shape, all) = Zarr.readArray(node(entries, "v"))
    assert(shape == Seq(2, 2, 3))
    assert(all.slice(0, 6).toSeq == slabs(0).toSeq)
    assert(all.slice(6, 12).toSeq == slabs(1).toSeq)
    // record-dim chunking: leading chunk extent 1 → keys 0.*.* and 1.*.*
    val keys = entries.map(_._1).filter(k => k.startsWith("v/") && !k.endsWith(".zarray"))
    assert(keys.exists(_.startsWith("v/0.")) && keys.exists(_.startsWith("v/1.")))
  }

  test("uncompressed (compressor null) chunks decode too") {
    val raw = java.nio.ByteBuffer.allocate(4 * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array(1.0, 2.0, 3.0, 4.0).foreach(raw.putDouble)
    val meta = """{"zarr_format":2,"shape":[2,2],"chunks":[2,2],"dtype":"<f8",""" +
      """"compressor":null,"fill_value":0,"filters":null,"order":"C"}"""
    val (shape, vals) = Zarr.readArray(Map(
      ".zarray" -> meta.getBytes("UTF-8"), "0.0" -> raw.array()))
    assert(shape == Seq(2, 2) && vals.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("dimension_separator '/' chunk keys decode (the object-store layout)") {
    val raw = java.nio.ByteBuffer.allocate(2 * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array(5.0, 6.0).foreach(raw.putDouble)
    val raw2 = java.nio.ByteBuffer.allocate(2 * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array(7.0, 8.0).foreach(raw2.putDouble)
    val meta = """{"zarr_format":2,"shape":[2,2],"chunks":[1,2],"dtype":"<f8",""" +
      """"compressor":null,"fill_value":0,"filters":null,"order":"C",""" +
      """"dimension_separator":"/"}"""
    val (shape, vals) = Zarr.readArray(Map(
      ".zarray" -> meta.getBytes("UTF-8"),
      "0/0" -> raw.array(), "1/0" -> raw2.array()))
    assert(shape == Seq(2, 2) && vals.toSeq == Seq(5.0, 6.0, 7.0, 8.0))
  }

  test("missing chunks decode as fill_value; null fill reads as NaN") {
    // zarr-python's write_empty_chunks=False omits all-fill chunks
    val raw = java.nio.ByteBuffer.allocate(2 * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array(5.0, 6.0).foreach(raw.putDouble)
    def meta(fill: String) =
      s"""{"zarr_format":2,"shape":[2,2],"chunks":[1,2],"dtype":"<f8",""" +
        s""""compressor":null,"fill_value":$fill,"filters":null,"order":"C"}"""
    val (_, v9) = Zarr.readArray(Map(
      ".zarray" -> meta("9.5").getBytes("UTF-8"), "0" + "." + "0" -> raw.array()))
    assert(v9.toSeq == Seq(5.0, 6.0, 9.5, 9.5))
    val (_, vN) = Zarr.readArray(Map(
      ".zarray" -> meta("null").getBytes("UTF-8"), "0.0" -> raw.array()))
    assert(vN(0) == 5.0 && vN(1) == 6.0 && vN(2).isNaN && vN(3).isNaN)
  }

  test("truncated zlib chunks fail loudly instead of spinning") {
    val entries = Zarr.encodeGrid(Array.tabulate(35)(_.toDouble), 7, 5, 0, 0, 7, 5)
    val cut = entries.map {
      case (k, v) if k == "v/0.0" => (k, v.take(v.length / 2))
      case kv => kv
    }
    intercept[IllegalArgumentException] {
      Zarr.readArray(Zarr.nodeOf(cut.toMap, "v"))
    }
  }

  test("malformed inputs fail loudly") {
    intercept[IllegalArgumentException] { Zarr.readArray(Map.empty) }
    val badOrder = """{"zarr_format":2,"shape":[1],"chunks":[1],"dtype":"<f8",""" +
      """"compressor":null,"fill_value":0,"filters":null,"order":"F"}"""
    intercept[IllegalArgumentException] {
      Zarr.readArray(Map(".zarray" -> badOrder.getBytes("UTF-8")))
    }
    val badType = badOrder.replace(""""order":"F"""", """"order":"C"""")
      .replace("<f8", "<f4")
    intercept[IllegalArgumentException] {
      Zarr.readArray(Map(".zarray" -> badType.getBytes("UTF-8")))
    }
  }
}
