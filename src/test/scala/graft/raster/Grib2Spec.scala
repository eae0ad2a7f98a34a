package graft.raster

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level GRIB2 codec contract: indicator/trailer framing pinned
  * against the WMO FM 92 regulation, section layout, sign-magnitude
  * coordinates, simple-packing exactness, bitmap NaN handling,
  * multi-message temporal streams, calendar conversion, and the
  * malformed-input contract. */
class Grib2Spec extends AnyFunSuite {

  test("indicator and trailer are regulation-exact; sections in order") {
    val b = Grib2.encodeGrid(Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0), 3, 2, 0, 0, 3, 2)
    assert(new String(b.take(4), "US-ASCII") == "GRIB")
    assert(b(7) == 2) // edition
    assert(new String(b.takeRight(4), "US-ASCII") == "7777")
    // total length field == actual length
    val total = java.nio.ByteBuffer.wrap(b, 8, 8).getLong
    assert(total == b.length)
    // walk sections 1,3,4,5,6,7 in order
    var p = 16
    val nums = Seq.newBuilder[Int]
    while (p < b.length - 4) {
      nums += (b(p + 4) & 0xff)
      p += java.nio.ByteBuffer.wrap(b, p, 4).getInt
    }
    assert(nums.result() == Seq(1, 3, 4, 5, 6, 7))
  }

  test("integral grid roundtrips exactly, extent back-derived from point centers") {
    val vals = Array(3.0, -7.0, 100.0, 0.0, 42.0, -1.0)
    val b = Grib2.encodeGrid(vals, cols = 3, rows = 2, -12, 5, -6, 9)
    val f = Grib2.decode(b).head
    assert(f.cols == 3 && f.rows == 2)
    assert(math.abs(f.xmin - -12) < 1e-9 && math.abs(f.xmax - -6) < 1e-9)
    assert(math.abs(f.ymin - 5) < 1e-9 && math.abs(f.ymax - 9) < 1e-9)
    assert(f.cells.toSeq == vals.toSeq) // negative min -> sign-magnitude la/lo + exact packing
  }

  test("decimalScale packs tenths exactly; non-integral scaled values fail loudly") {
    val vals = Array(1.5, 2.7, -0.3, 0.0)
    val f = Grib2.decode(Grib2.encodeGrid(vals, 2, 2, 0, 0, 2, 2, decimalScale = 1)).head
    assert(f.cells.toSeq == vals.toSeq)
    intercept[IllegalArgumentException] {
      Grib2.encodeGrid(Array(1.55), 1, 1, 0, 0, 1, 1, decimalScale = 1)
    }
  }

  test("NaN cells travel through the bitmap; constant grids pack at 0 bits") {
    val vals = Array(5.0, Double.NaN, 7.0, Double.NaN)
    val f = Grib2.decode(Grib2.encodeGrid(vals, 2, 2, 0, 0, 2, 2)).head
    assert(f.cells(0) == 5.0 && f.cells(2) == 7.0)
    assert(f.cells(1).isNaN && f.cells(3).isNaN)
    // constant grid: nbits 0, data section is 5 bytes (header only)
    val const = Grib2.encodeGrid(Array.fill(6)(9.0), 3, 2, 0, 0, 3, 2)
    val fc = Grib2.decode(const).head
    assert(fc.cells.forall(_ == 9.0))
    // all-NaN grid survives too
    val allNaN = Grib2.decode(Grib2.encodeGrid(Array.fill(4)(Double.NaN), 2, 2, 0, 0, 2, 2)).head
    assert(allNaN.cells.forall(_.isNaN))
  }

  test("temporal stream: one message per instant, section-1 time roundtrips") {
    val instants = Array(0L, 1700000000L, 86400L * 20000)
    val slabs = Array.tabulate(3)(r => Array.tabulate(4)(i => (r * 10 + i).toDouble))
    val b = Grib2.encodeScenes(instants, slabs, 2, 2, 0, 0, 2, 2)
    val fs = Grib2.decode(b)
    assert(fs.length == 3)
    assert(fs.map(_.epoch).toSeq == instants.toSeq)
    fs.zipWithIndex.foreach { case (f, r) => assert(f.cells.toSeq == slabs(r).toSeq) }
  }

  test("civil-date conversion is its own inverse across eras") {
    Seq(0L, 1L, -1L, 86399L, 86400L, 1700000000L, -2208988800L, 4102444800L)
      .foreach { t =>
        val (y, m, d, h, mi, s) = Grib2.civilOf(t)
        assert(Grib2.epochOf(y, m, d, h, mi, s) == t, s"epoch $t")
      }
    assert(Grib2.civilOf(0L) == ((1970, 1, 1, 0, 0, 0)))
    assert(Grib2.civilOf(1700000000L) == ((2023, 11, 14, 22, 13, 20)))
  }

  test("longitude space is preserved verbatim — no silent 0..360 wrapping") {
    // documented subset contract (scaladoc): the codec keeps the
    // caller's x space. A regulation-style 0..360 producer grid
    // (348..354°E, positive micro-degrees on the wire) decodes with
    // its 0..360 extent intact — the caller shifts by -360 where
    // geography requires it, never the codec.
    val b360 = Grib2.encodeGrid(Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0), 3, 2, 348, 5, 354, 9)
    val f360 = Grib2.decode(b360).head
    assert(math.abs(f360.xmin - 348) < 1e-9 && math.abs(f360.xmax - 354) < 1e-9)
    // and a ±180-convention west-of-Greenwich grid roundtrips exactly
    // through sign-magnitude negatives (the engine's own convention)
    val bNeg = Grib2.encodeGrid(Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0), 3, 2, -12, 5, -6, 9)
    val fNeg = Grib2.decode(bNeg).head
    assert(math.abs(fNeg.xmin - -12) < 1e-9 && math.abs(fNeg.xmax - -6) < 1e-9)
  }

  test("normalizeLon stores regulation [0,360) longitudes on the wire (r19)") {
    // the same west-of-Greenwich grid, exported for external readers:
    // Lo1 (first-point center) must carry 349e6 micro-degrees — a
    // POSITIVE regulation value, not the sign-magnitude 0x80000000|11e6
    // — and decode lands in 0..360 space (caller shifts, per contract)
    val b = Grib2.encodeGrid(Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0), 3, 2,
      -12, 5, -6, 9, normalizeLon = true)
    // section 3 starts right after section 1 (16-byte indicator +
    // 21-byte section 1); Lo1 sits at section offset 50
    val s3 = 16 + 21
    def ru32(p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    assert(ru32(s3 + 50) == 349000000L)      // Lo1 = -11° -> 349°, no sign bit
    assert(ru32(s3 + 59) == 353000000L)      // Lo2 = -7° -> 353°
    val f = Grib2.decode(b).head
    assert(math.abs(f.xmin - 348) < 1e-9 && math.abs(f.xmax - 354) < 1e-9)
    assert(f.cells.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    // east-of-Greenwich grids are unchanged by normalization
    val bE = Grib2.encodeGrid(Array(1.0, 2.0), 2, 1, 10, 0, 12, 1, normalizeLon = true)
    val fE = Grib2.decode(bE).head
    assert(math.abs(fE.xmin - 10) < 1e-9 && math.abs(fE.xmax - 12) < 1e-9)
    // a >360-degree span cannot normalize
    intercept[IllegalArgumentException] {
      Grib2.encodeGrid(Array.fill(400)(1.0), 400, 1, -200, 0, 200, 1,
        normalizeLon = true)
    }
  }

  test("normalizeLon Greenwich-crossing grid: Lo1 > Lo2 wrap pinned (r20)") {
    // xmin=-10, xmax=10 (4 cells of width 5): first-point center -7.5°
    // normalizes to 352.5e6, last-point center 7.5° stays 7.5e6 — the
    // regulation-legal Lo1 > Lo2 form (Di is explicit, reg 92.1.5).
    val b = Grib2.encodeGrid(Array(1.0, 2.0, 3.0, 4.0), 4, 1,
      -10, 0, 10, 1, normalizeLon = true)
    val s3 = 16 + 21
    def ru32(p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    assert(ru32(s3 + 50) == 352500000L) // Lo1 = -7.5° -> 352.5°
    assert(ru32(s3 + 59) == 7500000L)   // Lo2 = 7.5°  -> Lo1 > Lo2
    // graft's own decode is Lo1+Di-driven: the grid reads back as the
    // CONTIGUOUS 0..360-space extent [350, 370) — values intact; the
    // caller shifts per the documented contract. External readers that
    // special-case Lo1 > Lo2 see the same cells at the same increments.
    val f = Grib2.decode(b).head
    assert(math.abs(f.xmin - 350) < 1e-9 && math.abs(f.xmax - 370) < 1e-9)
    assert(f.cells.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("malformed inputs fail loudly") {
    intercept[IllegalArgumentException] { Grib2.decode("GRIX____".getBytes) }
    val good = Grib2.encodeGrid(Array(1.0), 1, 1, 0, 0, 1, 1)
    val truncated = good.dropRight(4) ++ "7776".getBytes("US-ASCII")
    intercept[IllegalArgumentException] { Grib2.decode(truncated) }
    // span over 32 bits refuses
    intercept[IllegalArgumentException] {
      Grib2.encodeGrid(Array(0.0, math.pow(2, 33)), 2, 1, 0, 0, 2, 1)
    }
  }
}
