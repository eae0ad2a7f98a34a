package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CellTypeSpec extends AnyFunSuite {

  test("pack/unpack roundtrips every type's domain, NaN included") {
    // bit is the one type without NoData (NaN -> 0) — covered below
    for (ct <- CellType.all if ct.name != "bit") {
      val vals: Array[Double] =
        if (ct.isFloat) Array(0.0, 1.5, -2.25, Double.NaN, 1e6)
        else Array(ct.lo, 0.0, 1.0, ct.hi, Double.NaN, math.min(ct.hi, 42.0))
      val back = ct.unpack(ct.pack(vals))
      assert(back.length == vals.length, ct.name)
      vals.zip(back).foreach { case (a, b) =>
        if (a.isNaN) assert(b.isNaN, s"${ct.name}: NaN lost")
        else if (ct.name == "float32") assert(b == a.toFloat.toDouble, ct.name)
        else assert(b == a, s"${ct.name}: $a -> $b")
      }
    }
  }

  test("packed width is the native width (uint8 is 8x smaller than float64)") {
    val cells = Array.fill(64 * 64)(7.0)
    assert(CellType.Uint8.pack(cells).length == 64 * 64)
    assert(CellType.Float64.pack(cells).length == 64 * 64 * 8)
    assert(CellType.Int16.pack(cells).length == 64 * 64 * 2)
    // the bit payoff: a 64x64 mask tile is 512 bytes — 8x smaller than
    // uint8, 64x smaller than the float64 compute representation
    assert(CellType.Bit.pack(cells).length == 64 * 64 / 8)
    assert(CellType.Bit.pack(cells).length * 8 == CellType.Uint8.pack(cells).length)
  }

  test("bit packs 8 cells/byte LSB-first, clamps to 0/1, maps NaN to 0") {
    // 16 cells exercising every semantic: clean 0/1, NaN (no NoData in
    // the bit domain -> 0), clamped values (2 -> 1, -3 -> 0, 0.7 -> 0)
    val vals = Array[Double](1, 0, 1, 1, Double.NaN, 2.0, -3.0, 0.7,
      0, 1, 0, 0, 1, Double.NaN, 1, 0)
    val packed = CellType.Bit.pack(vals)
    assert(packed.length == 2)
    // byte 0: bits(LSB..MSB) = 1,0,1,1,0,1,0,0 = 0x2d
    assert(packed(0) == 0x2d.toByte)
    // byte 1: bits = 0,1,0,0,1,0,1,0 = 0x52
    assert(packed(1) == 0x52.toByte)
    val back = CellType.Bit.unpack(packed)
    assert(back.toSeq == Seq[Double](1, 0, 1, 1, 0, 1, 0, 0, 0, 1, 0, 0, 1, 0, 1, 0))
    // non-multiple-of-8 tiles are a contract violation, not silent pad
    intercept[IllegalArgumentException](CellType.Bit.pack(Array(1.0)))
  }

  test("out-of-domain values clamp; the NoData sentinel cannot be forged") {
    // 300 clamps to uint8's data max (254, since 255 is the sentinel)
    assert(CellType.Uint8.unpack(CellType.Uint8.pack(Array(300.0))).head == 254.0)
    assert(CellType.Uint8.unpack(CellType.Uint8.pack(Array(-5.0))).head == 0.0)
    // a data value AT the sentinel clamps away from it instead of
    // round-tripping into NoData
    assert(CellType.Uint8.unpack(CellType.Uint8.pack(Array(255.0))).head == 254.0)
    assert(CellType.Int16.unpack(CellType.Int16.pack(Array(-40000.0))).head == -32767.0)
    // NaN really is the sentinel on the wire
    assert(CellType.Uint8.pack(Array(Double.NaN)).head == 0xff.toByte)
    assert(CellType.Int32.unpack(CellType.Int32.pack(Array(Double.NaN))).head.isNaN)
  }

  test("fromName resolves all names and rejects unknowns") {
    CellType.all.foreach(ct => assert(CellType.fromName(ct.name) == ct))
    assert(CellType.fromName(" UINT8 ") == CellType.Uint8)
    intercept[IllegalArgumentException](CellType.fromName("int64"))
  }
}
