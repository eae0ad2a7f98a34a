package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CellTypeSpec extends AnyFunSuite {

  test("pack/unpack roundtrips every type's domain, NaN included") {
    for (ct <- CellType.all) {
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
