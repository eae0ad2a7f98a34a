package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Native cell types — actual storage widths, the reference's
  * convert_data_type surface (geopyspark layer.py:747 changes the
  * numpy dtype; GeoTrellis stores tiles at the native width).
  *
  * In-memory compute stays `array<double>` everywhere (one code path
  * for every operator); the WIDTH matters where bytes matter — the
  * catalog store and everything downstream of it (disk, shuffle on
  * read, network). An NLCD-style uint8 layer packs 8x smaller than
  * float64 tiles.
  *
  * NoData: doubles use NaN; integer types reserve a sentinel — the
  * type minimum for signed, the maximum for unsigned — and pack()
  * clamps data values into the remaining domain so the sentinel can
  * never be forged by a real value (GeoTrellis reserves the same
  * boundary values for its constant-NoData cell types).
  *
  * `bit` is the 1-bit boolean raster (GeoTrellis `bool`, reference
  * geopyspark-backend BitArrayTileWrapper.scala:1): 8 cells per byte,
  * LSB-first within each byte, values 0/1 and NO NoData — NaN packs
  * to 0, matching GeoTrellis BitArrayTile, whose bit domain has no
  * room for a sentinel. A mask layer stores 64x smaller than float64
  * and 8x smaller than uint8.
  */
final case class CellType(name: String, bytes: Int, isFloat: Boolean,
                          lo: Double, hi: Double, sentinel: Long) {

  /** Clamp a data value into the packable domain (no-op for floats). */
  def clamp(v: Double): Double =
    if (isFloat || v.isNaN) v
    else math.min(hi, math.max(lo, v))

  /** Pack one tile (NaN-as-NoData doubles) to little-endian bytes.
    * Type dispatch happens ONCE per tile, not per cell — this runs
    * inside the catalog write path (native TilePackExpr) for every
    * tile of every store. */
  def pack(cells: Array[Double]): Array[Byte] = {
    if (name == "bit") {
      // 8 cells/byte, LSB-first; NaN -> 0 (no NoData in the bit domain).
      // DELIBERATE semantics note: non-0/1 values convert by
      // CLAMP-then-truncate (0.7 -> 0, 2 -> 1, -3 -> 0) — the same
      // saturating rule every other integral cell type here uses —
      // NOT GeoTrellis BitArrayTile's `value & 1` (2 -> 0, 3 -> 1).
      // All store/oracle paths write exact 0/1, where the two rules
      // agree; CellTypeSpec pins the clamp behavior.
      require(cells.length % 8 == 0,
        s"bit tiles need a multiple-of-8 cell count (got ${cells.length})")
      val out = new Array[Byte](cells.length / 8)
      var i = 0
      while (i < cells.length) {
        val v = cells(i)
        if (!v.isNaN && clamp(v).toLong == 1L)
          out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
        i += 1
      }
      return out
    }
    val buf = ByteBuffer.allocate(cells.length * bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = cells.length
    var i = 0
    name match {
      case "float64" => while (i < n) { buf.putDouble(cells(i)); i += 1 }
      case "float32" => while (i < n) { buf.putFloat(cells(i).toFloat); i += 1 }
      case _ => bytes match {
        case 1 => while (i < n) {
          val v = cells(i)
          buf.put(if (v.isNaN) sentinel.toByte else clamp(v).toLong.toByte); i += 1
        }
        case 2 => while (i < n) {
          val v = cells(i)
          buf.putShort(if (v.isNaN) sentinel.toShort else clamp(v).toLong.toShort); i += 1
        }
        case 4 => while (i < n) {
          val v = cells(i)
          buf.putInt(if (v.isNaN) sentinel.toInt else clamp(v).toLong.toInt); i += 1
        }
      }
    }
    buf.array()
  }

  /** Unpack little-endian bytes back to NaN-as-NoData doubles. */
  def unpack(packed: Array[Byte]): Array[Double] = {
    if (name == "bit") {
      val out = new Array[Double](packed.length * 8)
      var i = 0
      while (i < out.length) {
        out(i) = ((packed(i >> 3) >> (i & 7)) & 1).toDouble
        i += 1
      }
      return out
    }
    val buf = ByteBuffer.wrap(packed).order(ByteOrder.LITTLE_ENDIAN)
    val n = packed.length / bytes
    val out = new Array[Double](n)
    var i = 0
    def ints(read: () => Long): Unit =
      while (i < n) {
        val r = read()
        out(i) = if (r == sentinel) Double.NaN else r.toDouble
        i += 1
      }
    name match {
      case "float64" => while (i < n) { out(i) = buf.getDouble(); i += 1 }
      case "float32" => while (i < n) { out(i) = buf.getFloat().toDouble; i += 1 }
      case "int8"    => ints(() => buf.get().toLong)
      case "uint8"   => ints(() => (buf.get() & 0xff).toLong)
      case "int16"   => ints(() => buf.getShort().toLong)
      case "uint16"  => ints(() => (buf.getShort() & 0xffff).toLong)
      case "int32"   => ints(() => buf.getInt().toLong)
      case "uint32"  => ints(() => buf.getInt() & 0xffffffffL)
    }
    out
  }
}

/** How non-0/1 values convert to the `bit` cell type.
  *
  * [[BitSemantics.Clamp]] (graft default) saturates: 0.7 -> 0, 2 -> 1,
  * -3 -> 0 — the same rule every other integral cell type uses.
  * [[BitSemantics.MaskLowBit]] reproduces GeoTrellis BitArrayTile
  * bug-for-bug: truncate toward zero then `& 1` (2 -> 0, 3 -> 1,
  * -1 -> 1) — for users migrating with byte-identical expectations.
  * Both agree on exact 0/1 inputs (every store/oracle path here). */
object BitSemantics {
  sealed trait Mode
  case object Clamp extends Mode
  case object MaskLowBit extends Mode
}

object CellType {
  // signed types: sentinel = min, data domain [min+1, max]
  // unsigned types: sentinel = max, data domain [0, max-1]
  // bit: 0/1 only, no sentinel (the -1 below is unreachable), 8 cells
  // per byte — `bytes` is nominal; pack/unpack special-case the width
  val Bit     = CellType("bit", 1, isFloat = false, 0, 1, -1L)
  val Int8    = CellType("int8", 1, isFloat = false, -127, 127, -128L)
  val Uint8   = CellType("uint8", 1, isFloat = false, 0, 254, 255L)
  val Int16   = CellType("int16", 2, isFloat = false, -32767, 32767, -32768L)
  val Uint16  = CellType("uint16", 2, isFloat = false, 0, 65534, 65535L)
  val Int32   = CellType("int32", 4, isFloat = false, Int.MinValue + 1, Int.MaxValue, Int.MinValue.toLong)
  val Uint32  = CellType("uint32", 4, isFloat = false, 0, 4294967294.0, 4294967295L)
  val Float32 = CellType("float32", 4, isFloat = true, Float.MinValue, Float.MaxValue, 0L)
  val Float64 = CellType("float64", 8, isFloat = true, Double.MinValue, Double.MaxValue, 0L)

  val all: Seq[CellType] =
    Seq(Bit, Int8, Uint8, Int16, Uint16, Int32, Uint32, Float32, Float64)

  def fromName(s: String): CellType =
    all.find(_.name == s.trim.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        s"unknown cell type '$s' (${all.map(_.name).mkString(", ")})"))
}
