package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash encoding (public base-32 scheme, Niemeyer 2008): the
  * latitude/longitude space-filling key used for spatial bucketing —
  * prefix-truncation gives coarser cells, so a geohash column is the
  * natural shuffle/join key for proximity blocking at scale (two
  * points sharing a p-char prefix are within one cell of each other).
  *
  * The binary-subdivision definition is equivalent to quantizing
  * (lon+180)/360 to ceil(5p/2) bits and (lat+90)/180 to floor(5p/2)
  * bits and interleaving MSB-first starting with longitude; this
  * closed form is what both the scalar and the Column variants
  * compute (the Column variant expands to pure bitwise Catalyst
  * expressions — codegen'd, no UDF, usable as a partition/bucket
  * key at scan time, the ZIndex.zorderCol discipline).
  */
object Geohash {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def widths(precision: Int): (Int, Int, Int) = {
    require(precision >= 1 && precision <= 12, s"precision $precision")
    val bits = 5 * precision
    (bits, (bits + 1) / 2, bits / 2) // (total, lon bits, lat bits)
  }

  /** Interleaved bit position of lon bit k (LSB k=0): lon occupies the
    * MSB-first even offsets, which lands at 2k+1 for even total bits
    * and 2k for odd. Lat takes the complementary parity. */
  private def lonPos(bits: Int, nLon: Int, k: Int) = bits - 1 - 2 * (nLon - 1 - k)
  private def latPos(bits: Int, nLat: Int, k: Int) = bits - 2 - 2 * (nLat - 1 - k)

  /** Scalar encode. Points on the +180/+90 edge clamp into the last
    * cell (the standard convention). */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    val (bits, nLon, nLat) = widths(precision)
    val lonq = math.min((1L << nLon) - 1,
      math.floor((lon + 180.0) / 360.0 * (1L << nLon)).toLong)
    val latq = math.min((1L << nLat) - 1,
      math.floor((lat + 90.0) / 180.0 * (1L << nLat)).toLong)
    var code = 0L
    var k = 0
    while (k < nLon) { code |= ((lonq >> k) & 1L) << lonPos(bits, nLon, k); k += 1 }
    k = 0
    while (k < nLat) { code |= ((latq >> k) & 1L) << latPos(bits, nLat, k); k += 1 }
    (0 until precision)
      .map(j => Alphabet(((code >> (5 * (precision - 1 - j))) & 31L).toInt))
      .mkString
  }

  /** Cell-center decode (lat, lon) — the inverse up to half a cell. */
  def decodeCenter(gh: String): (Double, Double) = {
    val (bits, nLon, nLat) = widths(gh.length)
    var code = 0L
    gh.foreach { c =>
      val v = Alphabet.indexOf(c.toLower)
      require(v >= 0, s"bad geohash char '$c'")
      code = (code << 5) | v.toLong
    }
    var lonq = 0L; var latq = 0L
    var k = 0
    while (k < nLon) { lonq |= ((code >> lonPos(bits, nLon, k)) & 1L) << k; k += 1 }
    k = 0
    while (k < nLat) { latq |= ((code >> latPos(bits, nLat, k)) & 1L) << k; k += 1 }
    ((latq + 0.5) / (1L << nLat) * 180.0 - 90.0,
     (lonq + 0.5) / (1L << nLon) * 360.0 - 180.0)
  }

  /** Codegen'd Column encode: quantize, interleave as a sum of shifted
    * bit-extractions, then map 5-bit groups through the alphabet. */
  def geohashCol(lat: Column, lon: Column, precision: Int): Column = {
    val (bits, nLon, nLat) = widths(precision)
    val lonq = least(lit((1L << nLon) - 1),
      floor((lon + lit(180.0)) / lit(360.0) * lit((1L << nLon).toDouble)).cast("long"))
    val latq = least(lit((1L << nLat) - 1),
      floor((lat + lit(90.0)) / lit(180.0) * lit((1L << nLat).toDouble)).cast("long"))
    val code =
      ((0 until nLon).map(k =>
        shiftleft(shiftright(lonq, k).bitwiseAND(lit(1L)), lonPos(bits, nLon, k))) ++
       (0 until nLat).map(k =>
        shiftleft(shiftright(latq, k).bitwiseAND(lit(1L)), latPos(bits, nLat, k))))
        .reduce(_.bitwiseOR(_))
    val ab = Alphabet.map(c => lit(c.toString))
    concat((0 until precision).map { j =>
      element_at(array(ab: _*),
        shiftright(code, 5 * (precision - 1 - j)).bitwiseAND(lit(31L)).cast("int") + lit(1))
    }: _*)
  }
}
