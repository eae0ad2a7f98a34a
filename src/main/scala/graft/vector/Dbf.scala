package graft.vector

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** dBASE III (.dbf) attribute-table codec — the attribute half of the
  * reference's shapefile features (geotools/shapefile.py:68 returns
  * geometry + attribute maps). The dBASE III header/record layout is a
  * public spec; fields are fixed-width ASCII (type C = character,
  * N/F = number, L = logical, D = date), records prefixed by a
  * deletion flag byte.
  *
  * Values surface as trimmed strings — numeric interpretation happens
  * downstream with an explicit cast (exactly what the oracle SQL
  * restates), so no float parsing ambiguity hides in the codec.
  */
object Dbf {

  final case class Field(name: String, typ: Char, length: Int, decimals: Int = 0) {
    require(name.length <= 10, s"dbf field name '$name' exceeds 10 chars")
    require(length > 0 && length <= 254)
  }

  /** Encode rows (as strings, pre-formatted to fit their field) into a
    * dBASE III table. Character fields left-justify, numeric fields
    * right-justify, both space-padded — per spec. */
  def write(fields: Seq[Field], rows: Seq[Seq[String]]): Array[Byte] = {
    require(rows.forall(_.size == fields.size), "row arity != field count")
    val recordSize = 1 + fields.map(_.length).sum
    val headerSize = 32 + 32 * fields.size + 1
    val total = headerSize + recordSize * rows.size + 1
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte)            // dBASE III, no memo
    buf.put(99.toByte).put(1.toByte).put(1.toByte) // last-update date (fixed: determinism)
    buf.putInt(rows.size)
    buf.putShort(headerSize.toShort)
    buf.putShort(recordSize.toShort)
    buf.position(32)
    fields.foreach { f =>
      val start = buf.position()
      val nm = f.name.getBytes(StandardCharsets.US_ASCII)
      buf.put(nm)
      buf.position(start + 11)
      buf.put(f.typ.toByte)
      buf.position(start + 16)
      buf.put(f.length.toByte)
      buf.put(f.decimals.toByte)
      buf.position(start + 32)
    }
    buf.put(0x0D.toByte)            // field-descriptor terminator
    rows.foreach { r =>
      buf.put(0x20.toByte)          // not deleted
      fields.zip(r).foreach { case (f, v0) =>
        val v = if (v0 == null) "" else v0
        require(v.length <= f.length, s"value '$v' overflows ${f.name}(${f.length})")
        val pad = " " * (f.length - v.length)
        val cell = if (f.typ == 'N' || f.typ == 'F') pad + v else v + pad
        buf.put(cell.getBytes(StandardCharsets.US_ASCII))
      }
    }
    buf.put(0x1A.toByte)            // EOF
    buf.array()
  }

  /** Decode a dBASE III table: (fields, rows of trimmed values).
    * Deleted records (flag 0x2A) are skipped, as every reader does.
    * For shp/dbf pairing use [[readIndexed]] — it keeps the POSITIONAL
    * record number, which is what aligns with .shp record order. */
  def read(bytes: Array[Byte]): (Seq[Field], Seq[Seq[String]]) = {
    val (fields, rows) = readIndexed(bytes)
    (fields, rows.map(_._2))
  }

  /** Decode with positional indices: each surviving row carries its
    * pre-filter record number, so a table containing deleted (0x2A)
    * records still aligns attribute rows with their .shp geometry
    * (GDAL/OGR ignores the deletion flag in shapefile sidecars for
    * exactly this reason — a deleted row must still occupy its slot). */
  def readIndexed(bytes: Array[Byte]): (Seq[Field], Seq[(Int, Seq[String])]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val version = buf.get(0) & 0x07
    require(version == 3, s"unsupported dbf version byte ${bytes(0)}")
    val nRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff
    val fields = Iterator.from(0)
      .map(i => 32 + 32 * i)
      .takeWhile(p => p + 32 <= headerSize && bytes(p) != 0x0D)
      .map { p =>
        val nameEnd = (p until p + 11).find(i => bytes(i) == 0).getOrElse(p + 11)
        Field(new String(bytes, p, nameEnd - p, StandardCharsets.US_ASCII),
          bytes(p + 11).toChar, bytes(p + 16) & 0xff, bytes(p + 17) & 0xff)
      }.toSeq
    require(fields.nonEmpty, "dbf has no fields")
    val rows = (0 until nRecords).flatMap { r =>
      val at = headerSize + r.toLong * recordSize
      if (at + recordSize > bytes.length || bytes(at.toInt) == 0x2A) None
      else {
        var p = at.toInt + 1
        Some((r, fields.map { f =>
          val v = new String(bytes, p, f.length, StandardCharsets.US_ASCII).trim
          p += f.length
          v
        }))
      }
    }
    (fields, rows)
  }
}
