package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GRIB2 scene codec (WMO FM 92 GRIB Edition 2 — the public
  * regulation; the format NWP products ship: GFS, ECMWF open data,
  * HRRR). The reference reads it through GDAL (rasterio.py); graft
  * decodes the regular-lat/lon simple-packing subset natively, the
  * same discipline as [[NetCdf]]/[[NetCdf4]]/[[Zarr]].
  *
  * Subset implemented:
  *  - one FIELD per message; files are message STREAMS (temporal
  *    stacks = one message per instant, the real-world layout);
  *  - section 3 grid template 3.0 (regular lat/lon): Ni×Nj points,
  *    first-point/last-point coords and Di/Dj increments in
  *    micro-degrees (sign-magnitude MSB per the GRIB convention),
  *    scanning mode 0 (west→east, north→south — row-major y-down,
  *    the engine's tile order);
  *  - LONGITUDE SPACE: by default the codec preserves the caller's x
  *    coordinates verbatim (negative = sign-magnitude), i.e. the
  *    engine's ±180 convention, and decode never re-wraps — a
  *    documented SUBSET divergence from regulation 92.1.5's
  *    0..360-only storage. The two spaces are ambiguous without
  *    metadata (a Lo1 of 200e6 is 200°E in one and out-of-range in
  *    the other), so wrapping silently would corrupt non-geographic
  *    grids. For files meant for EXTERNAL readers (eccodes/GDAL),
  *    encode with `normalizeLon = true` (r19): longitudes store
  *    regulation-conformant in [0, 360) via an exact integer
  *    micro-degree shift. Regulation files west of Greenwich —
  *    whether from real NWP producers or normalized exports — decode
  *    with 0..360-space extents and the caller shifts by -360 where
  *    geography requires it (the same contract GDAL's GRIB driver
  *    exposes). A GREENWICH-CROSSING grid (xmin < 0 < xmax) under
  *    `normalizeLon` stores Lo1 > Lo2 (e.g. 350e6 → 10e6) — valid per
  *    regulation 92.1.5 because Di is given explicitly, but some
  *    external readers special-case it; graft's own decode is
  *    Lo1+Di-driven, so such a file reads back as the CONTIGUOUS
  *    extent [Lo1-Di/2, Lo1-Di/2 + Ni·Di) extending past 360 (the
  *    wrap spec pins this). Callers needing single-space extents for
  *    crossing grids should keep the verbatim default;
  *  - section 4 product template 4.0 (analysis at reference time —
  *    the instant rides section 1's calendar fields);
  *  - section 5 data template 5.0 (simple packing): Y = (R + X·2^E) /
  *    10^D with E = 0 and caller-chosen decimal scale D; R = the
  *    scaled minimum, X packed big-endian at the tightest bit width
  *    (≤ 32). Exact roundtrip whenever v·10^D is integral — the
  *    integral-grid oracle case, and the same quantization contract
  *    real GRIB simple packing carries;
  *  - section 6 bitmap: present iff the grid has missing cells (NaN);
  *  - sections 0/8 indicator + "7777" trailer, total-length framing.
  *
  * Scale shape: per-scene encode/decode inside Dataset.map/flatMap —
  * distributed, no driver bytes (the NetCdf shape).
  */
object Grib2 {

  // --------------------------------------------------------- byte utils

  private final class W {
    val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32(v: Long): Unit = { u8((v >>> 24).toInt); u8((v >>> 16).toInt); u8((v >>> 8).toInt); u8(v.toInt) }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xffffffffL) }
    /** GRIB signed: sign-magnitude with the MSB as the sign bit. */
    def s32(v: Long): Unit = if (v >= 0) u32(v) else u32(math.abs(v) | 0x80000000L)
    def s16(v: Int): Unit = if (v >= 0) u16(v) else u16(math.abs(v) | 0x8000)
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL)
    def bytes(b: Array[Byte]): Unit = buf.write(b)
  }

  private def ru8(b: Array[Byte], p: Int): Int = b(p) & 0xff
  private def ru16(b: Array[Byte], p: Int): Int = (ru8(b, p) << 8) | ru8(b, p + 1)
  private def ru32(b: Array[Byte], p: Int): Long =
    (ru16(b, p).toLong << 16) | ru16(b, p + 2)
  private def rs32(b: Array[Byte], p: Int): Long = {
    val v = ru32(b, p)
    if ((v & 0x80000000L) != 0) -(v & 0x7fffffffL) else v
  }
  private def rs16(b: Array[Byte], p: Int): Int = {
    val v = ru16(b, p)
    if ((v & 0x8000) != 0) -(v & 0x7fff) else v
  }
  private def rf32(b: Array[Byte], p: Int): Float =
    java.lang.Float.intBitsToFloat(ru32(b, p).toInt)

  // ------------------------------------------------ civil-date conversion

  /** Epoch seconds → (y, m, d, h, min, s) UTC — the public
    * days-from-civil inverse (Hinnant's algorithm; proleptic
    * Gregorian). */
  private[raster] def civilOf(epoch: Long): (Int, Int, Int, Int, Int, Int) = {
    val days = math.floorDiv(epoch, 86400L)
    val secs = math.floorMod(epoch, 86400L)
    val z = days + 719468L
    val era = math.floorDiv(z, 146097L)
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val y = yoe + era * 400
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val yy = if (m <= 2) y + 1 else y
    (yy.toInt, m.toInt, d.toInt, (secs / 3600).toInt, (secs % 3600 / 60).toInt, (secs % 60).toInt)
  }

  /** (y, m, d, h, min, s) UTC → epoch seconds (days-from-civil). */
  private[raster] def epochOf(y: Int, m: Int, d: Int, h: Int, min: Int, s: Int): Long = {
    val yy = if (m <= 2) y - 1 else y
    val era = math.floorDiv(yy.toLong, 400L)
    val yoe = yy - era * 400
    val mp = if (m > 2) m - 3 else m + 9
    val doy = (153 * mp + 2) / 5 + d - 1
    val doe = 365L * yoe + yoe / 4 - yoe / 100 + doy
    (era * 146097L + doe - 719468L) * 86400L + h * 3600L + min * 60L + s
  }

  // ------------------------------------------------------------- encode

  /** One GRIB2 message: a cols×rows grid (row-major y-down) with the
    * engine's extent convention (first point = NW cell CENTER in
    * micro-degree units). `decimalScale` D: values must be integral
    * after ×10^D (the simple-packing exactness contract; loud failure
    * otherwise). `epoch` stamps section 1's reference time.
    *
    * Coordinate precision: GRIB template 3.0 stores coordinates and
    * increments as micro-degree INTEGERS, so extents quantize to the
    * nearest 10⁻⁶ degree (≤ 0.5 µ° shift per value — the format's own
    * precision, identical to what any GRIB writer does). Exact
    * extent roundtrip therefore requires micro-degree-representable
    * extents/cell sizes; sub-µ° cell widths would alias and should be
    * rescaled before export. */
  def encodeGrid(cells: Array[Double], cols: Int, rows: Int,
                 xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                 epoch: Long = 0L, decimalScale: Int = 0,
                 normalizeLon: Boolean = false): Array[Byte] = {
    require(cells.length == cols * rows, "cells must be cols*rows row-major")
    require(decimalScale >= 0 && decimalScale <= 6, "decimalScale 0..6")
    require(!normalizeLon || xmax - xmin <= 360.0,
      "normalizeLon: grid spans more than 360 degrees of longitude")
    val scale = math.pow(10, decimalScale)
    val present = cells.map(!_.isNaN)
    val nPresent = present.count(identity)
    val scaled = new Array[Long](nPresent)
    var j = 0
    cells.indices.foreach { i =>
      if (present(i)) {
        val s = cells(i) * scale
        require(s == math.rint(s) && math.abs(s) < (1L << 52).toDouble,
          s"cell ${cells(i)} not integral at decimalScale=$decimalScale — " +
            "simple packing is exact only for 10^D-integral values")
        scaled(j) = s.toLong
        j += 1
      }
    }
    val refV = if (nPresent == 0) 0L else scaled.min
    val span = if (nPresent == 0) 0L else scaled.max - refV
    val nbits =
      if (span == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(span)
    require(nbits <= 32, s"value span $span exceeds 32-bit simple packing")
    // reference value R is an IEEE float32 — exact only for |R| < 2^24
    require(math.abs(refV) < (1L << 24), s"reference value $refV exceeds f32 exactness")

    val cw = (xmax - xmin) / cols; val ch = (ymax - ymin) / rows
    def micro(v: Double): Long = {
      val m = math.rint(v * 1e6)
      require(math.abs(m) < (1L << 31), s"coordinate $v out of micro-degree range")
      m.toLong
    }
    val la1 = micro(ymax - ch / 2); val la2 = micro(ymin + ch / 2)
    // normalizeLon: regulation 92.1.5 conformance for EXTERNAL readers
    // (eccodes/GDAL) — longitudes store in [0, 360) micro-degrees
    // (exact integer shift), so files west of Greenwich carry 260e6
    // instead of the sign-magnitude -100e6 the verbatim subset writes.
    // Decode stays verbatim (Lo1 + Di drive the extent; a normalized
    // file therefore decodes with 0..360-space extents and the caller
    // shifts by -360 where geography requires it — the GDAL GRIB
    // contract documented in README/the header note).
    def lon(v: Double): Long =
      if (normalizeLon) math.floorMod(micro(v), 360000000L) else micro(v)
    val lo1 = lon(xmin + cw / 2); val lo2 = lon(xmax - cw / 2)

    val w = new W
    // section 1 — identification (21 bytes)
    val (yy, mm, dd, hh, mi, ss) = civilOf(epoch)
    val s1 = new W
    s1.u32(21); s1.u8(1)
    s1.u16(0); s1.u16(0); s1.u8(0); s1.u8(0); s1.u8(1) // centre/subcentre/tables/local/significance
    s1.u16(yy); s1.u8(mm); s1.u8(dd); s1.u8(hh); s1.u8(mi); s1.u8(ss)
    s1.u8(0); s1.u8(0) // production status, data type
    // section 3 — grid definition, template 3.0 (72 bytes)
    val s3 = new W
    s3.u32(72); s3.u8(3)
    s3.u8(0); s3.u32(cols.toLong * rows); s3.u8(0); s3.u8(0); s3.u16(0)
    s3.u8(6) // shape of earth: spherical r=6371229
    s3.u8(0); s3.u32(0); s3.u8(0); s3.u32(0); s3.u8(0); s3.u32(0) // radius/axis factors
    s3.u32(cols); s3.u32(rows)
    s3.u32(0); s3.u32(0) // basic angle, subdivisions
    s3.s32(la1); s3.s32(lo1)
    s3.u8(0x30) // resolution/component flags: i+j increments given
    s3.s32(la2); s3.s32(lo2)
    s3.u32(micro(cw)); s3.u32(micro(ch))
    s3.u8(0) // scanning mode 0: +i (W->E), -j (N->S), row-major
    // section 4 — product definition, template 4.0 (34 bytes)
    val s4 = new W
    s4.u32(34); s4.u8(4)
    s4.u16(0); s4.u16(0) // NV, template 4.0
    s4.u8(0); s4.u8(0); s4.u8(0); s4.u8(255); s4.u8(0) // category..process id
    s4.u16(0); s4.u8(0) // hours(2) + minutes(1) after reference
    s4.u8(1); s4.u32(0) // time unit hour, forecast time 0
    s4.u8(1); s4.u8(0); s4.u32(0) // surface type/scale/value
    s4.u8(255); s4.u8(0); s4.u32(0) // second surface: missing
    // section 5 — data representation, template 5.0 (21 bytes)
    val s5 = new W
    s5.u32(21); s5.u8(5)
    s5.u32(nPresent)
    s5.u16(0) // template 5.0
    s5.f32(refV.toFloat)
    s5.s16(0) // binary scale E = 0
    s5.s16(decimalScale)
    s5.u8(nbits)
    s5.u8(0) // field type: floating point
    // section 6 — bitmap
    val hasBitmap = nPresent != cells.length
    val s6 = new W
    if (hasBitmap) {
      s6.u32(6 + (cells.length + 7) / 8); s6.u8(6); s6.u8(0)
      var acc = 0; var nb = 0
      cells.indices.foreach { i =>
        acc = (acc << 1) | (if (present(i)) 1 else 0); nb += 1
        if (nb == 8) { s6.u8(acc); acc = 0; nb = 0 }
      }
      if (nb > 0) s6.u8(acc << (8 - nb))
    } else { s6.u32(6); s6.u8(6); s6.u8(255) }
    // section 7 — packed data (big-endian nbits stream)
    val s7 = new W
    val dataBytes = (nbits.toLong * nPresent + 7) / 8
    s7.u32(5 + dataBytes); s7.u8(7)
    if (nbits > 0) {
      var acc = 0L; var nb = 0
      scaled.foreach { v =>
        acc = (acc << nbits) | (v - refV); nb += nbits
        while (nb >= 8) { s7.u8(((acc >>> (nb - 8)) & 0xff).toInt); nb -= 8 }
      }
      if (nb > 0) s7.u8(((acc << (8 - nb)) & 0xff).toInt)
    }
    val body = s1.buf.toByteArray ++ s3.buf.toByteArray ++ s4.buf.toByteArray ++
      s5.buf.toByteArray ++ s6.buf.toByteArray ++ s7.buf.toByteArray
    // section 0 — indicator (16 bytes) + total length
    w.bytes("GRIB".getBytes("US-ASCII"))
    w.u16(0); w.u8(0) // reserved, discipline 0 (meteorological)
    w.u8(2) // edition 2
    w.u64(16L + body.length + 4)
    w.bytes(body)
    w.bytes("7777".getBytes("US-ASCII"))
    w.buf.toByteArray
  }

  /** Temporal stack: one MESSAGE per instant, concatenated — the real
    * GRIB file layout ([[NetCdf.encodeScenes]] twin). */
  def encodeScenes(instants: Array[Long], slabs: Array[Array[Double]],
                   cols: Int, rows: Int,
                   xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                   decimalScale: Int = 0,
                   normalizeLon: Boolean = false): Array[Byte] = {
    require(instants.length == slabs.length && slabs.forall(_.length == cols * rows),
      "one cols*rows slab per instant")
    instants.zip(slabs).flatMap { case (t, s) =>
      encodeGrid(s, cols, rows, xmin, ymin, xmax, ymax, t, decimalScale,
        normalizeLon)
    }
  }

  // ------------------------------------------------------------- decode

  /** One decoded field. Extent back-derives from the first/last point
    * centers + increments. */
  private[raster] final case class Field(epoch: Long, cols: Int, rows: Int,
                                         xmin: Double, ymin: Double,
                                         xmax: Double, ymax: Double,
                                         cells: Array[Double])

  /** Decode every message of a GRIB2 stream. Loud failure on
    * unsupported templates (the codec-subset contract). */
  private[raster] def decode(b: Array[Byte]): Seq[Field] = {
    val out = Seq.newBuilder[Field]
    var p = 0
    while (p < b.length) {
      require(b.length - p >= 16 && new String(b, p, 4, "US-ASCII") == "GRIB",
        s"bad GRIB indicator at $p")
      require(ru8(b, p + 7) == 2, "GRIB edition 2 only")
      val total = ((ru32(b, p + 8) << 32) | ru32(b, p + 12))
      val end = p + total.toInt
      require(new String(b, end - 4, 4, "US-ASCII") == "7777", "missing 7777 trailer")
      var q = p + 16
      var epoch = 0L
      var cols = 0; var rows = 0
      var xmin = 0.0; var ymin = 0.0; var xmax = 0.0; var ymax = 0.0
      var refV = 0f; var binScale = 0; var decScale = 0; var nbits = 0
      var nPresent = 0
      var bitmap: Array[Boolean] = null
      var packed: Array[Byte] = null
      while (q < end - 4) {
        val len = ru32(b, q).toInt
        val num = ru8(b, q + 4)
        num match {
          case 1 =>
            epoch = epochOf(ru16(b, q + 12), ru8(b, q + 14), ru8(b, q + 15),
              ru8(b, q + 16), ru8(b, q + 17), ru8(b, q + 18))
          case 2 => // local use: skip
          case 3 =>
            require(ru16(b, q + 12) == 0, "grid template 3.0 only")
            cols = ru32(b, q + 30).toInt; rows = ru32(b, q + 34).toInt
            val la1 = rs32(b, q + 46) / 1e6; val lo1 = rs32(b, q + 50) / 1e6
            val di = ru32(b, q + 63) / 1e6; val dj = ru32(b, q + 67) / 1e6
            require(ru8(b, q + 71) == 0, "scanning mode 0 only")
            xmin = lo1 - di / 2; xmax = lo1 - di / 2 + di * cols
            ymax = la1 + dj / 2; ymin = la1 + dj / 2 - dj * rows
          case 4 => // product definition: nothing needed beyond sec 1 time
          case 5 =>
            require(ru16(b, q + 9) == 0, "data template 5.0 (simple packing) only")
            nPresent = ru32(b, q + 5).toInt
            refV = rf32(b, q + 11)
            binScale = rs16(b, q + 15)
            decScale = rs16(b, q + 17)
            nbits = ru8(b, q + 19)
          case 6 =>
            ru8(b, q + 5) match {
              case 255 => bitmap = null
              case 0 =>
                bitmap = Array.tabulate(cols * rows)(i =>
                  (ru8(b, q + 6 + i / 8) & (0x80 >>> (i % 8))) != 0)
              case o => throw new IllegalArgumentException(s"bitmap indicator $o")
            }
          case 7 => packed = java.util.Arrays.copyOfRange(b, q + 5, q + len)
          case o => throw new IllegalArgumentException(s"unexpected section $o")
        }
        q += len
      }
      val n = cols * rows
      val cells = Array.fill(n)(Double.NaN)
      val xs = new Array[Long](nPresent)
      if (nbits > 0) {
        var acc = 0L; var nb = 0; var bi = 0
        var k = 0
        while (k < nPresent) {
          while (nb < nbits) { acc = (acc << 8) | ru8(packed, bi); bi += 1; nb += 8 }
          xs(k) = (acc >>> (nb - nbits)) & ((1L << nbits) - 1)
          nb -= nbits
          k += 1
        }
      }
      val mul = math.pow(2, binScale); val div = math.pow(10, decScale)
      var k = 0
      var i = 0
      while (i < n) {
        if (bitmap == null || bitmap(i)) {
          // nbits == 0 means every present cell carries the reference
          val x = if (nbits == 0) 0L else xs(k)
          cells(i) = (refV + x * mul) / div
          k += 1
        }
        i += 1
      }
      out += Field(epoch, cols, rows, xmin, ymin, xmax, ymax, cells)
      p = end
    }
    out.result()
  }

  // -------------------------------------------------------- layer glue

  /** GRIB2 byte scenes → [[UntiledRaster]] (first message per blob —
    * the 2D ingest; [[NetCdf.fromNetCdf]] twin). `gribs` columns:
    * (scene_id, grib). */
  def fromGrib(gribs: DataFrame): UntiledRaster = {
    val spark = gribs.sparkSession
    import spark.implicits._
    val scenes = gribs.select(col("scene_id"), col("grib")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val f = decode(bytes).headOption.getOrElse(throw new IllegalArgumentException(
          s"scene $id: GRIB blob contains no messages"))
        (id, f.xmin, f.ymin, f.xmax, f.ymax, f.cols, f.rows, f.cells.toSeq)
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Temporal twin: every MESSAGE becomes one scene stamped with its
    * section-1 reference time (epoch seconds). */
  def fromGribTemporal(gribs: DataFrame): UntiledRaster = {
    val spark = gribs.sparkSession
    import spark.implicits._
    val scenes = gribs.select(col("scene_id"), col("grib")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decode(bytes).zipWithIndex.map { case (f, r) =>
          (id * 65536 + r, f.xmin, f.ymin, f.xmax, f.ymax, f.cols, f.rows,
            f.cells.toSeq, f.epoch)
        }
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells", "instant")
    UntiledRaster(scenes)
  }

  /** Layer → one GRIB2 message per tile — (col, row, grib BINARY).
    * `normalizeLon = true` stores regulation-conformant [0, 360)
    * longitudes for external readers (see [[encodeGrid]]). */
  def toGrib(layer: RasterLayer, decimalScale: Int = 0,
             normalizeLon: Boolean = false): DataFrame = {
    val spark = layer.df.sparkSession
    import spark.implicits._
    val meta = layer.meta
    val tl = meta.layout.tileLayout
    val ext = meta.layout.extent
    val cw = meta.layout.cellWidth; val chh = meta.layout.cellHeight
    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .map { case (c, r, tile) =>
        val xmin = ext.xmin + c.toLong * tl.tileCols * cw
        val ymax = ext.ymax - r.toLong * tl.tileRows * chh
        (c, r, encodeGrid(tile.toArray, tl.tileCols, tl.tileRows,
          xmin, ymax - tl.tileRows * chh, xmin + tl.tileCols * cw, ymax,
          epoch = 0L, decimalScale = decimalScale, normalizeLon = normalizeLon))
      }
      .toDF("col", "row", "grib")
  }
}
