package graft.raster

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.core.Extent

/** Minimal GeoTIFF encoding — the WHAT of the reference's
  * to_geotiff_rdd (layer.py:542,1546): one single-band float32 GeoTIFF
  * per tile, (key, bytes) pairs. Little-endian classic TIFF, one strip,
  * uncompressed, with the two GeoTIFF geo-tags a reader needs
  * (ModelPixelScale + ModelTiepoint) and a minimal GeoKeyDirectory.
  * Built from the public TIFF 6.0 / GeoTIFF 1.1 specs — no codec
  * dependency. NoData (NaN) is written as the float NaN bit pattern.
  *
  * Runs as a narrow mapPartitions: encode is per-tile, no shuffle.
  */
object GeoTiff {

  final case class GeoTiffTile(col: Int, row: Int, tiff: Array[Byte])

  private val TagImageWidth       = 256
  private val TagImageLength      = 257
  private val TagBitsPerSample    = 258
  private val TagCompression      = 259
  private val TagPhotometric      = 262
  private val TagStripOffsets     = 273
  private val TagSamplesPerPixel  = 277
  private val TagRowsPerStrip     = 278
  private val TagStripByteCounts  = 279
  private val TagPlanarConfig     = 284
  private val TagDateTime         = 306 // ASCII "yyyy:MM:dd HH:mm:ss" (TIFF 6.0)
  private val TagTileWidth        = 322
  private val TagTileLength       = 323
  private val TagTileOffsets      = 324
  private val TagTileByteCounts   = 325
  private val TagSampleFormat     = 339
  private val TagPredictor        = 317
  private val TagModelPixelScale  = 33550
  private val TagModelTiepoint    = 33922
  private val TagGeoKeyDirectory  = 34735

  /** Encode one tile (row-major float64 cells) as float32 GeoTIFF
    * bytes anchored at world coords (originX, originY = top-left).
    * `deflate` = DeflateCompression (reference constants.py:282);
    * false = NoCompression. */
  def encodeTile(cells: Array[Double], cols: Int, rows: Int,
                 originX: Double, originY: Double,
                 cellW: Double, cellH: Double,
                 deflate: Boolean = false,
                 dateTime: Option[String] = None): Array[Byte] =
    encodeTileMB(Seq(cells), cols, rows, originX, originY, cellW, cellH, deflate, dateTime)

  /** Multiband float32 GeoTIFF (chunky/pixel-interleaved, TIFF
    * PlanarConfiguration=1) — the encode half of the reference's
    * multiband to_geotiff_rdd (layer.py:1546) and save_stitched
    * (layer.py:1981). BitsPerSample/SampleFormat become per-band
    * arrays (stored externally when > 2 bands — TIFF inline values
    * hold at most two shorts). */
  def encodeTileMB(bands: Seq[Array[Double]], cols: Int, rows: Int,
                   originX: Double, originY: Double,
                   cellW: Double, cellH: Double,
                   deflate: Boolean = false,
                   dateTime: Option[String] = None): Array[Byte] = {
    // `dateTime` writes TIFF tag 306 (DateTime, ASCII, NUL-terminated;
    // conventional format "yyyy:MM:dd HH:mm:ss") — the acquisition
    // instant temporal scene ingestion (reference geotiff.py:25
    // time_tag) parses back via [[sceneInstant]]
    val nb = bands.length
    require(nb >= 1 && bands.forall(_.length == cols * rows), "band shape mismatch")
    // pixel-interleaved strip (possibly deflated)
    val raw = ByteBuffer.allocate(cols * rows * nb * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < cols * rows) {
      var b = 0
      while (b < nb) { raw.putFloat(bands(b)(i).toFloat); b += 1 }
      i += 1
    }
    val strip =
      if (!deflate) raw.array()
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(raw.array()); d.finish()
        val out = new ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
        d.end()
        out.toByteArray
      }

    // DateTime bytes (tag 306, ASCII, NUL-terminated) live external
    // after the geokeys; ASCII values <= 4 bytes could pack inline but
    // the conventional 20-byte stamp never fits
    val dtBytes = dateTime.map(s => (s + "\u0000").getBytes("US-ASCII"))
    val nTags = 14 + (if (dtBytes.isDefined) 1 else 0)
    val headerSize = 8
    val ifdSize = 2 + nTags * 12 + 4
    val ifdOffset = headerSize
    // external data after IFD: per-band shorts (when nb > 2), pixel
    // scale (3 doubles), tiepoint (6 doubles), geokeys, datetime,
    // then the strip
    val extShorts = if (nb > 2) nb * 2 else 0 // BitsPerSample + SampleFormat arrays
    val bitsOff  = ifdOffset + ifdSize
    val fmtOff   = bitsOff + (if (nb > 2) nb * 2 else 0)
    val scaleOff = bitsOff + extShorts * 2
    val tieOff   = scaleOff + 3 * 8
    val geoOff   = tieOff + 6 * 8
    val geoShorts: Array[Int] = Array(
      1, 1, 0, 3,        // version, rev 1.0, 3 keys follow
      1024, 0, 1, 1,     // GTModelTypeGeoKey = projected(1)... minimal
      1025, 0, 1, 1,     // GTRasterTypeGeoKey = PixelIsArea
      3072, 0, 1, 3857)  // ProjectedCSTypeGeoKey = web mercator
    val dtOff    = geoOff + geoShorts.length * 2
    val stripOff = dtOff + dtBytes.map(_.length).getOrElse(0)
    val total = stripOff + strip.length

    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    // header
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    // IFD
    buf.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(id.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    }
    // inline short-array values pack little-endian into the 4-byte slot
    def packedShorts(a: Int, b: Int): Int = (a & 0xffff) | (b << 16)
    val bitsValue = if (nb == 1) 32 else if (nb == 2) packedShorts(32, 32) else bitsOff
    val fmtValue  = if (nb == 1) 3  else if (nb == 2) packedShorts(3, 3)   else fmtOff
    tag(TagImageWidth, 3, 1, cols)
    tag(TagImageLength, 3, 1, rows)
    tag(TagBitsPerSample, 3, nb, bitsValue)
    tag(TagCompression, 3, 1, if (deflate) 8 else 1) // 8 = Adobe deflate
    tag(TagPhotometric, 3, 1, 1)      // BlackIsZero
    tag(TagStripOffsets, 4, 1, stripOff)
    tag(TagSamplesPerPixel, 3, 1, nb)
    tag(TagRowsPerStrip, 3, 1, rows)
    tag(TagStripByteCounts, 4, 1, strip.length)
    tag(TagPlanarConfig, 3, 1, 1)     // chunky (pixel-interleaved)
    dtBytes.foreach(b => tag(TagDateTime, 2, b.length, dtOff)) // sorted: 284 < 306 < 339
    tag(TagSampleFormat, 3, nb, fmtValue)
    tag(TagModelPixelScale, 12, 3, scaleOff)
    tag(TagModelTiepoint, 12, 6, tieOff)
    tag(TagGeoKeyDirectory, 3, geoShorts.length, geoOff)
    buf.putInt(0) // next IFD
    // external per-band arrays (only when nb > 2)
    if (nb > 2) {
      (0 until nb).foreach(_ => buf.putShort(32))
      (0 until nb).foreach(_ => buf.putShort(3))
    }
    // geo data
    buf.putDouble(cellW).putDouble(cellH).putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      .putDouble(originX).putDouble(originY).putDouble(0.0)
    geoShorts.foreach(s => buf.putShort(s.toShort))
    dtBytes.foreach(buf.put)
    buf.put(strip)
    buf.array()
  }

  /** Decode a GeoTIFF produced by [[encodeTile]] (single-strip LE
    * float32 subset): returns (originX, originY, cellW, cellH, cols,
    * rows, cells). The read half of the reference's geotiff ingestion
    * (geotiff.py get -> RasterLayer). */
  def decodeTile(bytes: Array[Byte]): (Double, Double, Double, Double, Int, Int, Array[Double]) = {
    val (ox, oy, cw, ch, cols, rows, bands) = decodeTileMB(bytes)
    require(bands.length == 1, s"expected single band, found ${bands.length}")
    (ox, oy, cw, ch, cols, rows, bands.head)
  }

  /** Multiband decode ([[encodeTileMB]] subset: single-strip LE
    * float32, chunky interleave): returns (originX, originY, cellW,
    * cellH, cols, rows, bands). */
  def decodeTileMB(bytes: Array[Byte]): (Double, Double, Double, Double, Int, Int, Seq[Array[Double]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'I' && buf.get() == 'I' && buf.getShort() == 42, "not a LE classic TIFF")
    val ifd = buf.getInt()
    buf.position(ifd)
    val n = buf.getShort()
    var cols = -1; var rows = -1; var stripOff = -1; var stripLen = -1
    var scaleOff = -1; var tieOff = -1; var compression = 1; var nb = 1
    (0 until n).foreach { _ =>
      // tag ids are unsigned shorts (geo tags are > 32767)
      val id = buf.getShort() & 0xffff; buf.getShort(); val count = buf.getInt()
      val v = buf.getInt()
      id match {
        case TagImageWidth      => cols = v
        case TagImageLength     => rows = v
        case TagStripOffsets    => stripOff = v
        case TagStripByteCounts => stripLen = v
        case TagModelPixelScale => scaleOff = v
        case TagModelTiepoint   => tieOff = v
        case TagSamplesPerPixel => nb = v
        case TagSampleFormat    =>
          // inline only for count <= 2; larger counts store externally
          // (all bands are float32 in this subset — skip validation)
          if (count == 1) require(v == 3, s"unsupported sample format $v")
        case TagCompression     =>
          require(v == 1 || v == 8, s"unsupported compression $v")
          compression = v
        case _ =>
      }
    }
    require(cols > 0 && rows > 0 && stripOff > 0 && scaleOff > 0 && tieOff > 0, "missing tags")
    val cw = buf.getDouble(scaleOff)
    val ch = buf.getDouble(scaleOff + 8)
    val originX = buf.getDouble(tieOff + 3 * 8)
    val originY = buf.getDouble(tieOff + 4 * 8)
    val strip: ByteBuffer =
      if (compression == 1) buf.duplicate().order(ByteOrder.LITTLE_ENDIAN).position(stripOff)
      else {
        val inf = new java.util.zip.Inflater()
        inf.setInput(bytes, stripOff, stripLen)
        val out = new Array[Byte](cols * rows * nb * 4)
        var done = 0
        while (!inf.finished() && done < out.length)
          done += inf.inflate(out, done, out.length - done)
        inf.end()
        ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      }
    val base = if (compression == 1) stripOff else 0
    val bands = Seq.fill(nb)(new Array[Double](cols * rows))
    var i = 0
    while (i < cols * rows) {
      var b = 0
      while (b < nb) {
        bands(b)(i) = strip.getFloat(base + 4 * (i * nb + b)).toDouble
        b += 1
      }
      i += 1
    }
    (originX, originY, cw, ch, cols, rows, bands)
  }

  // ------------------------------------------------------------------
  // General TIFF decode — reference geotiff.py:126 `get` reads
  // arbitrary rasters, not just this encoder's output. Classic TIFF
  // 6.0 subset wide enough for real-world single-plane rasters: both
  // byte orders, strip or internally-tiled organization, 8/16/32/64
  // bits, unsigned/signed/float sample formats, chunky interleave,
  // None or Deflate compression.
  // ------------------------------------------------------------------

  private def tagValues(buf: ByteBuffer, typ: Int, count: Int, inlinePos: Int,
                        big: Boolean = false): IndexedSeq[Double] = {
    val size = typ match {
      case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEF
      case 3 | 8         => 2 // SHORT/SSHORT
      case 4 | 9 | 11    => 4 // LONG/SLONG/FLOAT
      case 5 | 10 | 12   => 8 // RATIONAL/SRATIONAL/DOUBLE
      case 16 | 17 | 18  => 8 // LONG8/SLONG8/IFD8 (BigTIFF)
      case t => throw new IllegalArgumentException(s"unsupported TIFF tag type $t")
    }
    require(!(typ >= 16) || big, s"BigTIFF tag type $typ in a classic TIFF")
    // classic value fields hold 4 inline bytes, BigTIFF fields 8
    val inlineCap = if (big) 8 else 4
    val at: Long =
      if (size * count <= inlineCap) inlinePos.toLong
      else if (big) buf.getLong(inlinePos)
      else (buf.getInt(inlinePos) & 0xffffffffL)
    (0 until count).map { i =>
      val p = (at + i.toLong * size).toInt // in-memory scenes are < 2 GiB
      typ match {
        case 1 | 2 | 7 => (buf.get(p) & 0xff).toDouble
        case 6         => buf.get(p).toDouble
        case 3         => (buf.getShort(p) & 0xffff).toDouble
        case 8         => buf.getShort(p).toDouble
        case 4         => (buf.getInt(p) & 0xffffffffL).toDouble
        case 9         => buf.getInt(p).toDouble
        case 11        => buf.getFloat(p).toDouble
        case 5         => (buf.getInt(p) & 0xffffffffL).toDouble / (buf.getInt(p + 4) & 0xffffffffL)
        case 10        => buf.getInt(p).toDouble / buf.getInt(p + 4)
        case 12        => buf.getDouble(p)
        // Long -> Double is exact below 2^53 (8 PB of file offset)
        case 16 | 18   => buf.getLong(p).toDouble
        case 17        => buf.getLong(p).toDouble
      }
    }
  }

  /** TIFF 6.0 §13 LZW decompression (compression 5): MSB-first bit
    * packing, 9-bit initial codes, ClearCode 256 / EOI 257, "early
    * change" width bumps at next-code 511/1023/2047 (the variant every
    * real writer emits — LZW's patent expired in 2003; this is written
    * from the published spec). The wild's most common compression. */
  private[raster] def lzwDecode(src: Array[Byte], off: Int, len: Int,
                                rawLen: Int): Array[Byte] = {
    val out = new Array[Byte](rawLen)
    var outPos = 0
    var bitPos = 0L
    val endBit = len.toLong * 8
    var width = 9
    def readCode(): Int = {
      if (bitPos + width > endBit) return 257 // truncated stream: treat as EOI
      var v = 0
      var k = 0
      while (k < width) {
        val b = src(off + ((bitPos + k) >>> 3).toInt) & 0xff
        v = (v << 1) | ((b >>> (7 - ((bitPos + k) & 7).toInt)) & 1)
        k += 1
      }
      bitPos += width
      v
    }
    // table entries 0..255 are single bytes; suffix/prefix arrays
    // rebuild strings without per-entry allocation
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var next = 258
    def reset(): Unit = { next = 258; width = 9 }
    var i = 0
    while (i < 256) { prefix(i) = -1; suffix(i) = i.toByte; length(i) = 1; i += 1 }
    def firstByte(code: Int): Byte = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c)
    }
    def writeEntry(code: Int): Unit = {
      val n = length(code)
      require(outPos + n <= rawLen, "LZW output exceeds expected block size")
      var c = code
      var p = outPos + n - 1
      while (p >= outPos) { out(p) = suffix(c); c = prefix(c); p -= 1 }
      outPos += n
    }
    var old = -1
    var done = false
    while (!done && outPos < rawLen) {
      val code = readCode()
      if (code == 257) done = true
      else if (code == 256) { reset(); old = -1 }
      else {
        // code == next is the legal KwKwK pattern (the decoder's table
        // is one entry behind the encoder's); anything past that is
        // corruption
        require(code <= next, s"corrupt LZW stream: code $code > next $next")
        if (old < 0) require(code < 258, s"corrupt LZW stream: code $code right after clear")
        else if (next < 4096) {
          // reconstruct the entry the encoder added BEFORE emitting
          // this code: old's string + first byte of this code's string
          prefix(next) = old
          suffix(next) = firstByte(if (code == next) old else code)
          length(next) = length(old) + 1
          next += 1
        }
        writeEntry(code)
        old = code
        // early change, decoder side: the decoder's table is one entry
        // BEHIND the encoder's, and the encoder widens one code EARLY
        // (when its next free slot reaches 2^width, i.e. after adding
        // entry 2^width - 1) — net: the decoder widens when ITS next
        // reaches 511/1023/2047. Matches libtiff/GDAL/ImageIO streams.
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
    }
    require(outPos == rawLen || done,
      s"LZW block decoded $outPos of $rawLen expected bytes")
    out
  }

  /** PackBits decompression (compression 32773; TIFF 6.0 §9 /
    * Apple TN1023): n >= 0 -> copy n+1 literals; -127 <= n <= -1 ->
    * repeat next byte 1-n times; -128 -> no-op. */
  private[raster] def packBitsDecode(src: Array[Byte], off: Int, len: Int,
                                     rawLen: Int): Array[Byte] = {
    val out = new Array[Byte](rawLen)
    var ip = off; var op = 0
    val end = off + len
    while (ip < end && op < rawLen) {
      val n = src(ip); ip += 1
      if (n >= 0) {
        val cnt = math.min(n + 1, rawLen - op)
        System.arraycopy(src, ip, out, op, cnt)
        ip += n + 1; op += cnt
      } else if (n != -128) {
        val cnt = math.min(1 - n, rawLen - op)
        val b = src(ip); ip += 1
        java.util.Arrays.fill(out, op, op + cnt, b)
        op += cnt
      }
    }
    out
  }

  /** Undo TIFF horizontal differencing (Predictor tag 317 = 2), the
    * standard companion of LZW: within each row, each sample is stored
    * as the difference from the previous sample of the SAME band.
    * Integer widths only, per spec. */
  private def undoHorizontalPredictor(block: Array[Byte], rowWidth: Int, nRows: Int,
                                      nb: Int, bits: Int, bigEndian: Boolean): Unit = {
    val bpp = bits / 8
    val rowBytes = rowWidth * nb * bpp
    var r = 0
    while (r < nRows) {
      val base = r * rowBytes
      if (base + rowBytes <= block.length) {
        var i = nb // sample index within the row, skip first pixel
        while (i < rowWidth * nb) {
          val p = base + i * bpp
          val q = p - nb * bpp
          bits match {
            case 8 => block(p) = (block(p) + block(q)).toByte
            case 16 =>
              val (hi, lo) = if (bigEndian) (0, 1) else (1, 0)
              val cur = ((block(p + hi) & 0xff) << 8) | (block(p + lo) & 0xff)
              val prv = ((block(q + hi) & 0xff) << 8) | (block(q + lo) & 0xff)
              val s = (cur + prv) & 0xffff
              block(p + hi) = (s >>> 8).toByte; block(p + lo) = s.toByte
            case 32 =>
              def rd(at: Int): Int =
                if (bigEndian) ((block(at) & 0xff) << 24) | ((block(at + 1) & 0xff) << 16) | ((block(at + 2) & 0xff) << 8) | (block(at + 3) & 0xff)
                else ((block(at + 3) & 0xff) << 24) | ((block(at + 2) & 0xff) << 16) | ((block(at + 1) & 0xff) << 8) | (block(at) & 0xff)
              val s = rd(p) + rd(q)
              if (bigEndian) {
                block(p) = (s >>> 24).toByte; block(p + 1) = (s >>> 16).toByte
                block(p + 2) = (s >>> 8).toByte; block(p + 3) = s.toByte
              } else {
                block(p + 3) = (s >>> 24).toByte; block(p + 2) = (s >>> 16).toByte
                block(p + 1) = (s >>> 8).toByte; block(p) = s.toByte
              }
            case other => throw new IllegalArgumentException(
              s"predictor 2 with $other-bit samples unsupported")
          }
          i += 1
        }
      }
      r += 1
    }
  }

  /** Decode ANY supported classic TIFF into (originX, originY, cellW,
    * cellH, cols, rows, bands) — the general ingestion entry
    * (reference geotiff.py:126 get). Handles LE and BE files, strip
    * and tiled layouts, 8/16/32-bit integers (signed and unsigned),
    * float32/float64, multiband in BOTH interleaves (chunky planar=1
    * and band-separate planar=2), None/Deflate/LZW/PackBits
    * compression, horizontal-predictor LZW. Non-geo TIFFs default to
    * a unit grid anchored at (0, rows). */
  def decodeScene(bytes: Array[Byte]): (Double, Double, Double, Double, Int, Int, Seq[Array[Double]]) = {
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    require(le || be, "not a TIFF (bad byte-order mark)")
    val buf = ByteBuffer.wrap(bytes).order(
      if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val magic = buf.getShort(2)
    require(magic == 42 || magic == 43, s"not a TIFF (magic $magic)")
    val big = magic == 43
    if (big) require(buf.getShort(4) == 8 && buf.getShort(6) == 0,
      "malformed BigTIFF header (offset bytesize must be 8)")
    val ifd = if (big) buf.getLong(8).toInt else buf.getInt(4)
    val nt = if (big) buf.getLong(ifd).toInt else buf.getShort(ifd) & 0xffff
    val entrySize = if (big) 20 else 12
    val tags = (0 until nt).map { i =>
      val p = ifd + (if (big) 8 else 2) + i * entrySize
      val id = buf.getShort(p) & 0xffff
      val typ = buf.getShort(p + 2) & 0xffff
      val count = if (big) buf.getLong(p + 4).toInt else buf.getInt(p + 4)
      id -> ((typ, count, p + (if (big) 12 else 8)))
    }.toMap
    def vals(id: Int): Option[IndexedSeq[Double]] =
      tags.get(id).map { case (typ, count, pos) => tagValues(buf, typ, count, pos, big) }
    def one(id: Int, default: => Double): Double = vals(id).map(_.head).getOrElse(default)

    val cols = one(TagImageWidth, throw new IllegalArgumentException("missing ImageWidth")).toInt
    val rows = one(TagImageLength, throw new IllegalArgumentException("missing ImageLength")).toInt
    val nb = one(TagSamplesPerPixel, 1).toInt
    val bitsAll = vals(TagBitsPerSample).getOrElse(IndexedSeq(1.0))
    require(bitsAll.distinct.size == 1, "mixed per-band bit depths unsupported")
    val bits = bitsAll.head.toInt
    val fmtAll = vals(TagSampleFormat).getOrElse(IndexedSeq(1.0))
    val fmt = fmtAll.head.toInt
    val compression = one(TagCompression, 1).toInt
    require(Set(1, 5, 8, 32773).contains(compression),
      s"unsupported compression $compression (None/LZW/Deflate/PackBits only)")
    val predictor = one(TagPredictor, 1).toInt
    require(predictor == 1 || predictor == 2, s"unsupported predictor $predictor")
    require(predictor == 1 || fmt != 3, "predictor 2 is integer-only (TIFF 6.0)")
    val planar = one(TagPlanarConfig, 1).toInt
    require(planar == 1 || planar == 2, s"unsupported planar configuration $planar")
    // planar 2 = band-separate: each strip/tile holds ONE band's
    // samples; offsets list all of band 0's blocks, then band 1's, ...
    val blockNb = if (planar == 2) 1 else nb
    require(Set(8, 16, 32, 64).contains(bits), s"unsupported bit depth $bits")
    require(fmt >= 1 && fmt <= 3, s"unsupported sample format $fmt")
    require(!(bits == 64 && fmt != 3), "64-bit integer samples unsupported")

    val bpp = bits / 8
    def readSample(b: ByteBuffer, p: Int): Double = (bits, fmt) match {
      case (8, 1)  => (b.get(p) & 0xff).toDouble
      case (8, 2)  => b.get(p).toDouble
      case (16, 1) => (b.getShort(p) & 0xffff).toDouble
      case (16, 2) => b.getShort(p).toDouble
      case (32, 1) => (b.getInt(p) & 0xffffffffL).toDouble
      case (32, 2) => b.getInt(p).toDouble
      case (32, 3) => b.getFloat(p).toDouble
      case (64, 3) => b.getDouble(p)
      case other   => throw new IllegalArgumentException(s"unsupported sample $other")
    }
    def inflated(off: Int, len: Int, rawLen: Int, rowWidth: Int, nRows: Int): ByteBuffer = {
      val raw: Array[Byte] = compression match {
        case 1 =>
          // copy so the predictor (if any) can mutate safely
          java.util.Arrays.copyOfRange(bytes, off, off + math.min(rawLen, len))
        case 5 => lzwDecode(bytes, off, len, rawLen)
        case 8 =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(bytes, off, len)
          val out = new Array[Byte](rawLen)
          var done = 0
          while (!inf.finished() && done < rawLen)
            done += inf.inflate(out, done, rawLen - done)
          inf.end()
          out
        case 32773 => packBitsDecode(bytes, off, len, rawLen)
      }
      if (predictor == 2)
        undoHorizontalPredictor(raw, rowWidth, nRows, blockNb, bits, bigEndian = be)
      ByteBuffer.wrap(raw).order(buf.order())
    }

    val bands = Seq.fill(nb)(Array.fill(cols * rows)(Double.NaN))
    if (tags.contains(TagTileWidth)) {
      // internally-tiled organization
      val tw = one(TagTileWidth, 0).toInt; val th = one(TagTileLength, 0).toInt
      val offs = vals(TagTileOffsets).get; val cnts = vals(TagTileByteCounts).get
      val across = (cols + tw - 1) / tw
      val down = (rows + th - 1) / th
      val tilesPerBand = across * down
      require(offs.length >= (if (planar == 2) tilesPerBand * nb else tilesPerBand),
        "tile offset array shorter than the image's tile grid")
      for (idx <- 0 until (if (planar == 2) tilesPerBand * nb else tilesPerBand)) {
        val band0 = if (planar == 2) idx / tilesPerBand else 0
        val inBand = if (planar == 2) idx % tilesPerBand else idx
        val trI = inBand / across; val tcI = inBand % across
        val block = inflated(offs(idx).toLong.toInt, cnts(idx).toLong.toInt,
          tw * th * blockNb * bpp, tw, th)
        for (j <- 0 until th; i <- 0 until tw) {
          val gx = tcI * tw + i; val gy = trI * th + j
          if (gx < cols && gy < rows) {
            var b = 0
            while (b < blockNb) {
              bands(band0 + b)(gy * cols + gx) =
                readSample(block, ((j * tw + i) * blockNb + b) * bpp)
              b += 1
            }
          }
        }
      }
    } else {
      // strip organization (RowsPerStrip defaults to the whole image)
      val rps = math.max(1, math.min(rows.toLong, one(TagRowsPerStrip, rows).toLong).toInt)
      val offs = vals(TagStripOffsets).getOrElse(
        throw new IllegalArgumentException("missing StripOffsets"))
      val cnts = vals(TagStripByteCounts).getOrElse(IndexedSeq((rows.toLong * cols * nb * bpp).toDouble))
      val stripsPerBand = if (planar == 2) (rows + rps - 1) / rps else offs.length
      // planar=2 indexes bands(s / stripsPerBand): an offsets array
      // inconsistent with rows/RowsPerStrip would walk off the band
      // list deep in the loop — fail cleanly up front instead (the
      // tiled branch has the same guard)
      require(planar == 1 || offs.length == stripsPerBand * nb,
        s"planar=2 expects ${stripsPerBand * nb} strips (ceil(rows/rps) x bands), " +
        s"file has ${offs.length}")
      // only the strips the loop will actually read need byte counts
      // (planar=1 files may carry trailing offsets past the last row)
      val usedStrips =
        if (planar == 2) offs.length
        else math.min(offs.length, ((rows + rps - 1) / rps))
      require(cnts.length >= usedStrips,
        s"StripByteCounts has ${cnts.length} entries for $usedStrips strips" +
        (if (!tags.contains(TagStripByteCounts)) " (tag missing)" else ""))
      for (s <- offs.indices) {
        val band0 = if (planar == 2) s / stripsPerBand else 0
        val r0 = (if (planar == 2) s % stripsPerBand else s) * rps
        val nRows = math.min(rps, rows - r0)
        if (nRows > 0) {
          val block = inflated(offs(s).toLong.toInt, cnts(s).toLong.toInt,
            nRows * cols * blockNb * bpp, cols, nRows)
          for (j <- 0 until nRows; i <- 0 until cols) {
            var b = 0
            while (b < blockNb) {
              bands(band0 + b)((r0 + j) * cols + i) =
                readSample(block, ((j * cols + i) * blockNb + b) * bpp)
              b += 1
            }
          }
        }
      }
    }

    val scale = vals(TagModelPixelScale)
    val tie = vals(TagModelTiepoint)
    val cw = scale.map(_(0)).getOrElse(1.0)
    val ch = scale.map(_(1)).getOrElse(1.0)
    val ox = tie.map(_(3)).getOrElse(0.0)
    val oy = tie.map(_(4)).getOrElse(rows * ch)
    (ox, oy, cw, ch, cols, rows, bands)
  }

  /** Decode ANY self-decodable scene format into the [[decodeScene]]
    * tuple: TIFF natively (full geo grid + all bands), PNG/BMP/
    * baseline-JPEG via [[graft.pipeline.ImageCodec]] as R/G/B bands on
    * a unit grid anchored at (0, rows) — the same default grid non-geo
    * TIFFs get. The reference's RasterSource.readToLayout
    * (geopyspark-backend vlm/RasterSource.scala:89) reads arbitrary
    * GDAL formats to a layout; graft covers the formats it can decode
    * without native libraries. */
  def decodeAnyScene(bytes: Array[Byte]): (Double, Double, Double, Double, Int, Int, Seq[Array[Double]]) =
    if (bytes.length >= 2 &&
        ((bytes(0) == 'I' && bytes(1) == 'I') || (bytes(0) == 'M' && bytes(1) == 'M')))
      decodeScene(bytes)
    else {
      val img = graft.pipeline.ImageCodec.decode(bytes).getOrElse(
        throw new IllegalArgumentException(
          "unsupported scene format (TIFF, PNG, BMP, baseline JPEG)"))
      val n = img.width * img.height
      val bands = Array.fill(3)(new Array[Double](n))
      var i = 0
      while (i < n) {
        val p = img.pixels(i)
        bands(0)(i) = (p >> 16) & 0xff
        bands(1)(i) = (p >> 8) & 0xff
        bands(2)(i) = p & 0xff
        i += 1
      }
      (0.0, img.height.toDouble, 1.0, 1.0, img.width, img.height, bands.toSeq)
    }

  /** Mixed-format byte scenes -> UntiledRaster (multi-format
    * ingestion: decode distributed via [[decodeAnyScene]], then
    * tileToLayout). `blobs` columns: (scene_id LONG, blob BINARY);
    * band 0 rides (TIFF band 0, or the red = gray channel). */
  def fromScenes(blobs: org.apache.spark.sql.DataFrame): UntiledRaster = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val scenes = blobs.select(col("scene_id"), col("blob")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val (ox, oy, cw, ch, cols, rows, bands) = decodeAnyScene(bytes)
        (id, ox, oy - rows * ch, ox + cols * cw, oy, cols, rows, bands.head.toSeq)
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Parse the acquisition instant from TIFF tag 306 (DateTime, the
    * reference's DEFAULT_GEOTIFF_TIME_TAG "TIFFTAG_DATETIME" —
    * geotiff.py:25 time_tag / constants.py:29) as UTC epoch SECONDS.
    * Works on LE/BE classic TIFF and BigTIFF; None when the file
    * carries no tag 306. `timeFormat` is the reference's
    * DEFAULT_GEOTIFF_TIME_FORMAT pattern. */
  def sceneInstant(bytes: Array[Byte],
                   timeFormat: String = "yyyy:MM:dd HH:mm:ss"): Option[Long] = {
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    require(le || be, "not a TIFF (bad byte-order mark)")
    val buf = ByteBuffer.wrap(bytes).order(
      if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val big = buf.getShort(2) == 43
    val ifd = if (big) buf.getLong(8).toInt else buf.getInt(4)
    val nt = if (big) buf.getLong(ifd).toInt else buf.getShort(ifd) & 0xffff
    val entrySize = if (big) 20 else 12
    (0 until nt).iterator
      .map(i => ifd + (if (big) 8 else 2) + i * entrySize)
      .find(p => (buf.getShort(p) & 0xffff) == TagDateTime)
      .map { p =>
        val count = if (big) buf.getLong(p + 4).toInt else buf.getInt(p + 4)
        val vpos = p + (if (big) 12 else 8)
        val off =
          if (count <= (if (big) 8 else 4)) vpos
          else if (big) buf.getLong(vpos).toInt else buf.getInt(vpos)
        val raw = new Array[Byte](count)
        var i = 0
        while (i < count) { raw(i) = buf.get(off + i); i += 1 }
        val s = new String(raw, "US-ASCII").takeWhile(_ != 0.toChar).trim
        java.time.LocalDateTime
          .parse(s, java.time.format.DateTimeFormatter.ofPattern(timeFormat))
          .toEpochSecond(java.time.ZoneOffset.UTC)
      }
  }

  /** Temporal GeoTIFF scene ingestion — reference geotiff.py get with
    * layer_type=SPACETIME: decode each scene AND its tag-306 instant
    * distributed; the result feeds
    * [[UntiledRaster.tileToLayoutTemporal]] into a temporal layer /
    * catalog. Scenes without the tag fail loudly (a silent spatial
    * fallback would corrupt the temporal key space). */
  def fromGeoTiffTemporal(tiffs: org.apache.spark.sql.DataFrame,
                          timeFormat: String = "yyyy:MM:dd HH:mm:ss"): UntiledRaster = {
    val spark = tiffs.sparkSession
    import spark.implicits._
    val scenes = tiffs.select(col("scene_id"), col("tiff")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val (ox, oy, cw, ch, cols, rows, bands) = decodeScene(bytes)
        val inst = sceneInstant(bytes, timeFormat).getOrElse(
          throw new IllegalArgumentException(
            s"scene $id carries no DateTime (306) tag — temporal ingest needs one"))
        (id, ox, oy - rows * ch, ox + cols * cw, oy, cols, rows, bands.head.toSeq, inst)
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells", "instant")
    UntiledRaster(scenes)
  }

  /** GeoTIFF byte scenes -> UntiledRaster (the ingestion direction:
    * decode distributed, then tileToLayout). `tiffs` columns:
    * (scene_id LONG, tiff BINARY). */
  def fromGeoTiff(tiffs: org.apache.spark.sql.DataFrame): UntiledRaster = {
    val spark = tiffs.sparkSession
    import spark.implicits._
    val scenes = tiffs.select(col("scene_id"), col("tiff")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        // general decoder: accepts any supported TIFF, not just this
        // encoder's output; scenes are single-band (band 0)
        val (ox, oy, cw, ch, cols, rows, bands) = decodeScene(bytes)
        (id, ox, oy - rows * ch, ox + cols * cw, oy, cols, rows, bands.head.toSeq)
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Stitch the whole layer into ONE georeferenced multiband GeoTIFF
    * on the local filesystem — reference save_stitched
    * (layer.py:1981). Stitching is inherently a driver-side collect
    * (the reference's collects too); `maxCells` guards the driver heap
    * with an actionable error instead of an OOM. */
  def saveStitched(layer: RasterLayer, path: String, deflate: Boolean = true,
                   maxCells: Long = 256L * 1024 * 1024,
                   cropBounds: Option[Extent] = None,
                   cropDimensions: Option[(Int, Int)] = None): Unit = {
    require(!layer.meta.temporal,
      "saveStitched on a temporal layer would mix instants (last-write-wins " +
      "paint order); aggregate (aggregateByTime/toSpatial) or filter first")
    require(cropDimensions.isEmpty || cropBounds.nonEmpty,
      "crop_dimensions requires crop_bounds (reference layer.py:1981 contract)")
    val spark = layer.df.sparkSession
    import spark.implicits._
    val tiles = layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])].map { case (c, r, t) => (c, r, Seq(t)) }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      stitchedBytes(tiles, 1, layer.meta, deflate, maxCells, cropBounds, cropDimensions))
  }

  /** Multiband save_stitched: one pixel-interleaved GeoTIFF carrying
    * every band. */
  def saveStitchedMB(layer: MultibandLayer, path: String, deflate: Boolean = true,
                     maxCells: Long = 256L * 1024 * 1024): Unit = {
    val spark = layer.df.sparkSession
    import spark.implicits._
    val tiles = layer.df.select(col("col"), col("row"), col("bands"))
      .as[(Int, Int, Seq[Seq[Double]])]
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      stitchedBytes(tiles, layer.bandCount, layer.meta, deflate, maxCells))
  }

  private def stitchedBytes(tiles: Dataset[(Int, Int, Seq[Seq[Double]])], nb: Int,
                            meta: LayerMetadata, deflate: Boolean,
                            maxCells: Long,
                            cropBounds: Option[Extent] = None,
                            cropDimensions: Option[(Int, Int)] = None): Array[Byte] = {
    val tl = meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val e = meta.layout.extent
    val cw = meta.layout.cellWidth; val ch = meta.layout.cellHeight
    // crop window in grid cells (reference save_stitched crop_bounds,
    // layer.py:1981): clamp the sub-extent to the layout
    val (gx0, gy0, outC, outR) = cropBounds match {
      case None => (0L, 0L, tl.totalCols, tl.totalRows)
      case Some(cb) =>
        val x0 = math.max(0L, math.floor((cb.xmin - e.xmin) / cw).toLong)
        val x1 = math.min(tl.totalCols, math.ceil((cb.xmax - e.xmin) / cw).toLong)
        val y0 = math.max(0L, math.floor((e.ymax - cb.ymax) / ch).toLong)
        val y1 = math.min(tl.totalRows, math.ceil((e.ymax - cb.ymin) / ch).toLong)
        require(x1 > x0 && y1 > y0, s"crop_bounds $cb does not intersect the layer extent")
        (x0, y0, x1 - x0, y1 - y0)
    }
    require(outC * outR * nb <= maxCells,
      s"stitched raster is $outC x $outR x $nb bands = ${outC * outR * nb} cells " +
      s"> maxCells=$maxCells; write per-tile GeoTIFFs (toGeoTiff) instead")
    val grid = Seq.fill(nb)(Array.fill((outC * outR).toInt)(Double.NaN))
    // only tiles intersecting the crop window leave the executors
    val wanted = tiles.filter { q =>
      val c = q._1.toLong; val r = q._2.toLong
      c * tc < gx0 + outC && (c + 1) * tc > gx0 &&
      r * tr < gy0 + outR && (r + 1) * tr > gy0
    }
    wanted.collect().foreach { case (c, r, bands) =>
      var b = 0
      while (b < math.min(nb, bands.length)) {
        // toArray before the cell loop: the deserialized Seq is a
        // List, whose apply is O(n)
        val t = bands(b).toArray
        var j = 0
        while (j < tr) {
          val gy = r.toLong * tr + j - gy0
          var i = 0
          while (i < tc) {
            val gx = c.toLong * tc + i - gx0
            if (gx >= 0 && gy >= 0 && gx < outC && gy < outR)
              grid(b)((gy * outC + gx).toInt) = t(j * tc + i)
            i += 1
          }
          j += 1
        }
        b += 1
      }
    }
    val originX = e.xmin + gx0 * cw
    val originY = e.ymax - gy0 * ch
    // crop_dimensions: nearest-neighbor re-dimension of the cropped
    // window (reference pairs crop_dimensions with a resample)
    val (outGrid, fc, fr, fcw, fch) = cropDimensions match {
      case None => (grid, outC.toInt, outR.toInt, cw, ch)
      case Some((dc, dr)) =>
        require(dc > 0 && dr > 0)
        val g = grid.map { src =>
          val dst = new Array[Double](dc * dr)
          var j = 0
          while (j < dr) {
            val sy = ((j + 0.5) * outR / dr).toLong
            var i = 0
            while (i < dc) {
              val sx = ((i + 0.5) * outC / dc).toLong
              dst(j * dc + i) = src((sy * outC + sx).toInt)
              i += 1
            }
            j += 1
          }
          dst
        }
        (g, dc, dr, cw * outC / dc, ch * outR / dr)
    }
    encodeTileMB(outGrid, fc, fr, originX, originY, fcw, fch, deflate)
  }

  // ------------------------------------------------------------------
  // COG-style internally-tiled GeoTIFF (TIFF 6.0 §15 tiled images —
  // the layout cloud-optimized readers range-request against; the
  // read half of reference geotiff.py:126 windowed gets)
  // ------------------------------------------------------------------

  private def packFloats(cells: Seq[Double], deflate: Boolean): Array[Byte] = {
    val raw = ByteBuffer.allocate(cells.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    cells.foreach(v => raw.putFloat(v.toFloat))
    if (!deflate) raw.array()
    else {
      val d = new java.util.zip.Deflater()
      d.setInput(raw.array()); d.finish()
      val out = new ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end()
      out.toByteArray
    }
  }

  /** Write the whole layer as ONE internally-tiled GeoTIFF — the
    * cloud-optimized layout: each graft tile becomes a TIFF tile with
    * its own offset/byte-count, so a reader can window into the file
    * touching only the byte ranges it needs ([[readCogWindow]]).
    *
    * Scale shape: tiles DEFLATE-compress in the executors (narrow map,
    * parallel); only compressed blocks reach the driver, which streams
    * header + blocks to disk. Absent tiles all share one all-NoData
    * block (TIFF permits duplicate tile offsets). */
  def saveCog(layer: RasterLayer, path: String, deflate: Boolean = true,
              maxTiles: Long = 1L << 20, bigTiff: Boolean = false): Unit =
    saveCogPyramid(Seq(layer), path, deflate, maxTiles, bigTiff)

  /** COG with overviews: base layer + reduced-resolution levels (from
    * [[Pyramid.levelUp]]) in ONE file as chained IFDs — the full
    * cloud-optimized-GeoTIFF structure (base IFD first, then each
    * overview flagged NewSubfileType=reduced-image, as GDAL lays out
    * COGs). A zoomed-out viewer windows the overview IFD and touches
    * only those byte ranges ([[readCogWindow]] with `overview = i`).
    * `levels` ordering: base first, then successively coarser. */
  /** `bigTiff = true` writes the BigTIFF (version 43) layout — 8-byte
    * offsets and LONG8 tile arrays — lifting the classic format's
    * 4 GiB file ceiling; at 100 TB COG exports that ceiling is the
    * first wall a real mosaic hits. Readers here accept both. */
  def saveCogPyramid(levels: Seq[RasterLayer], path: String,
                     deflate: Boolean = true, maxTiles: Long = 1L << 20,
                     bigTiff: Boolean = false): Unit = {
    require(levels.nonEmpty)
    levels.foreach { l =>
      require(!l.meta.temporal,
        "COG export on a temporal layer would silently keep one arbitrary " +
        "instant per (col,row); aggregate (aggregateByTime/toSpatial) or " +
        "filter to a spatial layer first")
      val t = l.meta.layout.tileLayout
      require(t.tileCols % 16 == 0 && t.tileRows % 16 == 0,
        "TIFF tile dims must be multiples of 16")
      require(t.layoutCols.toLong * t.layoutRows <= maxTiles,
        s"${t.layoutCols.toLong * t.layoutRows} tiles > maxTiles=$maxTiles: " +
        "raise the cap or shard the layer first")
    }

    val geoShorts: Array[Int] = Array(
      1, 1, 0, 3,
      1024, 0, 1, 1,
      1025, 0, 1, 1,
      3072, 0, 1, 3857)

    // Per-level packed tiles: DEFLATE runs distributed and the blocks
    // STAY distributed (checkpointed); the driver collects only the
    // (col,row) -> byteCount map (16 bytes/tile) it needs to lay out
    // offsets. Data blocks later stream through the driver one
    // partition at a time (toLocalIterator) — single-file output means
    // every byte transits the driver, but heap is bounded by one
    // partition, not the whole compressed layer.
    final case class Level(meta: LayerMetadata,
                           lengths: Map[(Int, Int), Int],
                           packedDs: org.apache.spark.sql.Dataset[(Int, Int, Array[Byte])],
                           emptyBlock: Array[Byte], keys: Seq[(Int, Int)],
                           nTags: Int, ifdSize: Int, extSize: Int) {
      val hasEmpty: Boolean = lengths.size < keys.size
    }
    val lvls = levels.zipWithIndex.map { case (l, i) =>
      val t = l.meta.layout.tileLayout
      val spark = l.df.sparkSession
      import spark.implicits._
      val packedDs = l.df.select(col("col"), col("row"), col("tile"))
        .as[(Int, Int, Seq[Double])]
        .map { case (c, r, tile) => (c, r, packFloats(tile, deflate)) }
        .localCheckpoint()
      val lenRows = packedDs.map { case (c, r, b) => (c, r, b.length) }.collect()
      val lengths = lenRows.map { case (c, r, n) => (c, r) -> n }.toMap
      require(lengths.size == lenRows.length,
        "layer has duplicate (col,row) keys — merge/aggregate_by_cell first")
      val emptyBlock = packFloats(Seq.fill(t.tileCols * t.tileRows)(Double.NaN), deflate)
      val keys = for (r <- 0 until t.layoutRows; c <- 0 until t.layoutCols) yield (c, r)
      val n = keys.size
      // base IFD carries geo tags; overviews add NewSubfileType instead
      val nTags = if (i == 0) 15 else 13
      val ifdSize =
        if (bigTiff) 8 + nTags * 20 + 8 else 2 + nTags * 12 + 4
      val arrEntry = if (bigTiff) 8 else 4 // LONG8 vs LONG array cells
      val extArrays = if (n > 1) 2 * arrEntry * n else 0 // offsets + counts
      val extGeo = if (i == 0) 3 * 8 + 6 * 8 + geoShorts.length * 2 else 0
      Level(l.meta, lengths, packedDs, emptyBlock, keys, nTags, ifdSize, extArrays + extGeo)
    }

    // file layout: header, [IFD + ext]*, then all data blocks
    val hdrSize = if (bigTiff) 16L else 8L
    val ifdOffsets = lvls.scanLeft(hdrSize) { (off, lv) => off + lv.ifdSize + lv.extSize }
    val dataStart = ifdOffsets.last
    var cursor: Long = dataStart
    // block offsets per level (shared empty block first per level)
    val levelOffsets = lvls.map { lv =>
      val emptyOff = if (lv.hasEmpty) { val o = cursor; cursor += lv.emptyBlock.length; o } else -1L
      val offs = new Array[Long](lv.keys.size); val cnts = new Array[Int](lv.keys.size)
      lv.keys.zipWithIndex.foreach { case (k, i) =>
        lv.lengths.get(k) match {
          case Some(len) => offs(i) = cursor; cnts(i) = len; cursor += len
          case None      => offs(i) = emptyOff; cnts(i) = lv.emptyBlock.length
        }
      }
      (offs, cnts)
    }
    require(bigTiff || cursor <= Int.MaxValue,
      s"COG would be $cursor bytes — over the 2 GiB classic-TIFF offset " +
      s"limit; write with bigTiff = true, or shard the layer " +
      s"(writeFolder per-tile export) / split by extent")

    val buf = ByteBuffer.allocate(dataStart.toInt).order(ByteOrder.LITTLE_ENDIAN)
    if (bigTiff)
      buf.put('I'.toByte).put('I'.toByte).putShort(43).putShort(8).putShort(0)
        .putLong(ifdOffsets(0))
    else
      buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffsets(0).toInt)
    // one entry: classic 12 bytes (LONG count/value), BigTIFF 20
    // (LONG8 count/value); LONG array cells become LONG8
    def tag(id: Int, typ: Int, count: Int, value: Long): Unit =
      if (bigTiff)
        buf.putShort(id.toShort).putShort((if (typ == 4) 16 else typ).toShort)
          .putLong(count).putLong(value)
      else
        buf.putShort(id.toShort).putShort(typ.toShort).putInt(count.toInt)
          .putInt(value.toInt)
    val arrEntry = if (bigTiff) 8L else 4L
    lvls.zipWithIndex.foreach { case (lv, li) =>
      val t = lv.meta.layout.tileLayout
      val n = lv.keys.size
      val (offs, cnts) = levelOffsets(li)
      val extBase = ifdOffsets(li) + lv.ifdSize
      val offArrOff = extBase
      val cntArrOff = offArrOff + (if (n > 1) arrEntry * n else 0L)
      val geoBase   = cntArrOff + (if (n > 1) arrEntry * n else 0L)
      if (bigTiff) buf.putLong(lv.nTags.toLong) else buf.putShort(lv.nTags.toShort)
      // tags must stay in ascending id order (TIFF 6.0 requirement)
      if (li > 0) tag(254, 4, 1, 1) // NewSubfileType = reduced-resolution
      tag(TagImageWidth, 3, 1, t.totalCols.toInt)
      tag(TagImageLength, 3, 1, t.totalRows.toInt)
      tag(TagBitsPerSample, 3, 1, 32)
      tag(TagCompression, 3, 1, if (deflate) 8 else 1)
      tag(TagPhotometric, 3, 1, 1)
      tag(TagSamplesPerPixel, 3, 1, 1)
      tag(TagPlanarConfig, 3, 1, 1)
      tag(TagTileWidth, 3, 1, t.tileCols)
      tag(TagTileLength, 3, 1, t.tileRows)
      tag(TagTileOffsets, 4, n, if (n > 1) offArrOff else offs(0))
      tag(TagTileByteCounts, 4, n, if (n > 1) cntArrOff else cnts(0).toLong)
      tag(TagSampleFormat, 3, 1, 3)
      if (li == 0) {
        val scaleOff = geoBase
        val tieOff   = scaleOff + 3 * 8
        val geoOff   = tieOff + 6 * 8
        tag(TagModelPixelScale, 12, 3, scaleOff)
        tag(TagModelTiepoint, 12, 6, tieOff)
        tag(TagGeoKeyDirectory, 3, geoShorts.length, geoOff)
      }
      if (bigTiff) buf.putLong(if (li + 1 < lvls.size) ifdOffsets(li + 1) else 0L)
      else buf.putInt(if (li + 1 < lvls.size) ifdOffsets(li + 1).toInt else 0)
      if (n > 1) {
        if (bigTiff) { offs.foreach(buf.putLong); cnts.foreach(c => buf.putLong(c.toLong)) }
        else { offs.foreach(o => buf.putInt(o.toInt)); cnts.foreach(buf.putInt) }
      }
      if (li == 0) {
        val e = lv.meta.layout.extent
        buf.putDouble(lv.meta.layout.cellWidth).putDouble(lv.meta.layout.cellHeight).putDouble(0.0)
        buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
          .putDouble(e.xmin).putDouble(e.ymax).putDouble(0.0)
        geoShorts.foreach(s => buf.putShort(s.toShort))
      }
    }
    // stream: header/IFDs buffer, then each level's blocks fetched in
    // offset order (row-major = the offset-assignment order) one
    // partition at a time — never the whole compressed layer on the
    // driver heap
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      out.write(buf.array())
      lvls.foreach { lv =>
        if (lv.hasEmpty) out.write(lv.emptyBlock)
        val it = lv.packedDs.orderBy(col("_2"), col("_1")).toLocalIterator()
        while (it.hasNext) out.write(it.next()._3)
        lv.packedDs.unpersist()
      }
    } finally out.close()
  }

  /** Pixel geometry of every image in a COG's IFD chain, base first:
    * (imageCols, imageRows, tileCols, tileRows) per level. Header-only
    * walk — no tile data is touched, so against remote storage this is
    * the one small range request a tile server needs before it can
    * window any zoom (reference tms.py serves rendered levels the same
    * way: pick the level, then fetch only that tile). */
  def cogLevels(bytes: Array[Byte]): IndexedSeq[(Int, Int, Int, Int)] =
    cogLevels(RangeReader(bytes))

  /** Range-reader variant: the whole walk is a handful of small range
    * requests (8-byte header + one per IFD), so against remote
    * storage a server learns every level's geometry without fetching
    * tile data. */
  def cogLevels(rr: RangeReader): IndexedSeq[(Int, Int, Int, Int)] = {
    val fmt = TiffFmt(rr)
    val out = IndexedSeq.newBuilder[(Int, Int, Int, Int)]
    var ifdOff = fmt.firstIfd
    while (ifdOff != 0) {
      val (nt, body) = fmt.ifdBody(rr, ifdOff)
      var cols = -1; var rows = -1; var tw = -1; var th = -1
      (0 until nt).foreach { i =>
        val id = fmt.le16(body, i * fmt.entrySize)
        val v = fmt.entryValue(body, i).toInt
        id match {
          case TagImageWidth  => cols = v
          case TagImageLength => rows = v
          case TagTileWidth   => tw = v
          case TagTileLength  => th = v
          case _ =>
        }
      }
      require(cols > 0 && rows > 0 && tw > 0 && th > 0,
        "not an internally-tiled TIFF (missing tile tags)")
      out += ((cols, rows, tw, th))
      ifdOff = fmt.nextIfd(body, nt)
    }
    out.result()
  }

  /** Header geometry shared by the range-reader COG walkers — classic
    * (magic 42) and BigTIFF (magic 43, 8-byte offsets) in one place. */
  private final case class TiffFmt(big: Boolean, firstIfd: Long) {
    def le16(b: Array[Byte], p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def le32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    def le64(b: Array[Byte], p: Int): Long =
      (0 until 8).map(i => (b(p + i) & 0xffL) << (8 * i)).reduce(_ | _)
    val entrySize: Int = if (big) 20 else 12
    val countOf: Int = 4 // count field offset within an entry (both)
    /** entry i's count field */
    def entryCount(body: Array[Byte], i: Int): Long =
      if (big) le64(body, i * entrySize + 4) else le32(body, i * entrySize + 4)
    /** entry i's value/offset field */
    def entryValue(body: Array[Byte], i: Int): Long =
      if (big) le64(body, i * entrySize + 12) else le32(body, i * entrySize + 8)
    /** entry i's type field */
    def entryType(body: Array[Byte], i: Int): Int = le16(body, i * entrySize + 2)
    /** read an IFD's entry count + (entries ++ next pointer) body */
    def ifdBody(rr: RangeReader, off: Long): (Int, Array[Byte]) =
      if (big) {
        val nt = le64(rr.read(off, 8), 0).toInt
        (nt, rr.read(off + 8, nt * entrySize + 8))
      } else {
        val nt = le16(rr.read(off, 2), 0)
        (nt, rr.read(off + 2, nt * entrySize + 4))
      }
    def nextIfd(body: Array[Byte], nt: Int): Long =
      if (big) le64(body, nt * entrySize) else le32(body, nt * entrySize)
    /** width of one TileOffsets/ByteCounts array cell given its type */
    def arrCell(typ: Int): Int = if (typ == 16) 8 else 4
    def arrRead(rr: RangeReader, base: Long, typ: Int, idx: Long, n: Int): Array[Long] = {
      val w = arrCell(typ)
      val b = rr.read(base + w * idx, w * n)
      Array.tabulate(n)(i => if (w == 8) le64(b, 8 * i) else le32(b, 4 * i))
    }
  }

  private object TiffFmt {
    def apply(rr: RangeReader): TiffFmt = {
      val hdr = rr.read(0, 16)
      require(hdr.length >= 8 && hdr(0) == 'I' && hdr(1) == 'I',
        "not a little-endian TIFF")
      val f0 = TiffFmt(big = false, 0L)
      f0.le16(hdr, 2) match {
        case 42 => TiffFmt(big = false, f0.le32(hdr, 4))
        case 43 =>
          require(f0.le16(hdr, 4) == 8 && f0.le16(hdr, 6) == 0,
            "malformed BigTIFF header")
          TiffFmt(big = true, f0.le64(hdr, 8))
        case m => throw new IllegalArgumentException(s"not a TIFF (magic $m)")
      }
    }
  }

  /** Windowed read of an internally-tiled GeoTIFF ([[saveCog]] subset
    * — LE float32, deflate or none): decode ONLY the TIFF tiles
    * intersecting the (wx, wy, ww, wh) pixel window; everything else
    * in the file is never inflated. Returns the row-major window with
    * NaN outside the image. The byte-range discipline here is exactly
    * what makes the same layout remote-range-request friendly. */
  def readCogWindow(bytes: Array[Byte], wx: Int, wy: Int, ww: Int, wh: Int,
                    overview: Int = 0): Array[Double] =
    readCogWindow(RangeReader(bytes), wx, wy, ww, wh, overview)

  /** Range-reader variant — the serving path. Requests: 8-byte
    * header, 2 tiny reads per skipped IFD, one read for the target
    * IFD's entries, per intersecting tile ROW one contiguous span of
    * the offsets and counts arrays, and one read per intersecting
    * tile's data. A tile-sized window against remote storage is
    * therefore a handful of range requests, never the whole object. */
  def readCogWindow(rr: RangeReader, wx: Int, wy: Int, ww: Int, wh: Int,
                    overview: Int): Array[Double] = {
    val fmt = TiffFmt(rr)
    // walk the IFD chain to the requested overview (0 = base image)
    var ifdOff = fmt.firstIfd
    var skip = overview
    while (skip > 0) {
      val (ntHere, bodyHere) = fmt.ifdBody(rr, ifdOff)
      ifdOff = fmt.nextIfd(bodyHere, ntHere)
      require(ifdOff != 0, s"file has fewer than ${overview + 1} images (no overview $overview)")
      skip -= 1
    }
    val (nt, entries) = fmt.ifdBody(rr, ifdOff)
    var cols = -1; var rows = -1; var tw = -1; var th = -1
    var offV = -1L; var offN = -1; var cntV = -1L; var compression = 1
    var offTyp = 4; var cntTyp = 4
    (0 until nt).foreach { i =>
      val id = fmt.le16(entries, i * fmt.entrySize)
      val count = fmt.entryCount(entries, i)
      val v = fmt.entryValue(entries, i)
      id match {
        case TagImageWidth     => cols = v.toInt
        case TagImageLength    => rows = v.toInt
        case TagTileWidth      => tw = v.toInt
        case TagTileLength     => th = v.toInt
        case TagTileOffsets    => offV = v; offN = count.toInt; offTyp = fmt.entryType(entries, i)
        case TagTileByteCounts => cntV = v; cntTyp = fmt.entryType(entries, i)
        case TagCompression    =>
          require(v == 1 || v == 8, s"unsupported compression $v")
          compression = v.toInt
        case _ =>
      }
    }
    require(cols > 0 && rows > 0 && tw > 0 && th > 0 && offN > 0,
      "not an internally-tiled TIFF (missing tile tags)")
    val across = (cols + tw - 1) / tw

    val out = Array.fill(ww * wh)(Double.NaN)
    val tcMin = math.max(0, wx / tw); val tcMax = math.min(across - 1, (wx + ww - 1) / tw)
    val trMin = math.max(0, wy / th); val trMax = math.min((rows + th - 1) / th - 1, (wy + wh - 1) / th)
    val span = tcMax - tcMin + 1
    var trI = trMin
    while (trI <= trMax) {
      // contiguous slice of the offsets/counts arrays for this tile row
      val idx0 = trI.toLong * across + tcMin
      val offs: Array[Long] =
        if (offN == 1) Array(offV) else fmt.arrRead(rr, offV, offTyp, idx0, span)
      val cnts: Array[Long] =
        if (offN == 1) Array(cntV) else fmt.arrRead(rr, cntV, cntTyp, idx0, span)
      var tcI = tcMin
      while (tcI <= tcMax) {
        val off = offs(tcI - tcMin); val len = cnts(tcI - tcMin).toInt
        val data = rr.read(off, len)
        val block: ByteBuffer =
          if (compression == 1) ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
          else {
            val inf = new java.util.zip.Inflater()
            inf.setInput(data)
            val raw = new Array[Byte](tw * th * 4)
            var done = 0
            while (!inf.finished() && done < raw.length)
              done += inf.inflate(raw, done, raw.length - done)
            inf.end()
            ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
          }
        // copy the intersection of this tile with the window
        val gx0 = math.max(wx, tcI * tw); val gx1 = math.min(wx + ww, (tcI + 1) * tw)
        val gy0 = math.max(wy, trI * th); val gy1 = math.min(wy + wh, (trI + 1) * th)
        var gy = gy0
        while (gy < gy1) {
          var gx = gx0
          while (gx < gx1) {
            if (gx < cols && gy < rows)
              out((gy - wy) * ww + (gx - wx)) =
                block.getFloat(((gy - trI * th) * tw + (gx - tcI * tw)) * 4).toDouble
            gx += 1
          }
          gy += 1
        }
        tcI += 1
      }
      trI += 1
    }
    out
  }

  /** Read every GeoTIFF under a path into scenes — reference
    * geotiff.get (geotiff.py:18), the ingestion entry point. The
    * Spark-first shape: `binaryFile` source (distributed listing +
    * read, URI-transparent across local/HDFS/S3 via Hadoop FS),
    * per-file decode in the executors, scene_id from the file name
    * hash. `pathGlobFilter`/recursive lookup come free from the
    * source; at scale files land one-per-task and decode stays a
    * narrow map. Chain `.tileToLayout(...)` for the tiled layer. */
  def readFolder(spark: org.apache.spark.sql.SparkSession, path: String,
                 glob: String = "*.tif"): UntiledRaster = {
    import spark.implicits._
    val scenes = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val (ox, oy, cw, ch, cols, rows, bands) = decodeScene(bytes)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val id = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        (id, ox, oy - rows * ch, ox + cols * cw, oy, cols, rows, bands.head.toSeq)
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Write each tile of a layer as its own GeoTIFF file under `dir`
    * (reference write path for per-tile exports): executors write
    * their partitions directly — nothing funnels through the driver. */
  def writeFolder(layer: RasterLayer, dir: String, deflate: Boolean = true): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    toGeoTiff(layer, deflate).foreachPartition { it: Iterator[GeoTiffTile] =>
      it.foreach { t =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/tile_${t.col}_${t.row}.tif"), t.tiff)
      }
    }
  }

  /** Per-tile GeoTIFF bytes for a layer — reference to_geotiff_rdd
    * (compression per constants.py:282). `dateTimeOf` optionally
    * stamps each tile's TIFF with a tag-306 DateTime string derived
    * from its (col, row) — the write half of the temporal-scene
    * contract ([[sceneInstant]] / [[fromGeoTiffTemporal]] read it
    * back). */
  def toGeoTiff(layer: RasterLayer, deflate: Boolean = false,
                dateTimeOf: Option[(Int, Int) => String] = None): Dataset[GeoTiffTile] = {
    val meta = layer.meta
    require(!meta.temporal,
      "toGeoTiff/writeFolder on a temporal layer collides per-tile outputs " +
      "across instants (duplicate (col,row) keys); aggregate or filter first")
    val tl = meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val e: Extent = meta.layout.extent
    val cw = meta.layout.cellWidth; val ch = meta.layout.cellHeight
    val spark = layer.df.sparkSession
    import spark.implicits._
    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (c, r, tile) =>
          val originX = e.xmin + c.toLong * tc * cw
          val originY = e.ymax - r.toLong * tr * ch
          GeoTiffTile(c, r, encodeTile(tile.toArray, tc, tr, originX, originY, cw, ch,
            deflate, dateTimeOf.map(f => f(c, r))))
        }
      }
  }

  /** Per-tile multiband GeoTIFF bytes (pixel-interleaved), narrow map. */
  def toGeoTiffMB(layer: MultibandLayer, deflate: Boolean = false): Dataset[GeoTiffTile] = {
    val meta = layer.meta
    val tl = meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val e: Extent = meta.layout.extent
    val cw = meta.layout.cellWidth; val ch = meta.layout.cellHeight
    val spark = layer.df.sparkSession
    import spark.implicits._
    layer.df.select(col("col"), col("row"), col("bands"))
      .as[(Int, Int, Seq[Seq[Double]])]
      .mapPartitions { it =>
        it.map { case (c, r, bands) =>
          val originX = e.xmin + c.toLong * tc * cw
          val originY = e.ymax - r.toLong * tr * ch
          GeoTiffTile(c, r,
            encodeTileMB(bands.map(_.toArray), tc, tr, originX, originY, cw, ch, deflate))
        }
      }
  }
}
