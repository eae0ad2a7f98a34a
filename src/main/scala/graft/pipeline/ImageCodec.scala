package graft.pipeline

import java.util.zip.Inflater

/** Pure-Scala PNG + BMP decoders, written from the public specs (PNG:
  * RFC 2083 / W3C PNG spec; BMP: the Windows BITMAPINFOHEADER layout).
  * This is the real decode step behind [[Multimodal]] — no native
  * image libraries in the container, but both formats are simple
  * enough to decode exactly: PNG is zlib-inflated scanlines with five
  * per-row predictors, BMP is raw padded rows.
  *
  * Executor-safe (pure functions over byte arrays); the multimodal
  * batch plumbing calls these per row inside mapPartitions.
  */
object ImageCodec {

  /** Decoded raster: ARGB-packed pixels, row-major, top-down. */
  final case class Image(width: Int, height: Int, pixels: Array[Int]) {
    def argb(x: Int, y: Int): Int = pixels(y * width + x)
  }

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  /** 'BM' alone is two ASCII letters any text blob can start with, so
    * BMP detection validates the whole header shape: plausible header
    * size, dimensions, bit count, BI_RGB compression, and pixel data
    * that actually fits inside the blob. */
  def isBmp(b: Array[Byte]): Boolean = {
    if (b.length <= 54 || b(0) != 'B' || b(1) != 'M') return false
    val dataOff = leInt(b, 10); val hdrSize = leInt(b, 14)
    val w = leInt(b, 18); val h = math.abs(leInt(b, 22))
    val bits = leShort(b, 28); val compression = leInt(b, 30)
    val rowBytes = if (w > 0 && w <= (1 << 16)) ((w.toLong * bits / 8) + 3) / 4 * 4 else Long.MaxValue
    hdrSize >= 40 && hdrSize <= 256 &&
      w > 0 && w <= (1 << 16) && h > 0 && h <= (1 << 16) &&
      (bits == 8 || bits == 24 || bits == 32) && compression == 0 &&
      dataOff >= 14 + hdrSize && dataOff.toLong + rowBytes * h <= b.length
  }

  /** Decode if the blob is a supported PNG, BMP, or baseline JPEG;
    * None otherwise (unknown formats are the caller's fallback path,
    * malformed known-magic files throw). */
  def decode(bytes: Array[Byte]): Option[Image] =
    if (isPng(bytes)) Some(decodePng(bytes))
    else if (isBmp(bytes)) Some(decodeBmp(bytes))
    else if (JpegCodec.isJpeg(bytes)) Some(JpegCodec.decode(bytes))
    else None

  // ------------------------------------------------------------------
  // PNG
  // ------------------------------------------------------------------

  private def beInt(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  /** 8-bit-depth, non-interlaced PNG: color types 0 (gray), 2 (RGB),
    * 3 (palette), 4 (gray+alpha), 6 (RGBA). */
  def decodePng(bytes: Array[Byte]): Image = {
    require(isPng(bytes), "not a PNG")
    var p = 8
    var w = -1; var h = -1; var colorType = -1
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && p + 8 <= bytes.length) {
      val len = beInt(bytes, p)
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      val data = p + 8
      typ match {
        case "IHDR" =>
          w = beInt(bytes, data); h = beInt(bytes, data + 4)
          val bitDepth = bytes(data + 8) & 0xff
          colorType = bytes(data + 9) & 0xff
          require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth (8 only)")
          require(Set(0, 2, 3, 4, 6).contains(colorType), s"unsupported PNG color type $colorType")
          require((bytes(data + 12) & 0xff) == 0, "interlaced (Adam7) PNGs unsupported")
        case "PLTE" =>
          palette = Array.tabulate(len / 3)(i =>
            0xff000000 | ((bytes(data + 3 * i) & 0xff) << 16) |
              ((bytes(data + 3 * i + 1) & 0xff) << 8) | (bytes(data + 3 * i + 2) & 0xff))
        case "IDAT" => idat.write(bytes, data, len)
        case "IEND" => done = true
        case _      => // ancillary chunk: skip
      }
      p = data + len + 4 // skip CRC
    }
    require(w > 0 && h > 0, "missing IHDR")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    val compressed = idat.toByteArray
    inf.setInput(compressed)
    var got = 0
    while (!inf.finished() && got < raw.length) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || inf.finished(), "truncated PNG IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"PNG pixel data: got $got of ${raw.length} bytes")

    // undo per-scanline filters (spec §6): each row starts with a
    // filter-type byte; predictors reference the ALREADY-RECONSTRUCTED
    // left/up/up-left bytes at channel distance
    val img = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val filt = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= channels) img(rowOut + x - channels) & 0xff else 0
        val up = if (y > 0) img(rowOut - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= channels) img(rowOut - stride + x - channels) & 0xff else 0
        val rec = filt match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth
            val pp = left + up - upLeft
            val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - upLeft)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case f => throw new IllegalArgumentException(s"unknown PNG filter $f")
        }
        img(rowOut + x) = rec.toByte
        x += 1
      }
      y += 1
    }

    val out = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val b0 = i * channels
      out(i) = colorType match {
        case 0 =>
          val g = img(b0) & 0xff; 0xff000000 | (g << 16) | (g << 8) | g
        case 2 =>
          0xff000000 | ((img(b0) & 0xff) << 16) | ((img(b0 + 1) & 0xff) << 8) | (img(b0 + 2) & 0xff)
        case 3 =>
          require(palette != null, "palette PNG without PLTE")
          palette(img(b0) & 0xff)
        case 4 =>
          val g = img(b0) & 0xff
          ((img(b0 + 1) & 0xff) << 24) | (g << 16) | (g << 8) | g
        case 6 =>
          ((img(b0 + 3) & 0xff) << 24) | ((img(b0) & 0xff) << 16) |
            ((img(b0 + 1) & 0xff) << 8) | (img(b0 + 2) & 0xff)
      }
      i += 1
    }
    Image(w, h, out)
  }

  // ------------------------------------------------------------------
  // BMP
  // ------------------------------------------------------------------

  private def leInt(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  /** Uncompressed (BI_RGB) BITMAPINFOHEADER BMP: 8-bit palette, 24-bit
    * BGR, 32-bit BGRA; bottom-up (positive height) or top-down. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(isBmp(bytes), "not a BMP")
    val dataOff = leInt(bytes, 10)
    val hdrSize = leInt(bytes, 14)
    require(hdrSize >= 40, s"pre-BITMAPINFOHEADER BMP unsupported (header $hdrSize)")
    val w = leInt(bytes, 18)
    val hRaw = leInt(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bits = leShort(bytes, 28)
    val compression = leInt(bytes, 30)
    require(compression == 0, s"compressed BMP unsupported (BI_ $compression)")
    require(Set(8, 24, 32).contains(bits), s"unsupported BMP bit count $bits")
    val paletteAt = 14 + hdrSize
    val nColors = { val c = leInt(bytes, 46); if (c == 0 && bits == 8) 256 else c }
    val rowBytes = ((w * bits / 8) + 3) / 4 * 4
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        out(y * w + x) = bits match {
          case 8 =>
            val idx = bytes(srcRow + x) & 0xff
            require(idx < nColors, s"BMP palette index $idx out of range")
            val pp = paletteAt + 4 * idx // BGRA quads
            0xff000000 | ((bytes(pp + 2) & 0xff) << 16) | ((bytes(pp + 1) & 0xff) << 8) | (bytes(pp) & 0xff)
          case 24 =>
            val pp = srcRow + 3 * x
            0xff000000 | ((bytes(pp + 2) & 0xff) << 16) | ((bytes(pp + 1) & 0xff) << 8) | (bytes(pp) & 0xff)
          case 32 =>
            val pp = srcRow + 4 * x
            ((bytes(pp + 3) & 0xff) << 24) | ((bytes(pp + 2) & 0xff) << 16) |
              ((bytes(pp + 1) & 0xff) << 8) | (bytes(pp) & 0xff)
        }
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Mean luminance in [0, 1] (ITU-R BT.601 weights) — the decoded
    * "feature" [[Multimodal.decodeFeatures]] extracts from real
    * images. */
  def meanLuminance(img: Image): Double = {
    var s = 0.0
    var i = 0
    while (i < img.pixels.length) {
      val px = img.pixels(i)
      s += 0.299 * ((px >> 16) & 0xff) + 0.587 * ((px >> 8) & 0xff) + 0.114 * (px & 0xff)
      i += 1
    }
    s / (255.0 * math.max(img.pixels.length, 1))
  }

  /** Nearest-neighbor resample to (w, h) — the real resize behind
    * [[Multimodal.resize]] for decodable blobs. */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Int](w * h)
    var j = 0
    while (j < h) {
      val sy = (j.toLong * img.height / h).toInt
      var i = 0
      while (i < w) {
        out(j * w + i) = img.pixels(sy * img.width + (i.toLong * img.width / w).toInt)
        i += 1
      }
      j += 1
    }
    Image(w, h, out)
  }
}
