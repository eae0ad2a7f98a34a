package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** The pure-Scala PNG/BMP decoders against the JDK's ImageIO ENCODERS
  * — a fully independent implementation of both formats, so per-pixel
  * agreement is strong evidence of spec compliance (including PNG's
  * adaptive per-row filter choices, which the encoder picks freely).
  */
class ImageCodecSpec extends AnyFunSuite {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"ImageIO cannot write $fmt")
    out.toByteArray
  }

  /** Deterministic test pattern: gradients + structure so PNG's
    * filters (Sub/Up/Paeth) actually engage. */
  private def pattern(w: Int, h: Int, imgType: Int): BufferedImage = {
    val img = new BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / math.max(w - 1, 1)) & 0xff
      val g = (y * 255 / math.max(h - 1, 1)) & 0xff
      val b = ((x * 7 + y * 13) % 256) & 0xff
      val a = if (imgType == BufferedImage.TYPE_INT_ARGB) ((x + y) * 5 % 256) & 0xff else 0xff
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    img
  }

  private def assertPixelEqual(bytes: Array[Byte], ref: BufferedImage,
                               ignoreAlpha: Boolean = false): Unit = {
    val got = ImageCodec.decode(bytes).get
    assert((got.width, got.height) == (ref.getWidth, ref.getHeight))
    for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth) {
      val want = if (ignoreAlpha) ref.getRGB(x, y) | 0xff000000 else ref.getRGB(x, y)
      val have = if (ignoreAlpha) got.argb(x, y) | 0xff000000 else got.argb(x, y)
      assert(have == want, f"pixel ($x,$y): got 0x$have%08x want 0x$want%08x")
    }
  }

  test("PNG RGB (color type 2) decodes pixel-exact vs ImageIO encoder") {
    assertPixelEqual(encode(pattern(37, 23, BufferedImage.TYPE_INT_RGB), "png"),
      pattern(37, 23, BufferedImage.TYPE_INT_RGB))
  }

  test("PNG RGBA (color type 6) decodes pixel-exact, alpha included") {
    assertPixelEqual(encode(pattern(16, 31, BufferedImage.TYPE_INT_ARGB), "png"),
      pattern(16, 31, BufferedImage.TYPE_INT_ARGB))
  }

  test("PNG grayscale (color type 0) decodes pixel-exact") {
    val img = new BufferedImage(29, 17, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 17; x <- 0 until 29)
      img.getRaster.setSample(x, y, 0, (x * 9 + y * 31) % 256)
    // TYPE_BYTE_GRAY's getRGB applies a gray->sRGB color-space
    // transform, so compare the RAW raster samples (what the PNG
    // actually stores) against our decoded gray channel
    val got = ImageCodec.decode(encode(img, "png")).get
    assert((got.width, got.height) == (29, 17))
    for (y <- 0 until 17; x <- 0 until 29) {
      val want = img.getRaster.getSample(x, y, 0)
      assert((got.argb(x, y) & 0xff) == want, s"pixel ($x,$y)")
      assert(((got.argb(x, y) >> 8) & 0xff) == want) // gray replicated to G
    }
  }

  test("PNG palette (color type 3) decodes through PLTE") {
    val img = new BufferedImage(12, 9, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 9; x <- 0 until 12)
      img.setRGB(x, y, 0xff000000 | ((x * 20 % 256) << 16) | ((y * 25 % 256) << 8) | 0x40)
    // indexed encoding quantizes to its own palette — compare against
    // what the ENCODED image holds, not the pre-quantization pattern
    val bytes = encode(img, "png")
    assertPixelEqual(bytes, img)
  }

  test("BMP 24-bit decodes pixel-exact vs ImageIO encoder (bottom-up rows, padding)") {
    // odd width forces row padding; 3-byte pixels exercise BGR order
    assertPixelEqual(encode(pattern(13, 7, BufferedImage.TYPE_INT_RGB), "bmp"),
      pattern(13, 7, BufferedImage.TYPE_INT_RGB), ignoreAlpha = true)
  }

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    out.toByteArray
  }

  test("JPEG grayscale decodes BIT-EXACT vs the JDK's libjpeg-derived reader") {
    // 45x37: non-multiple-of-8 dims force padded edge blocks. Ground
    // truth is ImageIO's READER on the same lossy stream (the encoded
    // file, not the pre-compression pattern, is the contract).
    val img = new BufferedImage(45, 37, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 37; x <- 0 until 45)
      img.getRaster.setSample(x, y, 0, (x * 11 + y * 23 + (x * y) % 31) % 256)
    for (q <- Seq(0.5f, 0.95f)) {
      val bytes = encodeJpeg(img, q)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val got = ImageCodec.decode(bytes).get
      assert((got.width, got.height) == (45, 37))
      for (y <- 0 until 37; x <- 0 until 45)
        assert((got.argb(x, y) & 0xff) == ref.getRaster.getSample(x, y, 0),
          s"q=$q pixel ($x,$y)")
    }
  }

  test("JPEG color (4:2:0 subsampled) decodes BIT-EXACT incl fancy upsampling") {
    // default-quality JDK writer emits 4:2:0 YCbCr — exercises the
    // islow IDCT, triangle-filter chroma upsampling, AND the fixed-
    // point YCbCr->RGB, all of which must match libjpeg's arithmetic
    val img = pattern(45, 37, BufferedImage.TYPE_INT_RGB)
    for (q <- Seq(0.4f, 0.75f, 1.0f)) {
      val bytes = encodeJpeg(img, q)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val got = ImageCodec.decode(bytes).get
      assert((got.width, got.height) == (45, 37))
      for (y <- 0 until 37; x <- 0 until 45)
        assert(got.argb(x, y) == (ref.getRGB(x, y) | 0xff000000),
          f"q=$q pixel ($x,$y): got 0x${got.argb(x, y)}%08x want 0x${ref.getRGB(x, y)}%08x")
    }
  }

  private def encodeProgressiveJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    // libjpeg's default 10-scan progression: interleaved DC with
    // successive approximation, spectral-banded AC scans, DC+AC
    // refinement passes — the full annex-G surface
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    out.toByteArray
  }

  test("progressive JPEG grayscale decodes BIT-EXACT vs the JDK reader") {
    val img = new BufferedImage(45, 37, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 37; x <- 0 until 45)
      img.getRaster.setSample(x, y, 0, (x * 11 + y * 23 + (x * y) % 31) % 256)
    for (q <- Seq(0.5f, 0.95f)) {
      val bytes = encodeProgressiveJpeg(img, q)
      // really SOF2: marker ffc2 present before any SOS
      assert(bytes.sliding(2).exists(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2))
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val got = ImageCodec.decode(bytes).get
      assert((got.width, got.height) == (45, 37))
      for (y <- 0 until 37; x <- 0 until 45)
        assert((got.argb(x, y) & 0xff) == ref.getRaster.getSample(x, y, 0),
          s"q=$q pixel ($x,$y)")
    }
  }

  test("progressive JPEG color (4:2:0) decodes BIT-EXACT vs the JDK reader") {
    val img = pattern(45, 37, BufferedImage.TYPE_INT_RGB)
    for (q <- Seq(0.4f, 0.75f, 1.0f)) {
      val bytes = encodeProgressiveJpeg(img, q)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val got = ImageCodec.decode(bytes).get
      assert((got.width, got.height) == (45, 37))
      for (y <- 0 until 37; x <- 0 until 45)
        assert(got.argb(x, y) == (ref.getRGB(x, y) | 0xff000000),
          f"q=$q pixel ($x,$y): got 0x${got.argb(x, y)}%08x want 0x${ref.getRGB(x, y)}%08x")
    }
  }

  test("truncated progressive JPEG throws; decodeFeatures falls back rather than failing") {
    // the smallest stream that reaches SOF2 then ends before any scan
    val prog = Array[Int](0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b,
      8, 0, 8, 0, 8, 1, 0x11, 0, 0, 0).map(_.toByte)
    intercept[IllegalArgumentException](ImageCodec.decode(prog))
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(Seq((1L, prog)).toDF("doc_id", "blob")).head()
    assert(feats.width == 0) // byte-path fallback, job survives
  }

  test("unknown formats return None, malformed known-magic blobs throw") {
    assert(ImageCodec.decode("just text".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decode(Array.fill(100)(0x7f.toByte)).isEmpty)
    // 'BM' is two ASCII letters any document can start with — header
    // validation must reject it, not crash on garbage dimensions
    val bmText = ("BM" + "W sales report, fiscal year 2026. " * 10).getBytes("UTF-8")
    assert(ImageCodec.decode(bmText).isEmpty)
    assert(Multimodal.decodeFeatures(
      { val s = graft.TestSpark.spark; import s.implicits._
        Seq((7L, bmText)).toDF("doc_id", "blob") })
      .head().width == 0) // falls back to the byte path
    val badPng = (Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      Array.fill(60)(0.toByte)).toArray
    intercept[IllegalArgumentException](ImageCodec.decode(badPng))
  }

  test("meanLuminance and resizeNearest are real pixel math") {
    val white = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) white.setRGB(x, y, 0xffffffff)
    val img = ImageCodec.decode(encode(white, "png")).get
    assert(math.abs(ImageCodec.meanLuminance(img) - 1.0) < 1e-9)
    // half black / half white -> mean 0.5; nearest resize keeps halves
    val half = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      half.setRGB(x, y, if (x < 4) 0xff000000 else 0xffffffff)
    val hImg = ImageCodec.decode(encode(half, "png")).get
    assert(math.abs(ImageCodec.meanLuminance(hImg) - 0.5) < 0.01)
    val small = ImageCodec.resizeNearest(hImg, 4, 4)
    assert(small.argb(0, 0) == 0xff000000 && small.argb(3, 3) == 0xffffffff)
  }

  test("Multimodal.decodeFeatures extracts real width/height/luminance from PNG and JPEG blobs") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val png = encode(pattern(20, 10, BufferedImage.TYPE_INT_RGB), "png")
    val jpg = encodeJpeg(pattern(24, 16, BufferedImage.TYPE_INT_RGB), 0.8f)
    val blobs = Seq((1L, png), (2L, "plain text".getBytes("UTF-8")), (3L, jpg))
      .toDF("doc_id", "blob")
    val feats = Multimodal.decodeFeatures(blobs).collect().sortBy(_.doc_id)
    assert(feats(0).width == 20 && feats(0).height == 10)
    val expect = ImageCodec.meanLuminance(ImageCodec.decodePng(png))
    assert(feats(0).feature == expect)
    assert(feats(1).width == 0 && feats(1).height == 0) // fallback path
    // JPEG row: real dimensions + luminance from actual decoded pixels
    assert(feats(2).width == 24 && feats(2).height == 16)
    assert(feats(2).feature == ImageCodec.meanLuminance(JpegCodec.decode(jpg)))
    // real resize: luminance plane of the resampled image
    val resized = Multimodal.resize(blobs, 5, 5).collect()
      .find(_.getLong(0) == 1L).get.getAs[Array[Byte]]("blob")
    assert(resized.length == 25)
  }
}
