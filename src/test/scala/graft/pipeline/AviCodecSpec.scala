package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/AVI container codec: DIB roundtrip against the closed form,
  * MJPEG demux + JpegCodec decode against the JDK's reader, and the
  * malformed-input contract. */
class AviCodecSpec extends AnyFunSuite {

  test("DIB AVI roundtrip: demuxed frame pixels equal the closed form") {
    val (w, h, nf) = (12, 10, 4)
    def gray(f: Int)(x: Int, y: Int): Int = (f * 17 + x * 3 + y * 11) % 256
    val bytes = AviCodec.encodeDib(w, h, nf, gray)
    val avi = AviCodec.decode(bytes).get
    assert(avi.width == w && avi.height == h && !avi.mjpeg)
    assert(avi.frames.length == nf)
    for (f <- 0 until nf) {
      val img = AviCodec.decodeFrame(avi, f).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val px = img.pixels(y * w + x)
        assert((px & 0xff) == gray(f)(x, y), s"frame $f ($x,$y)")
        // gray fixture: all three channels equal
        assert(((px >> 8) & 0xff) == (px & 0xff) && ((px >> 16) & 0xff) == (px & 0xff))
      }
    }
  }

  test("odd-size frame payloads word-align per the RIFF spec") {
    // w = 3 -> rowBytes = 12 (even), so force oddness via MJPEG with an
    // odd-length payload
    val odd = Array.tabulate(33)(_.toByte)
    val even = Array.tabulate(20)(_.toByte)
    val bytes = AviCodec.encodeMjpeg(4, 4, Seq(odd, even, odd))
    val avi = AviCodec.decode(bytes).get
    assert(avi.mjpeg && avi.frames.length == 3)
    assert(avi.frames(0).toSeq == odd.toSeq)
    assert(avi.frames(1).toSeq == even.toSeq)
    assert(avi.frames(2).toSeq == odd.toSeq)
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

  test("MJPEG AVI: demuxed frames decode through JpegCodec bit-exact vs the JDK") {
    val (w, h) = (24, 16)
    val frames = (0 until 3).map { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 31 + y * 57 + f * 91) % 256) * 0x010101)
      encodeJpeg(img, 0.8f)
    }
    val bytes = AviCodec.encodeMjpeg(w, h, frames)
    val avi = AviCodec.decode(bytes).get
    assert(avi.mjpeg && avi.frames.length == 3)
    for (f <- 0 until 3) {
      // container path must hand back the exact JPEG bytes...
      assert(avi.frames(f).toSeq == frames(f).toSeq)
      // ...and our decoder (JpegCodec via ImageCodec) must match the
      // JDK's libjpeg-derived reader pixel-for-pixel on them
      val ours = AviCodec.decodeFrame(avi, f).get
      val jdk = ImageIO.read(new java.io.ByteArrayInputStream(frames(f)))
      assert(ours.width == w && ours.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((ours.pixels(y * w + x) & 0xffffff) == (jdk.getRGB(x, y) & 0xffffff),
          s"frame $f ($x,$y)")
    }
  }

  test("non-AVI and truncated inputs: None or the intact frame prefix") {
    assert(AviCodec.decode(Array.emptyByteArray).isEmpty)
    assert(AviCodec.decode("not a container at all".getBytes).isEmpty)
    // a WAV is RIFF but not 'AVI ': must be rejected
    assert(AviCodec.decode(AudioCodec.encode(16000, 1, Array(1, 2, 3))).isEmpty)
    // truncation mid-movi keeps the frames before the cut
    val full = AviCodec.encodeDib(8, 6, 3, f => (x, y) => (f + x + y) % 256)
    val cut = java.util.Arrays.copyOf(full, full.length - 10)
    val avi = AviCodec.decode(cut).get
    assert(avi.frames.length == 2)
  }

  test("chunk sizes near Int.MaxValue do not wrap the truncation guard (r16)") {
    // A RIFF/'AVI ' header followed by a chunk declaring size
    // 0x7ffffff0: p + 8 + size would wrap negative in Int arithmetic,
    // defeating `> end` and driving copyOfRange out of bounds. The
    // Long-arithmetic guard must treat it as truncated instead.
    def le(i: Int): Array[Byte] =
      Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
        ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("ASCII")
    val evil = cc("RIFF") ++ le(Int.MaxValue - 4) ++ cc("AVI ") ++
      cc("00db") ++ le(0x7ffffff0) ++ Array.fill[Byte](64)(1)
    // must not throw, and must not fabricate a frame from the bogus size
    val r = AviCodec.decode(evil)
    assert(r.isEmpty || r.get.frames.isEmpty)
    // same poison size inside a LIST('movi') — exercises the LIST branch
    val evilList = cc("RIFF") ++ le(Int.MaxValue - 4) ++ cc("AVI ") ++
      cc("LIST") ++ le(0x7ffffff0) ++ cc("movi") ++
      cc("00db") ++ le(0x7fffff00) ++ Array.fill[Byte](32)(2)
    val r2 = AviCodec.decode(evilList)
    assert(r2.isEmpty || r2.get.frames.isEmpty)
  }

  test("videoFrames survives a blob whose decode would throw (NonFatal guard)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    def le(i: Int): Array[Byte] =
      Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
        ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("ASCII")
    // poison blob + one healthy DIB AVI in the same partition: the job
    // must complete and the healthy blob must still decode for real
    val poison = cc("RIFF") ++ le(Int.MaxValue - 4) ++ cc("AVI ") ++
      cc("00db") ++ le(0x7ffffff0) ++ Array.fill[Byte](64)(1)
    val healthy = AviCodec.encodeDib(8, 6, 2, f => (x, y) => (f + x + y) % 256)
    val blobs = Seq((1L, poison), (2L, healthy)).toDF("doc_id", "blob")
    val out = Multimodal.videoFrames(blobs, stride = 1, maxFrames = 4).collect()
    assert(out.filter(_.doc_id == 2L).forall(_.width == 8L))
    assert(out.count(_.doc_id == 2L) == 2)
    assert(out.filter(_.doc_id == 1L).forall(_.width == 0L)) // synthetic fallback
  }

  test("videoFrames falls back to the md5 synthetic path on non-video blobs") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "plain text", "web"), (2L, "more text here", "web"))
      .toDF("doc_id", "text", "source")
    val out = Multimodal.videoFrames(Multimodal.asBlobs(docs))
      .collect().map(f => (f.doc_id, f.frame_idx) -> (f.width, f.pix_sum)).toMap
    assert(out.nonEmpty && out.values.forall(_._1 == 0L))
    // signature matches sampleFrames' md5 construction at the same index
    val sf = Multimodal.sampleFrames(Multimodal.asBlobs(docs), stride = 2, maxFrames = 8)
      .collect().map(f => (f.doc_id, f.frame_idx.toLong) -> f.frame_sig).toMap
    out.foreach { case (k, (_, sig)) => assert(sf(k) == sig) }
  }
}
