package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal AVI (RIFF) container codec, written from the public
  * Microsoft RIFF/AVI 1.0 spec ("AVI RIFF File Reference"):
  * RIFF('AVI ' LIST('hdrl' 'avih' LIST('strl' 'strh' 'strf'))
  *              LIST('movi' '00db'|'00dc'...)).
  *
  * Two video stream flavors, both single-stream:
  *  - uncompressed DIB frames ('00db', biCompression = 0): each chunk
  *    is raw bottom-up BGR24 rows with 4-byte row padding — the same
  *    pixel layout ImageCodec's BMP path decodes; pixels are an exact
  *    closed form, so these carry the oracle-checkable fixtures;
  *  - MJPEG ('00dc', biCompression = 'MJPG'): each chunk is a complete
  *    baseline/progressive JPEG file decoded by [[JpegCodec]] (via
  *    ImageCodec.decode) — the real-world camera/drone capture format.
  *
  * The demuxer is tolerant: it walks chunks by the declared sizes
  * (word-aligned per the spec), takes dimensions from 'strf'
  * (BITMAPINFOHEADER), and collects every '..db'/'..dc' payload in
  * file order; anything that is not RIFF/'AVI ' returns None so
  * callers keep their total-over-arbitrary-bytes contract.
  */
object AviCodec {

  final case class Avi(width: Int, height: Int, mjpeg: Boolean,
                       frames: Seq[Array[Byte]])

  private def fourCC(s: String): Int =
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
  private val RIFF = fourCC("RIFF"); private val AVI = fourCC("AVI ")
  private val LIST = fourCC("LIST"); private val MOVI = fourCC("movi")
  private val HDRL = fourCC("hdrl"); private val STRL = fourCC("strl")
  private val MJPG = fourCC("MJPG")

  // ---------------------------------------------------------------- encode

  /** DIB-frame AVI: `gray(f)(x, y)` gives frame f's gray value; rows
    * written bottom-up BGR with 4-byte padding (the BMP layout). */
  def encodeDib(w: Int, h: Int, nFrames: Int,
                gray: Int => (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val frames = (0 until nFrames).map { f =>
      val g = gray(f)
      val payload = new Array[Byte](rowBytes * h)
      var y = 0
      while (y < h) {
        val base = (h - 1 - y) * rowBytes
        var x = 0
        while (x < w) {
          val v = g(x, y).toByte
          payload(base + x * 3) = v; payload(base + x * 3 + 1) = v
          payload(base + x * 3 + 2) = v
          x += 1
        }
        y += 1
      }
      payload
    }
    assemble(w, h, mjpeg = false, frames)
  }

  /** MJPEG AVI from complete per-frame JPEG files. */
  def encodeMjpeg(w: Int, h: Int, jpegFrames: Seq[Array[Byte]]): Array[Byte] =
    assemble(w, h, mjpeg = true, jpegFrames)

  private def assemble(w: Int, h: Int, mjpeg: Boolean,
                       frames: Seq[Array[Byte]]): Array[Byte] = {
    def pad(n: Int) = n + (n & 1)
    val strfBody = 40 // BITMAPINFOHEADER
    val strhBody = 56
    val avihBody = 56
    val strlSize = 4 + (8 + strhBody) + (8 + strfBody)
    val hdrlSize = 4 + (8 + avihBody) + (8 + strlSize)
    val moviSize = 4 + frames.map(f => 8 + pad(f.length)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(RIFF).putInt(riffSize).putInt(AVI)
    // LIST hdrl
    buf.putInt(LIST).putInt(hdrlSize).putInt(HDRL)
    buf.putInt(fourCC("avih")).putInt(avihBody)
    buf.putInt(33333)              // dwMicroSecPerFrame (30 fps)
      .putInt(0).putInt(0).putInt(0x10) // maxBytesPerSec, padding, flags (HASINDEX off)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, bufSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    // LIST strl
    buf.putInt(LIST).putInt(strlSize).putInt(STRL)
    buf.putInt(fourCC("strh")).putInt(strhBody)
    buf.putInt(fourCC("vids")).putInt(if (mjpeg) MJPG else 0)
      .putInt(0).putShort(0.toShort).putShort(0.toShort)
      .putInt(0).putInt(1).putInt(30) // initialFrames, scale, rate (30 fps)
      .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      .putShort(0.toShort).putShort(0.toShort).putShort(w.toShort).putShort(h.toShort)
    buf.putInt(fourCC("strf")).putInt(strfBody)
    buf.putInt(40).putInt(w).putInt(h)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(if (mjpeg) MJPG else 0)
      .putInt(((w * 3 + 3) / 4 * 4) * h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    buf.putInt(LIST).putInt(moviSize).putInt(MOVI)
    val ckId = fourCC(if (mjpeg) "00dc" else "00db")
    frames.foreach { f =>
      buf.putInt(ckId).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte) // word alignment
    }
    buf.array()
  }

  // ---------------------------------------------------------------- decode

  /** Demux: None unless the bytes are a RIFF 'AVI ' container. */
  def decode(bytes: Array[Byte]): Option[Avi] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.getInt(0) != RIFF || buf.getInt(8) != AVI) return None
    var w = 0; var h = 0; var mjpeg = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = buf.getInt(p)
        val size = buf.getInt(p + 4)
        if (size < 0) return
        // all bounds arithmetic in Long: a declared size near Int.MaxValue
        // must not wrap `p + 8 + size` negative and defeat the truncation
        // guard (the operator stays total over arbitrary binary columns)
        val chunkEnd = p.toLong + 8L + size.toLong
        if (id == LIST && size >= 4 && p + 12 <= end) {
          // a truncated LIST still yields its intact prefix chunks
          val listType = buf.getInt(p + 8)
          if (listType == MOVI || listType == HDRL || listType == STRL)
            walk(p + 12, math.min(chunkEnd, end.toLong).toInt)
        } else if (chunkEnd > end) {
          return // truncated non-LIST chunk: keep what we have
        } else {
          // 'strf' carries BITMAPINFOHEADER (w, h, compression)
          if (id == fourCC("strf") && size >= 20) {
            w = buf.getInt(p + 8 + 4); h = buf.getInt(p + 8 + 8)
            mjpeg = buf.getInt(p + 8 + 16) == MJPG
          }
          // frame chunks: '..db' (uncompressed DIB) / '..dc' (compressed)
          val b2 = (id >>> 16) & 0xff; val b3 = (id >>> 24) & 0xff
          val isDb = b2 == 'd' && b3 == 'b'; val isDc = b2 == 'd' && b3 == 'c'
          if (isDb || isDc)
            frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)
        }
        val next = chunkEnd + (size & 1) // word-aligned
        if (next > Int.MaxValue) return
        p = next.toInt
      }
    }
    val declared = buf.getInt(4)
    walk(12, math.min(bytes.length.toLong, 8L + math.max(declared, 0).toLong).toInt)
    if (w <= 0 || h <= 0) None else Some(Avi(w, h, mjpeg, frames.toSeq))
  }

  /** Decode one frame to pixels: MJPEG chunks go through
    * ImageCodec/JpegCodec; DIB chunks are the bottom-up BGR24 layout. */
  def decodeFrame(avi: Avi, idx: Int): Option[ImageCodec.Image] = {
    val payload = avi.frames(idx)
    if (avi.mjpeg) ImageCodec.decode(payload)
    else {
      val rowBytes = (avi.width * 3 + 3) / 4 * 4
      if (payload.length < rowBytes * avi.height) None
      else {
        val px = new Array[Int](avi.width * avi.height)
        var y = 0
        while (y < avi.height) {
          val base = (avi.height - 1 - y) * rowBytes
          var x = 0
          while (x < avi.width) {
            val b = payload(base + x * 3) & 0xff
            val g = payload(base + x * 3 + 1) & 0xff
            val r = payload(base + x * 3 + 2) & 0xff
            px(y * avi.width + x) = 0xff000000 | (r << 16) | (g << 8) | b
            x += 1
          }
          y += 1
        }
        Some(ImageCodec.Image(avi.width, avi.height, px))
      }
    }
  }
}
