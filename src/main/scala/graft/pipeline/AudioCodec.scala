package graft.pipeline

/** WAV (RIFF PCM) codec written from the public RIFF/WAVE format
  * spec (the audio sibling of [[ImageCodec]]): chunk-walked decode of
  * integer PCM — 8-bit unsigned and 16-bit signed little-endian —
  * plus the matching encoder for specs and synthetic fixtures.
  *
  * Reference surface: geopyspark has no audio ops; this backs the
  * training-pipeline multimodal columns (SURVEY §2), where audio
  * blobs need the same real-decode treatment images got. All sample
  * math is exact integer — no resampling, no float anywhere.
  */
object AudioCodec {

  /** Interleaved integer samples (16-bit range for 8-bit input too:
    * bytes are centered and scaled by 256, the standard widening). */
  final case class Audio(sampleRate: Int, channels: Int, bits: Int,
                         samples: Array[Int]) {
    def framesPerChannel: Int = samples.length / math.max(channels, 1)
  }

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  /** Decode a RIFF/WAVE blob: walks chunks (fmt before data, other
    * chunks — LIST, fact, cue — skipped per spec, odd sizes padded),
    * accepts PCM (format 1) at 8 or 16 bits. None for anything else. */
  def decode(b: Array[Byte]): Option[Audio] = {
    if (!isWav(b)) return None
    var p = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var out: Option[Audio] = None
    while (p + 8 <= b.length && out.isEmpty) {
      val id = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, p + 4)
      if (size < 0 || p + 8 + size > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16 || le16(b, p + 8) != 1) return None // PCM only
          val bits = le16(b, p + 8 + 14)
          if (bits != 8 && bits != 16) return None
          fmt = Some((le16(b, p + 8 + 2), le32(b, p + 8 + 4), bits))
        case "data" =>
          val (ch, rate, bits) = fmt.getOrElse(return None)
          val n = if (bits == 16) size / 2 else size
          val samples = new Array[Int](n)
          var i = 0
          if (bits == 16)
            while (i < n) { samples(i) = le16(b, p + 8 + 2 * i).toShort.toInt; i += 1 }
          else
            while (i < n) { samples(i) = ((b(p + 8 + i) & 0xff) - 128) * 256; i += 1 }
          out = Some(Audio(rate, ch, bits, samples))
        case _ => () // skip unknown chunk
      }
      p += 8 + size + (size & 1) // chunks are word-aligned
    }
    out
  }

  /** Minimal canonical 16-bit PCM writer (fmt + data, no extra
    * chunks) — the fixture/synthesis side of the codec. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    def put(p: Int, s: String): Unit = { var i = 0; while (i < s.length) { b(p + i) = s.charAt(i).toByte; i += 1 } }
    def p16(p: Int, v: Int): Unit = { b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte }
    def p32(p: Int, v: Int): Unit = { p16(p, v & 0xffff); p16(p + 2, (v >>> 16) & 0xffff) }
    put(0, "RIFF"); p32(4, 36 + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, channels)
    p32(24, sampleRate); p32(28, sampleRate * channels * 2)
    p16(32, channels * 2); p16(34, 16)
    put(36, "data"); p32(40, dataLen)
    var i = 0
    while (i < samples.length) { p16(44 + 2 * i, samples(i) & 0xffff); i += 1 }
    b
  }

  /** Exact integer features: (frames, zeroCrossings, energy).
    * Crossings count strict sign flips (s_{k-1} * s_k < 0) along the
    * interleaved stream; energy is the exact Σ s^2 (fits a long:
    * 2^31 samples at full scale stay under 2^61). */
  def features(a: Audio): (Long, Long, Long) = {
    var zc = 0L; var en = 0L
    var i = 0
    val s = a.samples
    while (i < s.length) {
      en += s(i).toLong * s(i)
      if (i > 0 && s(i - 1).toLong * s(i) < 0) zc += 1
      i += 1
    }
    (a.framesPerChannel.toLong, zc, en)
  }
}
