package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {

  test("16-bit roundtrip through our own encoder") {
    val s = Array(0, 100, -100, 32767, -32768, 1, -1)
    val a = AudioCodec.decode(AudioCodec.encode(8000, 1, s)).get
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bits == 16)
    assert(a.samples.sameElements(s))
  }

  test("interop: decodes WAVs written by javax.sound (independent encoder)") {
    import javax.sound.sampled._
    val samples = Array.tabulate(300)(i => (math.sin(i * 0.1) * 20000).toInt)
    val fmt = new AudioFormat(16000f, 16, 1, true, false) // signed 16-bit LE
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    val a = AudioCodec.decode(bos.toByteArray).get
    assert(a.sampleRate == 16000 && a.channels == 1)
    assert(a.samples.sameElements(samples))
  }

  test("8-bit unsigned widens by centering and scaling 256") {
    // hand-built: 8-bit fmt, data bytes 128 (silence), 255, 0
    val b16 = AudioCodec.encode(8000, 1, Array(0))
    // patch bits to 8 and rebuild data: easier to assemble by hand
    val header = b16.take(36)
    header(34) = 8 // bits per sample
    val data = Array[Byte]('d', 'a', 't', 'a', 3, 0, 0, 0, 128.toByte, 255.toByte, 0)
    val a = AudioCodec.decode(header ++ data).get
    assert(a.samples.sameElements(Array(0, 127 * 256, -128 * 256)))
  }

  test("unknown chunks are skipped and odd sizes word-aligned") {
    val base = AudioCodec.encode(8000, 2, Array(5, -5, 7, -7))
    // splice a 3-byte LIST chunk (odd size -> 1 pad byte) before fmt
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    val a = AudioCodec.decode(spliced).get
    assert(a.channels == 2 && a.samples.sameElements(Array(5, -5, 7, -7)))
    assert(a.framesPerChannel == 2)
  }

  test("non-PCM, truncated, and non-WAV blobs decode to None") {
    assert(AudioCodec.decode("not audio".getBytes).isEmpty)
    val b = AudioCodec.encode(8000, 1, Array(1, 2, 3))
    assert(AudioCodec.decode(b.take(30)).isEmpty)        // truncated header
    assert(AudioCodec.decode(b.take(b.length - 2)).isEmpty) // truncated data
    val nonPcm = b.clone(); nonPcm(20) = 3               // IEEE float fmt
    assert(AudioCodec.decode(nonPcm).isEmpty)
  }

  test("features: frames, strict zero crossings, exact energy") {
    val a = AudioCodec.Audio(16000, 1, 16, Array(100, -200, 0, -5, 5))
    val (f, zc, en) = AudioCodec.features(a)
    assert(f == 5)
    // flips: 100/-200 yes, -200/0 no (strict), 0/-5 no, -5/5 yes
    assert(zc == 2)
    assert(en == 100L * 100 + 200L * 200 + 25 + 25)
  }
}
