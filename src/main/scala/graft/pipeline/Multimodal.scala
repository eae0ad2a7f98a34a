package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with
  * typed metadata, batch-oriented decode/feature plumbing.
  *
  * Image decode is REAL: [[ImageCodec]] decodes PNG, BMP, and
  * baseline JPEG blobs in-executor (pure Scala, written from the
  * public specs) and feature extraction / resize operate on actual
  * pixels. Blobs that are not a supported image (e.g. the text-corpus
  * stand-ins the oracle tables provide, or codecs we do not ship —
  * video) fall back to a deterministic byte-level path, so the
  * operators stay total over arbitrary binary columns.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, magic: Int,
                             width: Int, height: Int, feature: Double)

  /** Wrap a text corpus as fake media blobs (binary column + metadata)
    * — stands in for image/audio bytes end-to-end. */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      col("source").as("media_source"))

  /** Image decode that can never fail a job: a malformed blob that
    * happens to carry an image magic (corrupt download, truncated
    * object) falls back to the byte path instead of throwing — these
    * operators are documented total over arbitrary binary columns. */
  private def tryDecode(bytes: Array[Byte]): Option[ImageCodec.Image] =
    try ImageCodec.decode(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Batch decode: PNG/BMP blobs decode for real (width/height +
    * mean-luminance feature from actual pixels); other blobs get the
    * deterministic byte-sum fallback with width = height = 0. One
    * iterator per partition — the mapInPandas batch shape. */
  def decodeFeatures(blobs: DataFrame): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val magic = if (bytes.length >= 2) ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff) else 0
          tryDecode(bytes) match {
            case Some(img) =>
              MediaMeta(id, bytes.length.toLong, magic, img.width, img.height,
                ImageCodec.meanLuminance(img))
            case None =>
              var s = 0L; var i = 0
              while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
              MediaMeta(id, bytes.length.toLong, magic, 0, 0,
                s.toDouble / math.max(bytes.length, 1))
          }
        }
      }
  }

  /** Pure-SQL metadata path (oracle-checkable): byte length + first-
    * byte magic from the binary column. */
  def metadata(blobs: DataFrame): DataFrame =
    blobs.select(col("doc_id"),
      length(col("blob")).cast("long").as("n_bytes"),
      ascii(substring(decode(col("blob"), "UTF-8"), 1, 1)).cast("long").as("magic"))

  final case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
                             frames: Long, zero_crossings: Long, energy: Long)

  /** Batch audio decode: WAV (RIFF PCM) blobs decode for real —
    * frames, strict-sign-flip zero crossings, exact Σs^2 energy, all
    * integer ([[AudioCodec]]). Non-WAV blobs report zeros so the
    * operator stays total over arbitrary binary columns, mirroring
    * [[decodeFeatures]]' contract for images. */
  def decodeAudioFeatures(blobs: DataFrame): Dataset[AudioMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (try AudioCodec.decode(bytes)
           catch { case scala.util.control.NonFatal(_) => None }) match {
            case Some(a) =>
              val (f, zc, en) = AudioCodec.features(a)
              AudioMeta(id, a.sampleRate.toLong, a.channels.toLong, f, zc, en)
            case None => AudioMeta(id, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
  }

  /** Deterministic synthetic PCM fixture: doc k gets
    * 64 + doc_id % 32 mono 16 kHz samples
    * s_k = ((doc_id*7 + k*13) mod 256 - 128) * 256, encoded as a real
    * WAV blob — the closed form an oracle can restate, through the
    * actual encoder/decoder byte path. */
  def synthWavBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = (64 + id % 32).toInt
      val samples = Array.tabulate(n)(k => ((((id * 7 + k * 13) % 256) - 128) * 256).toInt)
      (id, AudioCodec.encode(16000, 1, samples))
    }.toDF("doc_id", "blob")
  }

  /** Deterministic NEAR-DUP WAV fixture for the audio-fingerprint
    * dedup path: groups of 4 share base samples (132 mono samples,
    * s_k = ((base·7 + k·13) mod 256 − 128)·256, base = doc_id / 4);
    * variants v = 1..3 perturb the single sample at k = 17·v by +101
    * inside the mod — genuine fingerprint near-dups through the REAL
    * WAV byte path, closed-form for the oracle. */
  def synthWavNearDupBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val base = id / 4
      val v = (id % 4).toInt
      val samples = Array.tabulate(132) { k =>
        val bump = if (v > 0 && k == 17 * v) 101 else 0
        ((((base * 7 + k * 13 + bump) % 256) - 128) * 256).toInt
      }
      (id, AudioCodec.encode(16000, 1, samples))
    }.toDF("doc_id", "blob")
  }

  /** Audio-fingerprint NEAR-DUP pairs through the REAL WAV path — the
    * audio member of the dedup family (the energy-delta fingerprint of
    * the acoustic-ID literature, integer-exact): per clip, energies of
    * the first `bits`+1 full `win`-sample windows (E = Σ s², exact
    * integers), bit w set iff E[w+1] > E[w], then the pigeonhole-
    * banded hamming join ([[Dedup.simhashPairsFrom]]). Clips shorter
    * than (bits+1)·win samples drop (no fingerprint, like sub-shingle
    * docs); undecodable blobs drop too. Output: (d1, d2, hamming). */
  def audioHashPairs(blobs: DataFrame, win: Int = 4, bits: Int = 32,
                     maxDist: Int = 7, bands: Int = 8,
                     maxBucket: Option[Long] = Some(Dedup.SimhashMaxBucket),
                     failOnHot: Boolean = false): DataFrame = {
    require(win > 0 && bits > 0 && bits % bands == 0)
    val spark = blobs.sparkSession
    import spark.implicits._
    val sig = blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).filter(_.samples.length >= (bits + 1) * win)
          .map { a =>
            val e = Array.tabulate(bits + 1) { w =>
              var s = 0L
              var o = 0
              while (o < win) {
                val v = a.samples(w * win + o).toLong
                s += v * v
                o += 1
              }
              s
            }
            var hash = 0L
            var w = 0
            while (w < bits) {
              if (e(w + 1) > e(w)) hash |= (1L << w)
              w += 1
            }
            (id, hash)
          }
      }.toDF("doc_id", "sig")
    Dedup.simhashPairsFrom(sig.localCheckpoint(), bits, maxDist, bands,
      maxBucket, failOnHot)
  }

  /** Deterministic synthetic 24-bit BMPs through the REAL BMP byte
    * path: gray g(x,y) = (id·7 + x·3 + y·11) mod 256 in all three
    * channels, w = 8 + (id mod 5)·2, h = 6 + (id mod 3)·2 — the
    * closed form an oracle restates, through the actual
    * encoder/decoder bytes (the synthWavBlobs pattern). */
  def synthBmpBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (8 + id % 5 * 2).toInt
      val h = (6 + id % 3 * 2).toInt
      (id, bmp24(w, h, (x, y) => ((id * 7 + x * 3 + y * 11) % 256).toInt))
    }.toDF("doc_id", "blob")
  }

  /** Deterministic NEAR-DUP BMP fixture for the perceptual-hash dedup
    * path: docs travel in groups of 4 sharing a base image (pixels and
    * dimensions from base = doc_id / 4, the [[synthBmpBlobs]] formula);
    * variants v = 1..3 perturb ONE pixel at ((2v) % w, (3v) % h) by
    * +128 mod 256 — genuine hamming-0..k near-dups through the REAL
    * byte path, closed-form enough for the oracle to restate. */
  def synthBmpNearDupBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val base = id / 4
      val v = (id % 4).toInt
      val w = (8 + base % 5 * 2).toInt
      val h = (6 + base % 3 * 2).toInt
      val (px, py) = ((2 * v) % w, (3 * v) % h)
      (id, bmp24(w, h, (x, y) => {
        val g = ((base * 7 + x * 3 + y * 11) % 256).toInt
        if (v > 0 && x == px && y == py) (g + 128) % 256 else g
      }))
    }.toDF("doc_id", "blob")
  }

  /** Perceptual-hash (aHash-64) image NEAR-DUP pairs through the REAL
    * decode path — the multimodal member of the dedup family: per
    * image, an 8×8 nearest-neighbor sample of the gray channel
    * (positions i·w/8, j·h/8 — exact integer division), bit k set iff
    * pix·64 > Σ of the 64 samples (the mean test with no division),
    * then the SAME pigeonhole-banded hamming join text SimHash uses
    * ([[Dedup.simhashPairsFrom]]: equi-join on 8-bit bands + exact
    * verify ≤ maxDist, hot-bucket capped) — never all-pairs.
    * Undecodable blobs drop (no signature, like sub-shingle docs).
    * Output: (d1, d2, hamming). */
  def imageHashPairs(blobs: DataFrame, maxDist: Int = 7, bands: Int = 8,
                     maxBucket: Option[Long] = Some(Dedup.SimhashMaxBucket),
                     failOnHot: Boolean = false): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val sig = blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        tryDecode(bytes).map { img =>
          val px = new Array[Long](64)
          var s = 0L
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              val p = (img.argb(i * img.width / 8, j * img.height / 8) & 0xff).toLong
              px(j * 8 + i) = p; s += p
              i += 1
            }
            j += 1
          }
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (px(k) * 64 > s) hash |= (1L << k)
            k += 1
          }
          (id, hash)
        }
      }.toDF("doc_id", "sig")
    Dedup.simhashPairsFrom(sig.localCheckpoint(), 64, maxDist, bands,
      maxBucket, failOnHot)
  }

  /** Minimal 24-bit BI_RGB BMP writer (bottom-up rows, 4-byte row
    * padding — the BITMAPINFOHEADER layout ImageCodec decodes). */
  private[pipeline] def bmp24(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    def le32(p: Int, v: Int): Unit = {
      b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
      b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; le32(2, size); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    b(26) = 1; b(28) = 24; le32(30, 0); le32(34, rowBytes * h)
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val g = gray(x, y).toByte
        b(base + x * 3) = g; b(base + x * 3 + 1) = g; b(base + x * 3 + 2) = g
        x += 1
      }
      y += 1
    }
    b
  }

  /** Nearest-neighbor downsample features through the REAL decode:
    * per image (doc_id, w2, h2, pix_sum) with pix_sum = exact Σ of the
    * sampled (factor·x, factor·y) gray pixels. The real resize op's
    * shape (per-row decode in a Dataset.map, no driver bytes); the
    * features stand in for the re-encoded raster so the oracle can
    * restate them. Undecodable blobs report (0, 0, −1). */
  def resizeFeatures(blobs: DataFrame, factor: Int = 2): DataFrame = {
    require(factor > 0)
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        tryDecode(bytes) match {
          case Some(img) =>
            val w2 = img.width / factor; val h2 = img.height / factor
            var s = 0L; var y = 0
            while (y < h2) {
              var x = 0
              while (x < w2) {
                s += (img.argb(x * factor, y * factor) & 0xff); x += 1
              }
              y += 1
            }
            (id, w2.toLong, h2.toLong, s)
          case None => (id, 0L, 0L, -1L)
        }
      }.toDF("doc_id", "w2", "h2", "pix_sum")
  }

  /** Non-overlapping window energies through the REAL WAV path: per
    * full `win`-sample window, the exact integer Σ s² (the spectral-
    * feature batch shape; partial tail windows drop). */
  def audioWindows(blobs: DataFrame, win: Int = 16): DataFrame = {
    require(win > 0)
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (try AudioCodec.decode(bytes)
         catch { case scala.util.control.NonFatal(_) => None }) match {
          case Some(a) =>
            (0 until a.samples.length / win).map { wi =>
              var s = 0L; var k = wi * win
              while (k < (wi + 1) * win) {
                s += a.samples(k).toLong * a.samples(k); k += 1
              }
              (id, wi.toLong, s)
            }
          case None => Nil
        }
      }.toDF("doc_id", "win_idx", "energy")
  }

  /** Per-doc PCM autocorrelation at lags 1..maxLag through the REAL
    * WAV path — the classic periodicity/pitch-proxy feature:
    * r_k = Σ_t s_t·s_{t+k}, an EXACT integer over int16 samples (the
    * audioWindows discipline — no floats anywhere). Non-WAV blobs
    * emit nothing (total operator, empty contribution). */
  def audioAutocorr(blobs: DataFrame, maxLag: Int = 8): DataFrame = {
    require(maxLag >= 1)
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (try AudioCodec.decode(bytes)
         catch { case scala.util.control.NonFatal(_) => None }) match {
          case Some(a) =>
            (1 to math.min(maxLag, math.max(a.samples.length - 1, 0))).map { k =>
              var s = 0L; var t = 0
              while (t + k < a.samples.length) {
                s += a.samples(t).toLong * a.samples(t + k); t += 1
              }
              (id, k.toLong, s)
            }
          case None => Nil
        }
      }.toDF("doc_id", "lag", "r")
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_sig: Long)

  /** Frame sampling for video-ish blobs — one output row per sampled
    * frame (the flatMap row-per-frame shape, stride policy, and
    * per-partition batch iteration with a reused digest are the
    * production pattern; a real build swaps the STUB "decode" for a
    * demuxer). Frame count derives from byte length (bytes/64 + 1,
    * capped), each sampled frame's signature is 48 bits of the content
    * MD5 at that frame's offset, read circularly (offset mod digest
    * length, wrapping) so ANY stride/maxFrames stays in bounds —
    * deterministic and oracle-checkable; frames at default stride read
    * identically to a plain substring. */
  def sampleFrames(blobs: DataFrame, stride: Int = 3, maxFrames: Int = 12): Dataset[Frame] = {
    require(stride > 0 && maxFrames > 0)
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          val n = math.min(bytes.length / 64 + 1, maxFrames)
          (0 until n by stride).map { i =>
            val off = (2 * i) % hex.length
            val window =
              if (off + 12 <= hex.length) hex.substring(off, off + 12)
              else hex.substring(off) + hex.substring(0, off + 12 - hex.length)
            Frame(id, i, java.lang.Long.parseLong(window, 16))
          }
        }
      }
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Long, width: Long,
                              height: Long, pix_sum: Long)

  /** Deterministic synthetic MJPEG-era AVI fixtures through the REAL
    * RIFF byte path ([[AviCodec]], uncompressed-DIB stream): doc id
    * gets nf = 2 + id%3 frames of w = 8 + (id%3)·4, h = 6 + (id%2)·4,
    * gray g(f, x, y) = (id·7 + f·17 + x·3 + y·11) mod 256 — the closed
    * form an oracle restates, through actual container encode/demux
    * bytes (the synthWavBlobs/synthBmpBlobs pattern). */
  def synthAviBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (8 + id % 3 * 4).toInt
      val h = (6 + id % 2 * 4).toInt
      val nf = (2 + id % 3).toInt
      (id, AviCodec.encodeDib(w, h, nf,
        f => (x, y) => ((id * 7 + f * 17 + x * 3 + y * 11) % 256).toInt))
    }.toDF("doc_id", "blob")
  }

  /** REAL video frame sampling (r15): blobs that parse as RIFF/AVI
    * demux through [[AviCodec]] — every stride-th frame decodes
    * (uncompressed DIB directly; MJPEG '00dc' chunks through
    * ImageCodec/JpegCodec) and reports its exact gray pixel sum.
    * Non-video blobs keep the deterministic md5 synthetic fallback
    * ([[sampleFrames]]' policy) with width = height = 0, so the
    * operator stays total over arbitrary binary columns. */
  def videoFrames(blobs: DataFrame, stride: Int = 2,
                  maxFrames: Int = 8): Dataset[VideoFrame] = {
    require(stride > 0 && maxFrames > 0)
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          // NonFatal guard (matching audioAutocorr): one corrupt blob must
          // not fail the whole job — undecodable bytes take the synthetic
          // fallback row instead.
          (try AviCodec.decode(bytes)
           catch { case scala.util.control.NonFatal(_) => None }) match {
            case Some(avi) =>
              val n = math.min(avi.frames.length, maxFrames)
              (0 until n by stride).flatMap { i =>
                (try AviCodec.decodeFrame(avi, i)
                 catch { case scala.util.control.NonFatal(_) => None }).map { img =>
                  var s = 0L; var p = 0
                  while (p < img.pixels.length) { s += img.pixels(p) & 0xff; p += 1 }
                  VideoFrame(id, i.toLong, img.width.toLong, img.height.toLong, s)
                }
              }
            case None =>
              md.reset()
              val hex = md.digest(bytes).map("%02x".format(_)).mkString
              val n = math.min(bytes.length / 64 + 1, maxFrames)
              (0 until n by stride).map { i =>
                val off = (2 * i) % hex.length
                val window =
                  if (off + 12 <= hex.length) hex.substring(off, off + 12)
                  else hex.substring(off) + hex.substring(0, off + 12 - hex.length)
                VideoFrame(id, i.toLong, 0L, 0L, java.lang.Long.parseLong(window, 16))
              }
          }
        }
      }
  }

  /** Resize to (w, h): decodable images get a REAL nearest-neighbor
    * pixel resample (the output blob is the resized image's luminance
    * plane, row-major w*h bytes); other blobs keep the deterministic
    * nearest-index byte resampling so the operator stays total. Batch
    * signature and per-partition buffer reuse are the production
    * shape. */
  def resize(blobs: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0)
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val out = new Array[Byte](w * h) // reused across the batch
        it.map { case (id, bytes) =>
          tryDecode(bytes) match {
            case Some(img) =>
              val r = ImageCodec.resizeNearest(img, w, h)
              var i = 0
              while (i < w * h) {
                val px = r.pixels(i)
                out(i) = ((299 * ((px >> 16) & 0xff) + 587 * ((px >> 8) & 0xff) +
                  114 * (px & 0xff)) / 1000).toByte
                i += 1
              }
            case None =>
              var i = 0
              while (i < w * h) {
                out(i) = if (bytes.isEmpty) 0 else bytes((i.toLong * bytes.length / (w * h)).toInt)
                i += 1
              }
          }
          (id, w, h, out.clone())
        }
      }
      .toDF("doc_id", "width", "height", "blob")
  }
}
