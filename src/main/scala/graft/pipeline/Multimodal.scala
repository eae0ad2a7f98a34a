package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with
  * typed metadata, batch-oriented decode/feature plumbing.
  *
  * The decode itself is STUBBED (deterministic fake — no image/audio
  * libs in this container, flagged per the builder prompt); everything
  * Spark-side is real: binary schema, partition-sized batch iteration
  * (mapPartitions, the Scala analogue of mapInPandas batches),
  * metadata extraction as codegen'd expressions.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, magic: Int, feature: Double)

  /** Wrap a text corpus as fake media blobs (binary column + metadata)
    * — stands in for image/audio bytes end-to-end. */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      col("source").as("media_source"))

  /** STUB decode: a real implementation would JNI/FFM into an image
    * codec here; this deterministic fake hashes bytes to a "feature".
    * Batch shape (one iterator per partition, reused buffers) is the
    * production pattern. */
  def decodeFeatures(blobs: DataFrame): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val magic = if (bytes.length >= 2) ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff) else 0
          // STUB: deterministic byte-sum "feature" in place of a decoded
          // image statistic
          var s = 0L; var i = 0
          while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
          MediaMeta(id, bytes.length.toLong, magic, s.toDouble / math.max(bytes.length, 1))
        }
      }
  }

  /** Pure-SQL metadata path (oracle-checkable): byte length + first-
    * byte magic from the binary column. */
  def metadata(blobs: DataFrame): DataFrame =
    blobs.select(col("doc_id"),
      length(col("blob")).cast("long").as("n_bytes"),
      ascii(substring(decode(col("blob"), "UTF-8"), 1, 1)).cast("long").as("magic"))

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

  /** STUB resize: deterministic nearest-index byte resampling standing
    * in for a codec resize (no image libs in this container); the
    * (blob, w, h) -> blob batch signature and per-partition buffer
    * reuse are the real plumbing. */
  def resize(blobs: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0)
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val out = new Array[Byte](w * h) // reused across the batch
        it.map { case (id, bytes) =>
          var i = 0
          while (i < w * h) {
            out(i) = if (bytes.isEmpty) 0 else bytes((i.toLong * bytes.length / (w * h)).toInt)
            i += 1
          }
          (id, w, h, out.clone())
        }
      }
      .toDF("doc_id", "width", "height", "blob")
  }
}
