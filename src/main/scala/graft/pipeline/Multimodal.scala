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
}
