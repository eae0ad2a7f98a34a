package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus statistics (Cormode &
  * Muthukrishnan, "An improved data stream summary: the count-min
  * sketch and its applications", J. Algorithms 2005 — public).
  *
  * Determinism contract: the d hash rows use the portable md5-prefix
  * hash (the Curation.idHash convention) salted with the row index, so
  * the DuckDB oracle states the identical cell layout. Counts are
  * exact integer sums.
  *
  * Scale shape: the token count aggregate is bounded by vocabulary
  * (map-side combine), the sketch by depth x width — constant-size
  * output no matter the corpus, which is the point of a sketch: at
  * 100 TB the (j, b) cells partial-aggregate on every executor and one
  * tiny exchange merges them. Sketches from disjoint corpus shards
  * add cell-wise (the spec proves mergeability).
  */
object Sketch {

  /** 60-bit portable hash of `s` salted by row `j`. */
  def rowHash(j: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), s)), 1, 15), 16, 10).cast("long")

  /** Count-min sketch of corpus token frequencies: (j, b, cnt) cells,
    * j < depth, b = hash_j(token) % width. Point estimates take the
    * min over rows ([[cmsEstimate]]); overestimates only, by the
    * standard CMS guarantee. */
  def countMinSketch(docs: DataFrame, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1)
    val counts = docs
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    counts
      .select(explode(array((0 until depth).map(j =>
          struct(lit(j.toLong).as("j"), (rowHash(j, col("w")) % width).as("b"))): _*)).as("h"),
        col("cnt"))
      .groupBy(col("h.j").as("j"), col("h.b").as("b"))
      .agg(sum("cnt").as("cnt"))
  }

  /** Point-frequency estimate from a collected sketch: min over the
    * depth rows of the queried cell (0 for never-hashed cells). A
    * serving-side helper — the sketch is depth x width tiny. */
  def cmsEstimate(sketch: Array[(Long, Long, Long)], token: String,
                  depth: Int = 4, width: Int = 256): Long = {
    val cells = sketch.map { case (j, b, c) => (j, b) -> c }.toMap
    (0 until depth).map { j =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$token".getBytes("UTF-8"))
      val hex = digest.map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      cells.getOrElse((j.toLong, h % width), 0L)
    }.min
  }
}
