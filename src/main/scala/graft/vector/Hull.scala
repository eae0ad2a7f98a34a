package graft.vector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Convex hull of a distributed point set (the JTS `ConvexHull`
  * surface geotrellis exposes on vector RDDs; reference
  * geopyspark/geotrellis delegate to JTS — here re-derived as
  * Andrew's monotone chain with EXACT integer predicates).
  *
  * Determinism: coordinates are half-integral on the oracle grid
  * (k + 0.5), so doubling them to Longs makes every orientation test
  * an exact integer cross product — no epsilons anywhere. Collinear
  * boundary points are EXCLUDED (strict hull), matching the oracle's
  * edge predicate. The hull is emitted in CCW order starting from the
  * lexicographically smallest vertex.
  *
  * Scale shape: the classic two-level reduction — each partition
  * contracts to its LOCAL hull (mapPartitions, no shuffle), and only
  * those candidates reach the driver for the final chain. The
  * candidate count is bounded by Σ per-partition hull sizes;
  * `maxPoints` guards the degenerate all-points-on-a-circle case with
  * a loud failure (the kriging-fit / costPath ceiling precedent).
  */
object Hull {

  /** cross((b - a), (c - a)) — positive = c strictly left of a→b. */
  private def cross(ax: Long, ay: Long, bx: Long, by: Long, cx: Long, cy: Long): Long =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Monotone chain on distinct points; returns the strict hull in CCW
    * order starting at the smallest (x, y). Fewer than 3 input points
    * come back as-is (sorted). */
  private[vector] def chain(pts: Array[(Long, Long)]): Array[(Long, Long)] = {
    val s = pts.distinct.sortBy(identity)
    if (s.length < 3) return s
    val h = new Array[(Long, Long)](2 * s.length)
    var k = 0
    // lower hull: pop while the turn is not strictly left (<= 0 drops
    // collinear mid-points -> strict hull)
    for (p <- s) {
      while (k >= 2 && cross(h(k - 2)._1, h(k - 2)._2, h(k - 1)._1, h(k - 1)._2, p._1, p._2) <= 0) k -= 1
      h(k) = p; k += 1
    }
    // upper hull
    val lower = k + 1
    for (i <- s.length - 2 to 0 by -1) {
      val p = s(i)
      while (k >= lower && cross(h(k - 2)._1, h(k - 2)._2, h(k - 1)._1, h(k - 1)._2, p._1, p._2) <= 0) k -= 1
      h(k) = p; k += 1
    }
    h.take(k - 1) // last == first
  }

  /** Convex hull summary of `points` (pid, px, py): one row per hull
    * VERTEX carrying the global hull size, exact area, and the
    * micro-quantized perimeter (per-edge lengths quantized before the
    * sum — order-free, the zonal-circular-mean rule). */
  def convex(points: DataFrame, maxPoints: Int = 1 << 20): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cand = points
      .select((col("px") * 2).cast("long").as("x"), (col("py") * 2).cast("long").as("y"))
      .distinct()
      .as[(Long, Long)]
      .mapPartitions(it => chain(it.toArray).iterator)
      .collect()
    require(cand.length <= maxPoints,
      s"convex hull candidate set ${cand.length} exceeds maxPoints=$maxPoints " +
        "(near-circular point set); raise the ceiling or pre-aggregate")
    val hull = chain(cand)
    val n = hull.length
    // CCW shoelace on doubled coords: Σ(ax*by - bx*ay) = 8 * area
    var s2 = 0L
    var pq = 0L
    var i = 0
    while (i < n) {
      val (ax, ay) = hull(i); val (bx, by) = hull((i + 1) % n)
      s2 += ax * by - bx * ay
      val dx = (bx - ax).toDouble / 2; val dy = (by - ay).toDouble / 2
      pq += math.round(math.sqrt(dx * dx + dy * dy) * 1000000.0)
      i += 1
    }
    val area = s2.toDouble / 8
    // micro-quantized perimeter closing: pq is the exact 1e-6-unit
    // integer sum, so 1e-5 units = HALF_UP integer division by 10
    val perimU = (pq + 5) / 10
    val rows = hull.toSeq.map { case (x, y) =>
      Row(x.toDouble / 2, y.toDouble / 2, n.toLong, area, perimU)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("px", DoubleType), StructField("py", DoubleType),
        StructField("n_hull", LongType), StructField("area", DoubleType),
        StructField("perim_u", LongType))))
  }
}
