package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hexagonal binning of point sets (the standard hex-aggregation of
  * geospatial analytics; pointy-top hexagons, axial coordinates):
  * each point maps to the hex containing it via the fractional
  * axial transform + cube rounding (Amit Patel's redblobgames
  * formulation — public reference math).
  *
  * Determinism: the transform is pure IEEE arithmetic + sqrt (no
  * libm trig), so engine and oracle produce bit-identical doubles;
  * the sqrt(3)/3 factor is precomputed driver-side and interpolated
  * into the oracle verbatim. Cube-round ties (exact dx == dy) take
  * the same branch in both engines because the CASE cascade is
  * stated identically over identical doubles.
  *
  * Scale shape: shuffle-free per-row math; the one exchange is the
  * caller's per-hex aggregation.
  */
object Hexbin {
  /** sqrt(3)/3 — shared verbatim with the oracle SQL. */
  val S33: Double = math.sqrt(3.0) / 3

  /** Axial (hq, hr) hex id columns for a point (px, py) and hex
    * circumradius `size`. */
  def hexId(px: Column, py: Column, size: Double): (Column, Column) = {
    val q = (lit(S33) * px - py / 3) / size
    val r = (py * lit(2.0 / 3)) / size
    val x = q; val z = r; val y = -q - r
    val rx = round(x); val ry = round(y); val rz = round(z)
    val dx = abs(rx - x); val dy = abs(ry - y); val dz = abs(rz - z)
    val hq = when(dx > dy && dx > dz, -ry - rz).otherwise(rx)
    val hr = when(!(dx > dy && dx > dz) && !(dy > dz), -rx - ry).otherwise(rz)
    (hq.cast("long"), hr.cast("long"))
  }

  /** Bin points into hexes: (hq, hr, n_points, pid_sum). */
  def bin(points: DataFrame, size: Double): DataFrame = {
    val (hq, hr) = hexId(col("px"), col("py"), size)
    points.select(col("pid"), hq.as("hq"), hr.as("hr"))
      .groupBy("hq", "hr")
      .agg(count(lit(1)).as("n_points"), sum("pid").as("pid_sum"))
  }
}
