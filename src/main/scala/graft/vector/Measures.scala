package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed polygon measures — the vector-side summary ops
  * (geotrellis delegates these to JTS; here they are codegen'd
  * higher-order aggregates over coordinate arrays, no UDF on the data
  * path).
  *
  * Shoelace: 2A = sum_i (x_i y_{i+1} - x_{i+1} y_i) over a CLOSED
  * ring (last vertex repeats the first); area = |2A| / 2 and the
  * centroid is (sum (x_i + x_{i+1}) c_i, sum (y_i + y_{i+1}) c_i) /
  * (3 * 2A) with c_i the per-edge cross term — the signed form, so
  * ring orientation cancels. With integer-or-half coordinates every
  * cross term is exact and the only inexact steps are the two final
  * divisions.
  *
  * Scale shape: pure per-row array math, shuffle-free. The lambda
  * work is genuinely per element (no whole-array expression inside —
  * the HOF-CSE trap doesn't apply).
  */
object Measures {

  /** @param polys (pid, shape, xs, ys) — closed rings as coordinate
    *              arrays (xs(n-1) == xs(0))
    * @return (pid, shape, area, cx, cy) with centroid rounded 6dp */
  def measures(polys: DataFrame): DataFrame = {
    def ring(i: Column, xs: String = "xs", ys: String = "ys"): Column =
      element_at(col(xs), i) * element_at(col(ys), i + 1) -
        element_at(col(xs), i + 1) * element_at(col(ys), i)
    val idx = sequence(lit(1), size(col("xs")) - 1)
    val zero = lit(0.0).cast("double")
    polys.select(col("pid"), col("shape"),
        aggregate(idx, zero, (acc, i) => acc + ring(i)).as("s2"),
        aggregate(idx, zero, (acc, i) =>
          acc + (element_at(col("xs"), i) + element_at(col("xs"), i + 1)) * ring(i)).as("cxn"),
        aggregate(idx, zero, (acc, i) =>
          acc + (element_at(col("ys"), i) + element_at(col("ys"), i + 1)) * ring(i)).as("cyn"))
      .select(col("pid"), col("shape"),
        (abs(col("s2")) / 2).as("area"),
        round(col("cxn") / (lit(3) * col("s2")), 6).as("cx"),
        round(col("cyn") / (lit(3) * col("s2")), 6).as("cy"))
  }

  /** Great-circle distance + initial bearing from each point to an
    * anchor (geotrellis vector Haversine/GeodesicDistance surface):
    * the spherical haversine form (numerically stable at short range;
    * asin clamped at 1 for antipodal rounding) and the standard
    * initial-bearing atan2, normalized to [0, 360) degrees.
    *
    * Float contract: trig goes through IEEE doubles in both engines
    * (JVM Math vs libm agree to ulps); outputs round to 4 dp — the
    * reproject-oracle convention (sub-meter at earth scale). Pure
    * per-row expression math, shuffle-free, stays in codegen.
    *
    * @param points (pid, lon, lat) in degrees */
  def geodesic(points: DataFrame, anchorLon: Double, anchorLat: Double,
               radiusKm: Double = 6371.0): DataFrame = {
    val f1 = radians(col("lat"))
    val f2 = radians(lit(anchorLat))
    val dphi = radians(lit(anchorLat) - col("lat"))
    val dlam = radians(lit(anchorLon) - col("lon"))
    val sp = sin(dphi / 2)
    val sl = sin(dlam / 2)
    val a = sp * sp + cos(f1) * cos(f2) * (sl * sl)
    val d = lit(2 * radiusKm) * asin(least(lit(1.0), sqrt(a)))
    val deg = degrees(atan2(sin(dlam) * cos(f2),
      cos(f1) * sin(f2) - sin(f1) * cos(f2) * cos(dlam)))
    points.select(col("pid"), round(d, 4).as("dist_km"),
      round(when(deg < 0, deg + 360).otherwise(deg), 4).as("bearing_deg"))
  }
}
