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
        round(col("cxn") / (lit(3) * col("s2")) * lit(1000000.0))
          .cast("long").as("cx_u"),
        round(col("cyn") / (lit(3) * col("s2")) * lit(1000000.0))
          .cast("long").as("cy_u"))
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
    points.select(col("pid"),
      round(d * lit(10000.0)).cast("long").as("dist_km_u"),
      round(when(deg < 0, deg + 360).otherwise(deg)
        * lit(10000.0)).cast("long").as("bearing_deg_u"))
  }

  /** SQL text for the great-circle central angle (radians) between
    * two points given as (lonRadSql, latRadSql) expression pairs —
    * the haversine with the clamped asin, identical characters fed to
    * Spark's expr() and the DuckDB oracle (the sinu forwardSqlSteps
    * shared-text contract). */
  def centralAngleSql(p: (String, String), q: (String, String)): String =
    s"2 * asin(least(CAST(1.0 AS DOUBLE), sqrt(" +
      s"sin((${q._2} - ${p._2}) / 2) * sin((${q._2} - ${p._2}) / 2) + " +
      s"cos(${p._2}) * cos(${q._2}) * " +
      s"(sin((${q._1} - ${p._1}) / 2) * sin((${q._1} - ${p._1}) / 2)))))"

  /** SQL text for the spherical excess (steradians) of the triangle
    * v0 v1 v2 by l'Huilier's theorem — numerically stable for the
    * small triangles geographic polygons decompose into:
    * E = 4·atan(sqrt(tan(s/2)·tan((s-a)/2)·tan((s-b)/2)·tan((s-c)/2)))
    * with the product clamped at 0 (degenerate triangles round to a
    * hair negative). Vertices are (lonRadSql, latRadSql) pairs. */
  def triangleExcessSql(v0: (String, String), v1: (String, String),
                        v2: (String, String)): String = {
    val a = centralAngleSql(v1, v2)
    val b = centralAngleSql(v0, v2)
    val c = centralAngleSql(v0, v1)
    val s2 = s"(($a) + ($b) + ($c)) / 2" // s = half-perimeter
    s"4 * atan(sqrt(greatest(CAST(0.0 AS DOUBLE), " +
      s"tan(($s2) / 2) * tan((($s2) - ($a)) / 2) * " +
      s"tan((($s2) - ($b)) / 2) * tan((($s2) - ($c)) / 2))))"
  }

  /** SQL text for the geodesic area (km²) of the diamond of
    * half-diagonal `d` degrees centered on columns (lon, lat): two
    * fan triangles' excesses summed IN ONE ROW (no cross-row float
    * aggregation), scaled by R². The same text runs in both engines;
    * round(4) applied by the caller. */
  def diamondAreaSql(d: Double, radiusKm: Double = 6371.0): String = {
    val v0 = ("radians(lon)", s"radians(lat + $d)")
    val v1 = (s"radians(lon + $d)", "radians(lat)")
    val v2 = ("radians(lon)", s"radians(lat - $d)")
    val v3 = (s"radians(lon - $d)", "radians(lat)")
    s"($radiusKm * $radiusKm) * ((${triangleExcessSql(v0, v1, v2)}) + " +
      s"(${triangleExcessSql(v0, v2, v3)}))"
  }
}
