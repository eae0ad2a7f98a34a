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
}
