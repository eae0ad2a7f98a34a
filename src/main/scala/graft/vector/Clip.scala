package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Polygon clipping to an axis-aligned rectangle by Sutherland &
  * Hodgman 1974 (the JTS/geotrellis `intersection(extent)` role for
  * the convex-clip case): four half-plane passes, each keeping inside
  * vertices and inserting edge/boundary intersection points. Works on
  * convex and concave rings (rectangular clip windows cannot split a
  * ring's interior into the degenerate multi-part cases general
  * concave clipping has).
  *
  * Scale shape: rings clip independently — a per-row transform over
  * the feature table, no joins, no shuffle. The oracle is
  * literal-restating (the q_tin precedent): fixture rings are
  * sf-independent formulas, so the pure-Scala twin pins the expected
  * output at oracle-build time.
  */
object Clip {
  /** Clip one ring (closed implicitly: last connects to first).
    * Returns the clipped ring's vertices (possibly empty). */
  private[graft] def clipRing(xs: IndexedSeq[Double], ys: IndexedSeq[Double],
      xmin: Double, ymin: Double, xmax: Double, ymax: Double)
      : (IndexedSeq[Double], IndexedSeq[Double]) = {
    // inside predicates + intersection solvers for the 4 half-planes
    type Pt = (Double, Double)
    def pass(pts: IndexedSeq[Pt], inside: Pt => Boolean,
             cross: (Pt, Pt) => Pt): IndexedSeq[Pt] = {
      if (pts.isEmpty) return pts
      val out = scala.collection.mutable.ArrayBuffer.empty[Pt]
      var prev = pts.last
      pts.foreach { cur =>
        val ci = inside(cur); val pi = inside(prev)
        if (ci) {
          if (!pi) out += cross(prev, cur)
          out += cur
        } else if (pi) out += cross(prev, cur)
        prev = cur
      }
      out.toIndexedSeq
    }
    def xAt(a: (Double, Double), b: (Double, Double), x: Double): (Double, Double) = {
      val t = (x - a._1) / (b._1 - a._1); (x, a._2 + t * (b._2 - a._2))
    }
    def yAt(a: (Double, Double), b: (Double, Double), y: Double): (Double, Double) = {
      val t = (y - a._2) / (b._2 - a._2); (a._1 + t * (b._1 - a._1), y)
    }
    var pts: IndexedSeq[Pt] = xs.zip(ys)
    pts = pass(pts, _._1 >= xmin, (a, b) => xAt(a, b, xmin))
    pts = pass(pts, _._1 <= xmax, (a, b) => xAt(a, b, xmax))
    pts = pass(pts, _._2 >= ymin, (a, b) => yAt(a, b, ymin))
    pts = pass(pts, _._2 <= ymax, (a, b) => yAt(a, b, ymax))
    (pts.map(_._1), pts.map(_._2))
  }

  /** Shoelace area (absolute). */
  private[graft] def ringArea(xs: IndexedSeq[Double], ys: IndexedSeq[Double]): Double = {
    val n = xs.length
    if (n < 3) return 0.0
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    math.abs(s) / 2.0
  }

  /** Clip every ring of `polys` (pid, xs, ys) to the rectangle;
    * returns (pid, n vertices, area) with empty results dropped. */
  def clipPolygons(polys: DataFrame, xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    polys.select(col("pid"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .flatMap { case (pid, xs, ys) =>
        val (cx, cy) = clipRing(xs.toIndexedSeq, ys.toIndexedSeq, xmin, ymin, xmax, ymax)
        if (cx.isEmpty) None
        else Some((pid, cx.length, ringArea(cx, cy)))
      }
      .toDF("pid", "n", "area")
  }
}
