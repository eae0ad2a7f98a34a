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

  /** Clip one ring to an arbitrary CONVEX clip ring — general
    * Sutherland-Hodgman (one half-plane pass per clip edge, clip ring
    * normalized CCW first). For a convex clip this IS polygon
    * INTERSECTION (the JTS `intersection` convex case); concave
    * clips would need the degenerate multi-part handling S-H lacks. */
  private[graft] def clipRingConvex(
      xs: IndexedSeq[Double], ys: IndexedSeq[Double],
      cxs0: IndexedSeq[Double], cys0: IndexedSeq[Double])
      : (IndexedSeq[Double], IndexedSeq[Double]) = {
    // normalize the clip ring to CCW so "inside" is the left side
    var s2 = 0.0
    var i = 0
    while (i < cxs0.length) {
      val j = (i + 1) % cxs0.length
      s2 += cxs0(i) * cys0(j) - cxs0(j) * cys0(i)
      i += 1
    }
    val (cxs, cys) = if (s2 >= 0) (cxs0, cys0) else (cxs0.reverse, cys0.reverse)
    type Pt = (Double, Double)
    def pass(pts: IndexedSeq[Pt], ax: Double, ay: Double,
             bx: Double, by: Double): IndexedSeq[Pt] = {
      if (pts.isEmpty) return pts
      def side(p: Pt): Double = (bx - ax) * (p._2 - ay) - (by - ay) * (p._1 - ax)
      val out = scala.collection.mutable.ArrayBuffer.empty[Pt]
      var prev = pts.last
      var fp = side(prev)
      pts.foreach { cur =>
        val fc = side(cur)
        // the half-plane zero-crossing: f is affine along the segment,
        // so t = fp / (fp - fc)
        def cross(): Pt = {
          val t = fp / (fp - fc)
          (prev._1 + t * (cur._1 - prev._1), prev._2 + t * (cur._2 - prev._2))
        }
        if (fc >= 0) {
          if (fp < 0) out += cross()
          out += cur
        } else if (fp >= 0) out += cross()
        prev = cur; fp = fc
      }
      out.toIndexedSeq
    }
    var pts: IndexedSeq[Pt] = xs.zip(ys)
    var k = 0
    while (k < cxs.length && pts.nonEmpty) {
      val j = (k + 1) % cxs.length
      pts = pass(pts, cxs(k), cys(k), cxs(j), cys(j))
      k += 1
    }
    (pts.map(_._1), pts.map(_._2))
  }

  /** Polygon INTERSECTION with a convex clip polygon: per feature
    * (pid, n vertices, area), empties dropped — the same per-row
    * no-shuffle scale shape as [[clipPolygons]]. */
  def intersectConvex(polys: DataFrame, clip: Polygon): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    val cxs = clip.exterior.map(_.x); val cys = clip.exterior.map(_.y)
    polys.select(col("pid"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .flatMap { case (pid, xs, ys) =>
        val (ix, iy) = clipRingConvex(xs.toIndexedSeq, ys.toIndexedSeq, cxs, cys)
        if (ix.isEmpty) None else Some((pid, ix.length, ringArea(ix, iy)))
      }
      .toDF("pid", "n", "area")
  }

  /** Polygon UNION area with a convex polygon by inclusion-exclusion
    * (area(A) + area(B) - area(A ∩ B)); exact for convex subjects
    * (where S-H intersection is exact). Emits every pid (disjoint
    * pairs included — their union is just the sum). */
  def unionAreaConvex(polys: DataFrame, other: Polygon): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    val cxs = other.exterior.map(_.x); val cys = other.exterior.map(_.y)
    val areaB = ringArea(cxs, cys)
    polys.select(col("pid"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .map { case (pid, xs, ys) =>
        val (ix, iy) = clipRingConvex(xs.toIndexedSeq, ys.toIndexedSeq, cxs, cys)
        val inter = if (ix.isEmpty) 0.0 else ringArea(ix, iy)
        (pid, ringArea(xs.toIndexedSeq, ys.toIndexedSeq) + areaB - inter)
      }
      .toDF("pid", "area_union")
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

  /** Liang–Barsky (1984) clip of ONE segment to the window: the
    * surviving parameter span [t0, t1] of a + t(b−a), or None when
    * the segment misses (zero-length touches excluded). Public
    * algorithm, exact rational rejection tests restated as the usual
    * p/q updates. */
  private[graft] def clipSegment(ax: Double, ay: Double, bx: Double, by: Double,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Option[(Double, Double)] = {
    val dx = bx - ax; val dy = by - ay
    var t0 = 0.0; var t1 = 1.0
    val ps = Array(-dx, dx, -dy, dy)
    val qs = Array(ax - xmin, xmax - ax, ay - ymin, ymax - ay)
    var i = 0
    while (i < 4) {
      val p = ps(i); val q = qs(i)
      if (p == 0) { if (q < 0) return None }
      else {
        val t = q / p
        if (p < 0) { if (t > t1) return None; if (t > t0) t0 = t }
        else { if (t < t0) return None; if (t < t1) t1 = t }
      }
      i += 1
    }
    if (t1 > t0) Some((t0, t1)) else None
  }

  /** Clip POLYLINES (pid, xs, ys — open paths) to an axis-aligned
    * window: per feature the count of surviving sub-segments and
    * their total length (Liang–Barsky per segment, folded in path
    * order — deterministic floats for the literal-restating oracle).
    * Features entirely outside emit nothing. The roads-to-study-area
    * clip; the polygon sibling is [[clipPolygons]]. Per-row
    * transform, no shuffle. */
  def clipLines(lines: DataFrame, xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("pid"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .flatMap { case (pid, xs, ys) =>
        var n = 0
        var len = 0.0
        var i = 0
        while (i < xs.length - 1) {
          clipSegment(xs(i), ys(i), xs(i + 1), ys(i + 1),
              xmin, ymin, xmax, ymax).foreach { case (t0, t1) =>
            n += 1
            len += (t1 - t0) * math.hypot(xs(i + 1) - xs(i), ys(i + 1) - ys(i))
          }
          i += 1
        }
        if (n == 0) None else Some((pid, n, len))
      }
      .toDF("pid", "n_segs", "length")
  }
}
