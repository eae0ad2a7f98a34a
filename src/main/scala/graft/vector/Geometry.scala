package graft.vector

/** Minimal pure-Scala computational geometry for rasterize / mask /
  * polygonal summaries — the WHAT of the reference's shapely/JTS usage
  * (geopyspark/geotrellis/rasterize.py, layer.py mask:2044,
  * polygonal_*:2392-2464) without a geometry dependency.
  *
  * Only what raster ops need: point-in-polygon (ray casting, public
  * algorithm), bounding boxes, point/segment distance.
  */
final case class Pt(x: Double, y: Double)

final case class Polygon(exterior: IndexedSeq[Pt], holes: Seq[IndexedSeq[Pt]] = Nil) {
  def bbox: (Double, Double, Double, Double) = {
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = Double.MinValue; var ymax = Double.MinValue
    exterior.foreach { p =>
      if (p.x < xmin) xmin = p.x; if (p.x > xmax) xmax = p.x
      if (p.y < ymin) ymin = p.y; if (p.y > ymax) ymax = p.y
    }
    (xmin, ymin, xmax, ymax)
  }

  private def ringContains(ring: IndexedSeq[Pt], px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val pi = ring(i); val pj = ring(j)
      if ((pi.y > py) != (pj.y > py) &&
          px < (pj.x - pi.x) * (py - pi.y) / (pj.y - pi.y) + pi.x)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  def contains(px: Double, py: Double): Boolean =
    ringContains(exterior, px, py) && !holes.exists(h => ringContains(h, px, py))
}

object Geometry {
  /** Distance from point to segment ab. */
  def pointSegDist(px: Double, py: Double, ax: Double, ay: Double,
                   bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    val cx = ax + t * dx; val cy = ay + t * dy
    math.hypot(px - cx, py - cy)
  }

  /** Axis-aligned rectangle polygon. */
  def rect(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Polygon =
    Polygon(IndexedSeq(Pt(xmin, ymin), Pt(xmax, ymin), Pt(xmax, ymax), Pt(xmin, ymax)))

  /** Diamond (rotated square) centered at (cx, cy) with L1 radius r —
    * the shared oracle polygon (SURVEY §3): cell centers sit at
    * half-odd coordinates so an L1 radius with fractional part never
    * ties with the boundary. */
  def diamond(cx: Double, cy: Double, r: Double): Polygon =
    Polygon(IndexedSeq(Pt(cx, cy - r), Pt(cx + r, cy), Pt(cx, cy + r), Pt(cx - r, cy)))
}
