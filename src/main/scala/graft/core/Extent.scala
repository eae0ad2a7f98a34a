package graft.core

/** Rectangular bounding box in world coordinates.
  *
  * Mirrors the extent concept of the reference
  * (geopyspark/geotrellis/__init__.py `Extent` namedtuple) — min/max
  * corners in CRS units.
  */
final case class Extent(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  require(xmin <= xmax && ymin <= ymax, s"degenerate extent: $this")

  def width: Double  = xmax - xmin
  def height: Double = ymax - ymin

  def contains(x: Double, y: Double): Boolean =
    x >= xmin && x < xmax && y >= ymin && y < ymax

  def intersects(o: Extent): Boolean =
    xmin < o.xmax && o.xmin < xmax && ymin < o.ymax && o.ymin < ymax

  def combine(o: Extent): Extent =
    Extent(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
           math.max(xmax, o.xmax), math.max(ymax, o.ymax))
}
