package graft.vector

/** Polygon offsetting (the shapely/JTS `buffer` every mask-building
  * workflow reaches for before `mask` — reference layer.py:2044 users
  * buffer in shapely first).
  *
  * Flat-cap / miter-join offset for SIMPLE CONVEX rings: each edge
  * translates distance |d| along its outward normal and adjacent
  * offset lines intersect (JTS join_style=mitre with no limit). For a
  * convex ring this IS the Minkowski sum with the d-ball under the
  * polygon's own edge metric — exact vertices, no arc approximation —
  * and erosion (d < 0) is the same construction inward.
  *
  * Concave rings (r16): a concave ring's miter offset can
  * self-intersect, so [[buffer]] still REJECTS concave rings loudly —
  * use [[bufferPieces]], which implements the documented
  * convex-decomposition strategy: the positive buffer of ANY simple
  * ring is exactly
  *
  *   P  ∪  (edge ⊕ outward d-rectangle for every edge)
  *      ∪  (joint fan at every CONVEX vertex)
  *
  * returned as a Seq of CONVEX polygons with UNION semantics — the
  * shape every consumer here already takes (mask / rasterize accept
  * Seq[Polygon] with union semantics; reference users buffer in
  * shapely then mask, layer.py:2044). Reflex vertices need no joint
  * piece: their neighborhoods are covered by the two overlapping edge
  * rectangles. Joint styles match JTS: Round(quadrantSegments)
  * arc-samples the vertex disk sector exactly like JTS's
  * quadrant_segments=8 default (JTS buffers are themselves polygonal
  * approximations — this is the reference semantic, not a shortcut);
  * Miter produces the exact offset-line intersection kite.
  *
  * Negative d on concave rings (erosion, r17) has no union-of-pieces
  * form, but it HAS a containment-test form: erode(P, d) =
  * P \ dilate(∂P, d), so [[erodePieces]] returns the (interior,
  * boundary-corridor) piece pair and a point is eroded-in iff inside
  * some interior piece and NOT inside any corridor piece — the form
  * the mask path consumes directly (ZonalOps.erodeMaskGrid closes the
  * JTS `buffer(-d)` parity gap).
  */
object Buffer {

  /** Joint style for [[bufferPieces]] — mirrors JTS join_style.
    * Miter joins apply [[MiterLimit]] (the JTS mitre_limit, default
    * 5): a corner whose miter point would sit further than
    * MiterLimit·d from the vertex — a near-collinear turn, where the
    * offset-line intersection runs away — falls back to a BEVEL
    * (the triangle v, p1, p2), exactly the JTS limiting behavior. */
  sealed trait Join
  case object Miter extends Join

  /** JTS BufferParameters.DEFAULT_MITRE_LIMIT. */
  val MiterLimit = 5.0
  /** Round joins sampled at `quadrantSegments` segments per 90° of
    * turn — the JTS `quad_segs` convention (JTS default 8). */
  final case class Round(quadrantSegments: Int = 8) extends Join

  /** Positive buffer of an arbitrary SIMPLE hole-free ring as convex
    * pieces whose union IS the buffered region (see the object doc).
    * Pieces: interior ear-clip triangles + per-edge offset rectangles
    * + per-convex-vertex joint fans. Deterministic construction (the
    * literal-restating oracle discipline). */
  def bufferPieces(poly: Polygon, d: Double, join: Join = Round(8)): Seq[Polygon] = {
    require(d > 0, "bufferPieces is the positive-offset construction; " +
      "erode concave rings via the raster distance path (see scaladoc)")
    require(poly.holes.isEmpty,
      "buffer supports simple rings; buffer holes separately (shrink by -d)")
    val ring0 = dropCollinear(poly.exterior)
    require(ring0.length >= 3, "degenerate ring")
    // normalize CCW (y-up): interior left of travel, outward = right
    val ccw =
      if (Overlay.signedArea2(ring0) >= 0) ring0 else ring0.reverse
    val n = ccw.length
    val tris = Overlay.triangulate(ccw).map { case (a, b, c) =>
      Polygon(IndexedSeq(a, b, c))
    }
    // outward (right-hand) unit normal of each edge i: ccw(i) -> ccw(i+1)
    val nx = new Array[Double](n); val ny = new Array[Double](n)
    var i = 0
    while (i < n) {
      val a = ccw(i); val b = ccw((i + 1) % n)
      val ex = b.x - a.x; val ey = b.y - a.y
      val len = math.hypot(ex, ey)
      nx(i) = ey / len; ny(i) = -ex / len
      i += 1
    }
    val rects = (0 until n).map { i =>
      val a = ccw(i); val b = ccw((i + 1) % n)
      Polygon(IndexedSeq(a, b,
        Pt(b.x + nx(i) * d, b.y + ny(i) * d),
        Pt(a.x + nx(i) * d, a.y + ny(i) * d)))
    }
    val joints = (0 until n).flatMap { i =>
      // vertex i joins incoming edge i-1 and outgoing edge i
      val h = (i + n - 1) % n
      val v = ccw(i)
      val prev = ccw(h); val next = ccw((i + 1) % n)
      val turn = (v.x - prev.x) * (next.y - v.y) - (v.y - prev.y) * (next.x - v.x)
      if (turn <= 0) Nil // reflex/straight: covered by the edge rectangles
      else join match {
        case Miter =>
          // kite: v, offset end of edge h, offset-line intersection, offset start of edge i
          val p1 = Pt(v.x + nx(h) * d, v.y + ny(h) * d)
          val p2 = Pt(v.x + nx(i) * d, v.y + ny(i) * d)
          // both offset lines pass through p1/p2 with edge directions;
          // near-collinear turns pass `turn > 0` with det ~ 0 and the
          // intersection runs away — apply the JTS mitre limit and
          // bevel when the miter point exceeds MiterLimit·d from v
          val (dx1, dy1) = (v.x - prev.x, v.y - prev.y)
          val (dx2, dy2) = (next.x - v.x, next.y - v.y)
          val det = dx1 * dy2 - dy1 * dx2
          val m =
            if (det == 0) None
            else {
              val t = ((p2.x - p1.x) * dy2 - (p2.y - p1.y) * dx2) / det
              val c = Pt(p1.x + t * dx1, p1.y + t * dy1)
              if (math.hypot(c.x - v.x, c.y - v.y) <= MiterLimit * d) Some(c)
              else None
            }
          m match {
            case Some(c) => Seq(Polygon(IndexedSeq(v, p1, c, p2)))
            case None    => Seq(Polygon(IndexedSeq(v, p1, p2))) // bevel
          }
        case Round(q) =>
          require(q >= 1, "quadrantSegments >= 1")
          // fan from normal h to normal i, sweeping CCW by the exterior
          // angle (< pi for a strict convex turn)
          val a1 = math.atan2(ny(h), nx(h))
          var sweep = math.atan2(ny(i), nx(i)) - a1
          if (sweep < 0) sweep += 2 * math.Pi
          val steps = math.max(1, math.ceil(sweep / (math.Pi / 2 / q)).toInt)
          (0 until steps).map { k =>
            val b1 = a1 + sweep * k / steps
            val b2 = a1 + sweep * (k + 1) / steps
            Polygon(IndexedSeq(v,
              Pt(v.x + math.cos(b1) * d, v.y + math.sin(b1) * d),
              Pt(v.x + math.cos(b2) * d, v.y + math.sin(b2) * d)))
          }
      }
    }
    tris ++ rects ++ joints
  }

  /** End-cap style for [[bufferLinePieces]] — mirrors JTS cap_style
    * (round / flat). */
  sealed trait Cap
  case object FlatCap extends Cap
  /** Semicircle end caps sampled at `quadrantSegments` per 90° — the
    * JTS CAP_ROUND convention. */
  final case class RoundCap(quadrantSegments: Int = 8) extends Cap

  /** Positive buffer of an OPEN polyline (the road/river/track case —
    * JTS `buffer` on a LineString) as convex pieces with UNION
    * semantics, the [[bufferPieces]] output contract:
    *
    *  - per segment, the full-width rectangle a±n·d → b±n·d (n the
    *    unit normal) — the segment's Minkowski d-slab;
    *  - per interior vertex, a joint fan on the OUTER side of the turn
    *    (the inner side is already covered by the two overlapping
    *    segment slabs);
    *  - per endpoint, a cap: Round = semicircle fan (π sweep), Flat =
    *    nothing beyond the slab edge.
    *
    * Deterministic construction (the literal-restating oracle
    * discipline); consumers take Seq[Polygon] with union semantics
    * exactly like the ring buffer (mask / rasterize / unionAll). */
  def bufferLinePieces(line: IndexedSeq[Pt], d: Double,
                       join: Join = Round(8), cap: Cap = RoundCap(8)): Seq[Polygon] = {
    require(d > 0, "line buffer requires a positive offset")
    val pts = line.foldLeft(Vector.empty[Pt]) { (acc, p) =>
      if (acc.nonEmpty && acc.last == p) acc else acc :+ p
    }
    require(pts.length >= 2, "polyline needs at least 2 distinct vertices")
    val n = pts.length
    val m = n - 1 // segments
    val nx = new Array[Double](m); val ny = new Array[Double](m)
    var i = 0
    while (i < m) {
      val a = pts(i); val b = pts(i + 1)
      val ex = b.x - a.x; val ey = b.y - a.y
      val len = math.hypot(ex, ey)
      nx(i) = ey / len; ny(i) = -ex / len
      i += 1
    }
    val slabs = (0 until m).map { i =>
      val a = pts(i); val b = pts(i + 1)
      Polygon(IndexedSeq(
        Pt(a.x + nx(i) * d, a.y + ny(i) * d), Pt(b.x + nx(i) * d, b.y + ny(i) * d),
        Pt(b.x - nx(i) * d, b.y - ny(i) * d), Pt(a.x - nx(i) * d, a.y - ny(i) * d)))
    }
    val joints = (1 until m).flatMap { i =>
      // vertex i joins segments i-1 and i; outer side of a left (CCW)
      // turn is the right-normal side, of a right turn the -normal side
      val h = i - 1
      val v = pts(i)
      val turn = (v.x - pts(i - 1).x) * (pts(i + 1).y - v.y) -
        (v.y - pts(i - 1).y) * (pts(i + 1).x - v.x)
      val dot = (v.x - pts(i - 1).x) * (pts(i + 1).x - v.x) +
        (v.y - pts(i - 1).y) * (pts(i + 1).y - v.y)
      if (turn == 0 && dot > 0) Nil // forward-collinear: slabs tile the corridor
      else if (turn == 0) {
        // 180° REVERSAL: both slabs lie on the same line and the
        // half-disk ahead of v is uncovered (JTS round-join covers the
        // full vertex disk). Sweep π CCW from +n through the forward
        // direction to −n — the end-cap construction at an interior
        // vertex. Miter joins get the square mitre-limited end: the
        // d-deep rectangle ahead of the slab edge.
        join match {
          case Round(q) => fanPieces(v, math.atan2(ny(h), nx(h)), math.Pi, q, d)
          case Miter =>
            val len = math.hypot(v.x - pts(i - 1).x, v.y - pts(i - 1).y)
            val ex = (v.x - pts(i - 1).x) / len * d
            val ey = (v.y - pts(i - 1).y) / len * d
            Seq(Polygon(IndexedSeq(
              Pt(v.x + nx(h) * d, v.y + ny(h) * d),
              Pt(v.x + nx(h) * d + ex, v.y + ny(h) * d + ey),
              Pt(v.x - nx(h) * d + ex, v.y - ny(h) * d + ey),
              Pt(v.x - nx(h) * d, v.y - ny(h) * d))))
        }
      } else gapJointPieces(v, pts(i - 1), pts(i + 1),
        nx(h), ny(h), nx(i), ny(i), turn, d, join)
    }
    val caps = cap match {
      case FlatCap => Nil
      case RoundCap(q) =>
        // n is the right normal (e rotated CW): CW from +n passes −e
        // (the back), CCW from +n passes +e (the front). Start cap
        // sweeps CW through the back; end cap CCW through the front.
        fanPieces(pts(0), math.atan2(ny(0), nx(0)), -math.Pi, q, d) ++
          fanPieces(pts(n - 1), math.atan2(ny(m - 1), nx(m - 1)), math.Pi, q, d)
    }
    slabs ++ joints ++ caps
  }

  /** Fan from angle a1 to a1+sweep (sweep > 0 CCW, < 0 CW) around v at
    * radius d — the arc-sector sampling every Round joint uses. */
  private def fanPieces(v: Pt, a1: Double, sweep: Double, q: Int, d: Double): Seq[Polygon] = {
    val steps = math.max(1, math.ceil(math.abs(sweep) / (math.Pi / 2 / q)).toInt)
    (0 until steps).map { k =>
      val b1 = a1 + sweep * k / steps
      val b2 = a1 + sweep * (k + 1) / steps
      Polygon(IndexedSeq(v,
        Pt(v.x + math.cos(b1) * d, v.y + math.sin(b1) * d),
        Pt(v.x + math.cos(b2) * d, v.y + math.sin(b2) * d)))
    }
  }

  /** Joint pieces at a TURN vertex (turn ≠ 0) covering the gap sector
    * on the outer side of the turn — the inner side is covered by the
    * two overlapping slabs. Shared by [[bufferLinePieces]] and
    * [[ringCorridorPieces]]. (nxh, nyh)/(nxi, nyi) are the right
    * normals of the incoming/outgoing segments. */
  private def gapJointPieces(v: Pt, prev: Pt, next: Pt,
                             nxh: Double, nyh: Double, nxi: Double, nyi: Double,
                             turn: Double, d: Double, join: Join): Seq[Polygon] = {
    val sgn = if (turn > 0) 1.0 else -1.0 // left turn: gap on +n side
    val a1 = math.atan2(sgn * nyh, sgn * nxh)
    var sweep = math.atan2(sgn * nyi, sgn * nxi) - a1
    // take the short way round (the gap sector is < pi)
    if (sweep > math.Pi) sweep -= 2 * math.Pi
    if (sweep < -math.Pi) sweep += 2 * math.Pi
    join match {
      case Miter =>
        val p1 = Pt(v.x + sgn * nxh * d, v.y + sgn * nyh * d)
        val p2 = Pt(v.x + sgn * nxi * d, v.y + sgn * nyi * d)
        val (dx1, dy1) = (v.x - prev.x, v.y - prev.y)
        val (dx2, dy2) = (next.x - v.x, next.y - v.y)
        val det = dx1 * dy2 - dy1 * dx2
        // near-parallel directions run the intersection away:
        // apply the JTS mitre limit, bevel past it (object doc)
        val c =
          if (det == 0) None
          else {
            val t = ((p2.x - p1.x) * dy2 - (p2.y - p1.y) * dx2) / det
            val mp = Pt(p1.x + t * dx1, p1.y + t * dy1)
            if (math.hypot(mp.x - v.x, mp.y - v.y) <= MiterLimit * d) Some(mp)
            else None
          }
        c match {
          case Some(mp) => Seq(Polygon(IndexedSeq(v, p1, mp, p2)))
          case None     => Seq(Polygon(IndexedSeq(v, p1, p2))) // bevel
        }
      case Round(q) => fanPieces(v, a1, sweep, q, d)
    }
  }

  /** Boundary corridor of a CLOSED simple hole-free ring: convex
    * pieces whose union covers every point within distance d of ∂P
    * (up to the inscribed-arc sampling of Round joints) — per-edge
    * BOTH-side d-slabs + a joint fan at every vertex on the gap
    * (outer-turn) side. The cyclic twin of [[bufferLinePieces]]: no
    * end caps, and for a CCW ring the gap side falls outside the ring
    * at convex vertices and inside it at reflex ones. */
  def ringCorridorPieces(poly: Polygon, d: Double, join: Join = Round(8)): Seq[Polygon] = {
    require(d > 0, "corridor requires a positive distance")
    require(poly.holes.isEmpty, "corridor supports simple rings")
    val ring0 = dropCollinear(poly.exterior)
    require(ring0.length >= 3, "degenerate ring")
    val ccw = if (Overlay.signedArea2(ring0) >= 0) ring0 else ring0.reverse
    val n = ccw.length
    val nx = new Array[Double](n); val ny = new Array[Double](n)
    var i = 0
    while (i < n) {
      val a = ccw(i); val b = ccw((i + 1) % n)
      val ex = b.x - a.x; val ey = b.y - a.y
      val len = math.hypot(ex, ey)
      nx(i) = ey / len; ny(i) = -ex / len
      i += 1
    }
    val slabs = (0 until n).map { i =>
      val a = ccw(i); val b = ccw((i + 1) % n)
      Polygon(IndexedSeq(
        Pt(a.x + nx(i) * d, a.y + ny(i) * d), Pt(b.x + nx(i) * d, b.y + ny(i) * d),
        Pt(b.x - nx(i) * d, b.y - ny(i) * d), Pt(a.x - nx(i) * d, a.y - ny(i) * d)))
    }
    val joints = (0 until n).flatMap { i =>
      val h = (i + n - 1) % n
      val v = ccw(i); val prev = ccw(h); val next = ccw((i + 1) % n)
      val turn = (v.x - prev.x) * (next.y - v.y) - (v.y - prev.y) * (next.x - v.x)
      // dropCollinear leaves no zero turns on a simple ring
      if (turn == 0) Nil
      else gapJointPieces(v, prev, next, nx(h), ny(h), nx(i), ny(i), turn, d, join)
    }
    slabs ++ joints
  }

  /** Erosion (negative buffer) of an arbitrary SIMPLE hole-free ring
    * as a containment-test pair (interior pieces, corridor pieces):
    *
    *   x ∈ erode(P, d)  ⟺  x ∈ some interior piece
    *                        AND x ∉ every corridor piece
    *
    * since erode(P, d) = P \ dilate(∂P, d). This closes the JTS
    * `buffer(-d)` parity gap on concave rings (the object doc's
    * documented raster path — ZonalOps.erodeMaskGrid consumes the
    * pair in one codegen'd mask pass). Round joints make the corridor
    * an inscribed approximation of the true d-band, so the erosion is
    * a hair larger near REFLEX corners — the same polygonal-arc
    * semantics as every JTS buffer. Deterministic construction (the
    * literal-restating oracle discipline). */
  def erodePieces(poly: Polygon, d: Double, join: Join = Round(8))
      : (Seq[Polygon], Seq[Polygon]) = {
    require(d > 0, "erodePieces takes the erosion distance as positive d")
    require(poly.holes.isEmpty, "erode holes separately (dilate them by d)")
    val ring0 = dropCollinear(poly.exterior)
    require(ring0.length >= 3, "degenerate ring")
    val ccw = if (Overlay.signedArea2(ring0) >= 0) ring0 else ring0.reverse
    val tris = Overlay.triangulate(ccw).map { case (a, b, c) =>
      Polygon(IndexedSeq(a, b, c))
    }
    (tris, ringCorridorPieces(Polygon(ccw), d, join))
  }

  /** Miter-join offset of a convex, hole-free ring by `d` (> 0 grows,
    * < 0 shrinks; shrinking past the inradius throws). Collinear and
    * duplicate vertices are dropped first; input orientation (CW or
    * CCW) is preserved in the output. */
  def buffer(poly: Polygon, d: Double): Polygon = {
    require(poly.holes.isEmpty,
      "buffer supports simple rings; buffer holes separately (shrink by -d)")
    val ring = dropCollinear(poly.exterior)
    require(ring.length >= 3, "degenerate ring")
    val n = ring.length
    // orientation from the shoelace sum: > 0 = CCW in y-up coords
    var area2 = 0.0
    var i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      area2 += a.x * b.y - b.x * a.y
      i += 1
    }
    val sgn = if (area2 > 0) 1.0 else -1.0
    // convexity: every turn has the orientation's sign (collinear gone)
    i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n); val c = ring((i + 2) % n)
      val cross = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
      require(cross * sgn > 0,
        s"buffer requires a convex ring (concave turn at ${b}); " +
          "convex-decompose and buffer the pieces (see scaladoc)")
      i += 1
    }
    // offset each edge along its outward normal, intersect neighbors
    def edge(i: Int): (Pt, Pt) = (ring(i), ring((i + 1) % n))
    def offsetLine(i: Int): (Double, Double, Double, Double) = {
      val (a, b) = edge(i)
      val ex = b.x - a.x; val ey = b.y - a.y
      val len = math.hypot(ex, ey)
      // CCW (y-up) outward normal of (ex, ey) is (ey, -ex)/len; CW flips
      val nx = sgn * ey / len; val ny = -sgn * ex / len
      (a.x + nx * d, a.y + ny * d, ex, ey)
    }
    val out = (0 until n).map { i =>
      // vertex i joins edge i-1 and edge i
      val (x1, y1, dx1, dy1) = offsetLine((i + n - 1) % n)
      val (x2, y2, dx2, dy2) = offsetLine(i)
      val det = dx1 * dy2 - dy1 * dx2
      if (math.abs(det) < 1e-12 * (math.abs(dx1) + math.abs(dy1)) *
            (math.abs(dx2) + math.abs(dy2)))
        Pt(x2, y2) // parallel neighbors (shouldn't survive dropCollinear)
      else {
        val t = ((x2 - x1) * dy2 - (y2 - y1) * dx2) / det
        Pt(x1 + t * dx1, y1 + t * dy1)
      }
    }
    // erosion past the inradius flips edges over their neighbors (the
    // result can even look like a smaller VALID ring — a plain
    // area-sign test misses it): every output edge must preserve its
    // input edge's direction
    i = 0
    while (i < n) {
      val (a, b) = edge(i)
      val oa = out(i); val ob = out((i + 1) % n)
      require((ob.x - oa.x) * (b.x - a.x) + (ob.y - oa.y) * (b.y - a.y) > 0,
        s"erosion by ${-d} collapses the ring (inradius exceeded)")
      i += 1
    }
    Polygon(out)
  }

  private def dropCollinear(ring: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    val dedup = ring.foldLeft(Vector.empty[Pt]) { (acc, p) =>
      if (acc.nonEmpty && acc.last == p) acc else acc :+ p
    }
    val base = if (dedup.length > 1 && dedup.head == dedup.last) dedup.dropRight(1) else dedup
    val n = base.length
    if (n < 3) return base
    (0 until n).collect {
      case i if {
        val a = base((i + n - 1) % n); val b = base(i); val c = base((i + 1) % n)
        math.abs((b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)) > 1e-12
      } => base(i)
    }
  }
}
