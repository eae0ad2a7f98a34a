package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General polygon overlay — intersection and union of arbitrary
  * SIMPLE polygons (concave allowed, holes allowed) — the full
  * JTS/shapely `intersection`/`union` role the reference reaches
  * through shapely (geopyspark layer.py:2044 mask accepts any shapely
  * geometry; users intersect concave watershed/admin polygons before
  * masking constantly). [[Clip]] covers the convex-clip fast path;
  * this module removes the convex restriction.
  *
  * DESIGN — signed convex decomposition, not a topology graph. A JTS
  * translation (noded edge graph + face labeling) is the wrong shape
  * for a data-parallel engine: it is pointer-chasing, degeneracy-rich
  * and per-feature sequential anyway. Instead:
  *
  *  - every polygon becomes SIGNED CONVEX PIECES: ear-clipping
  *    triangles of the exterior ring (+1) and of each hole ring (−1).
  *    For any point p off piece boundaries, Σ sign·[p ∈ piece] is
  *    exactly 1 inside the polygon and 0 outside (exterior triangles
  *    partition the exterior's interior; hole triangles subtract);
  *  - A ∩ B = pairwise Sutherland-Hodgman clips of A-pieces against
  *    B-pieces (convex × convex — S-H's exact case), each with sign
  *    s_A·s_B. The indicator multiplies: Σ = 1_A · 1_B. Area follows
  *    by the shoelace sum Σ sign·|piece| — NO boolean topology ever
  *    computed;
  *  - A ∪ B pieces = A-pieces + B-pieces − (A ∩ B)-pieces
  *    (inclusion–exclusion on indicators), so union area and
  *    union-region rasterization/masking need nothing new.
  *
  * Robustness: the only predicates are cross-product signs inside ear
  * clipping and S-H half-plane tests — exact for integral-valued
  * coordinates (products of exact doubles below 2^53), and free of
  * the vertex-on-edge degeneracy lattice general clippers
  * (Greiner-Hormann, Weiler-Atherton) must special-case. Slivers from
  * edge-adjacent piece pairs carry ~0 area and are dropped below
  * [[SliverArea]].
  *
  * Scale shape: rings decompose independently — a per-row flatMap
  * over the feature table, no joins, no shuffle, no driver geometry.
  * Piece counts are (n_A−2 + holes)·(n_B−2 + holes) per feature pair,
  * bounded by ring sizes, never by table size.
  */
object Overlay {

  /** One signed convex piece of a decomposition. */
  final case class Piece(sign: Int, xs: IndexedSeq[Double], ys: IndexedSeq[Double])

  /** Pieces with |shoelace area| below this are dropped (degenerate
    * slivers where clipped pieces share edges). */
  val SliverArea = 1e-9

  /** Twice the signed shoelace area (> 0 = CCW in y-up coordinates). */
  private[graft] def signedArea2(ring: IndexedSeq[Pt]): Double = {
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      s += a.x * b.y - b.x * a.y
      i += 1
    }
    s
  }

  /** Drop consecutive duplicates, an explicit closing vertex, and
    * collinear vertices (the [[Buffer]] normalization). */
  private def cleanRing(ring: IndexedSeq[Pt]): IndexedSeq[Pt] = {
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

  /** True iff no two non-adjacent edges of the ring intersect (touch
    * included) — the simplicity precondition ear clipping needs.
    * O(n^2) segment pairs, same class as the clipping itself. */
  private[graft] def isSimple(ring: IndexedSeq[Pt]): Boolean = {
    val n = ring.length
    def orient(a: Pt, b: Pt, c: Pt): Double =
      (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    def onSeg(a: Pt, b: Pt, p: Pt): Boolean =
      math.min(a.x, b.x) <= p.x && p.x <= math.max(a.x, b.x) &&
        math.min(a.y, b.y) <= p.y && p.y <= math.max(a.y, b.y)
    def segsIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
      val o1 = orient(a, b, c); val o2 = orient(a, b, d)
      val o3 = orient(c, d, a); val o4 = orient(c, d, b)
      if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
          ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) return true
      (o1 == 0 && onSeg(a, b, c)) || (o2 == 0 && onSeg(a, b, d)) ||
        (o3 == 0 && onSeg(c, d, a)) || (o4 == 0 && onSeg(c, d, b))
    }
    var i = 0
    var ok = true
    while (i < n && ok) {
      var j = i + 2
      while (j < n && ok) {
        val adjacent = (i == 0 && j == n - 1)
        if (!adjacent &&
            segsIntersect(ring(i), ring((i + 1) % n), ring(j), ring((j + 1) % n)))
          ok = false
        j += 1
      }
      i += 1
    }
    ok
  }

  /** Ear-clipping triangulation of a simple ring (concave allowed),
    * deterministic (lowest-index ear first). Returns at most n−2 CCW
    * triangles that PARTITION the ring's interior (collinear triples
    * arising mid-clip are removed as zero-area ears, so the count can
    * be lower; the area is always exact). Rejects non-simple rings
    * loudly. O(n^2) scans per ear — fine for feature rings (the
    * per-row parallelism carries table scale). */
  def triangulate(ring0: IndexedSeq[Pt]): IndexedSeq[(Pt, Pt, Pt)] = {
    val base = cleanRing(ring0)
    require(base.length >= 3, s"degenerate ring (${ring0.length} raw vertices)")
    require(isSimple(base),
      "triangulate requires a simple ring (non-adjacent edges intersect)")
    val ccw = if (signedArea2(base) >= 0) base else base.reverse
    val idx = scala.collection.mutable.ArrayBuffer.range(0, ccw.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Pt, Pt, Pt)]
    def cross(a: Pt, b: Pt, c: Pt): Double =
      (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
    def inTriangleInclusive(p: Pt, a: Pt, b: Pt, c: Pt): Boolean =
      cross(a, b, p) >= 0 && cross(b, c, p) >= 0 && cross(c, a, p) >= 0
    while (idx.length > 3) {
      val m = idx.length
      var cut = -1
      var i = 0
      while (i < m && cut < 0) {
        val a = ccw(idx((i + m - 1) % m)); val b = ccw(idx(i)); val c = ccw(idx((i + 1) % m))
        val turn = cross(a, b, c)
        if (turn == 0) {
          // degenerate ear (collinear after earlier cuts): remove, no area
          cut = i
        } else if (turn > 0) {
          // strictly convex corner: an ear unless another remaining
          // vertex sits inside (or on) the candidate triangle
          var blocked = false
          var j = 0
          while (j < m && !blocked) {
            val jj = (i + m - 1) % m != j && i != j && (i + 1) % m != j
            if (jj) {
              val p = ccw(idx(j))
              // vertices coincident with a corner (touching rings) don't block
              if (p != a && p != b && p != c && inTriangleInclusive(p, a, b, c))
                blocked = true
            }
            j += 1
          }
          if (!blocked) {
            out += ((a, b, c))
            cut = i
          }
        }
        i += 1
      }
      require(cut >= 0,
        "ear clipping found no ear — the ring is not simple (self-intersecting?)")
      idx.remove(cut)
    }
    val a = ccw(idx(0)); val b = ccw(idx(1)); val c = ccw(idx(2))
    if (cross(a, b, c) != 0) out += ((a, b, c))
    out.toIndexedSeq
  }

  /** Signed convex pieces of a polygon: exterior triangles (+1), hole
    * triangles (−1). */
  def pieces(poly: Polygon): IndexedSeq[Piece] = {
    def tris(ring: IndexedSeq[Pt], sign: Int): IndexedSeq[Piece] =
      triangulate(ring).map { case (a, b, c) =>
        Piece(sign, IndexedSeq(a.x, b.x, c.x), IndexedSeq(a.y, b.y, c.y))
      }
    tris(poly.exterior, 1) ++ poly.holes.flatMap(h => tris(h.toIndexedSeq, -1))
  }

  /** Pieces of A ∩ B: pairwise convex S-H clips with multiplied signs,
    * slivers dropped. Deterministic order (A-major). */
  def intersectionPieces(a: Polygon, b: Polygon): IndexedSeq[Piece] = {
    val pa = pieces(a); val pb = pieces(b)
    for {
      x <- pa
      y <- pb
      (ix, iy) = Clip.clipRingConvex(x.xs, x.ys, y.xs, y.ys)
      if ix.length >= 3 && Clip.ringArea(ix, iy) > SliverArea
    } yield Piece(x.sign * y.sign, ix, iy)
  }

  /** Polygon area (exterior minus holes). */
  def area(poly: Polygon): Double = {
    val ext = math.abs(signedArea2(poly.exterior)) / 2.0
    val hs = poly.holes.map(h => math.abs(signedArea2(h.toIndexedSeq)) / 2.0).sum
    ext - hs
  }

  /** Exact |A ∩ B| via the signed piece sum (left-associated in piece
    * order — restate identically when pinning oracles). */
  def intersectionArea(a: Polygon, b: Polygon): Double =
    intersectionPieces(a, b).foldLeft(0.0) { (s, p) =>
      s + p.sign * Clip.ringArea(p.xs, p.ys)
    }

  /** |A ∪ B| by inclusion–exclusion. */
  def unionArea(a: Polygon, b: Polygon): Double =
    area(a) + area(b) - intersectionArea(a, b)

  /** Pieces of A ∪ B (A + B − A∩B on indicators) — feeds signed
    * rasterization / masking of union regions. */
  def unionPieces(a: Polygon, b: Polygon): IndexedSeq[Piece] =
    pieces(a) ++ pieces(b) ++
      intersectionPieces(a, b).map(p => p.copy(sign = -p.sign))

  /** Pieces of A ∖ B (A − A∩B on indicators) — the JTS `difference`
    * role on the same algebra. */
  def differencePieces(a: Polygon, b: Polygon): IndexedSeq[Piece] =
    pieces(a) ++ intersectionPieces(a, b).map(p => p.copy(sign = -p.sign))

  /** |A ∖ B| and |A △ B| — closed under the same inclusion-exclusion. */
  def differenceArea(a: Polygon, b: Polygon): Double =
    area(a) - intersectionArea(a, b)
  def symDifferenceArea(a: Polygon, b: Polygon): Double =
    area(a) + area(b) - 2.0 * intersectionArea(a, b)

  /** Signed containment: Σ sign over pieces whose CLOSED hull contains
    * the point — 1 inside the represented region, 0 outside, for
    * points OFF piece boundaries (piece-boundary points can
    * double-count; keep query points off edges — the grid-fixture
    * discipline). */
  def containsSigned(ps: Seq[Piece], px: Double, py: Double): Int =
    ps.iterator.map { p =>
      val n = p.xs.length
      var inside = true
      // pieces are convex; orientation from the shoelace sign
      val ccw = signedArea2(p.xs.zip(p.ys).map { case (x, y) => Pt(x, y) }) >= 0
      var i = 0
      while (i < n && inside) {
        val j = (i + 1) % n
        val s = (p.xs(j) - p.xs(i)) * (py - p.ys(i)) - (p.ys(j) - p.ys(i)) * (px - p.xs(i))
        if (if (ccw) s < 0 else s > 0) inside = false
        i += 1
      }
      if (inside) p.sign else 0
    }.sum

  // ------------------------------------------------------------------
  // Signed piece SETS — the n-ary indicator algebra (dissolve / buffer
  // unions). A piece set S represents the indicator 1_S = Σ sᵢ·1_Pᵢ;
  // for the sets this module constructs (unions/intersections of
  // simple polygons) the sum is exactly 0/1 off piece boundaries.
  // ------------------------------------------------------------------

  private def pieceBbox(p: Piece): (Double, Double, Double, Double) = {
    var x0 = Double.MaxValue; var y0 = Double.MaxValue
    var x1 = Double.MinValue; var y1 = Double.MinValue
    var i = 0
    while (i < p.xs.length) {
      val x = p.xs(i); val y = p.ys(i)
      if (x < x0) x0 = x; if (x > x1) x1 = x
      if (y < y0) y0 = y; if (y > y1) y1 = y
      i += 1
    }
    (x0, y0, x1, y1)
  }

  /** Pieces of 1_A · 1_B for two piece SETS: pairwise convex clips
    * with multiplied signs (A-major order), bbox quick-reject first,
    * slivers dropped — [[intersectionPieces]] generalized from
    * polygons to sets so n-ary folds close over the algebra. */
  def pieceSetIntersection(sa: Seq[Piece], sb: Seq[Piece]): IndexedSeq[Piece] = {
    val boxed = sb.map(p => (pieceBbox(p), p))
    (for {
      x <- sa.iterator
      bx = pieceBbox(x)
      (by, y) <- boxed.iterator
      if bx._1 <= by._3 && by._1 <= bx._3 && bx._2 <= by._4 && by._2 <= bx._4
      (ix, iy) = Clip.clipRingConvex(x.xs, x.ys, y.xs, y.ys)
      if ix.length >= 3 && Clip.ringArea(ix, iy) > SliverArea
    } yield Piece(x.sign * y.sign, ix, iy)).toIndexedSeq
  }

  /** Pieces of A ∪ B over piece SETS: A + B − A·B on indicators. */
  def pieceSetUnion(sa: Seq[Piece], sb: Seq[Piece]): IndexedSeq[Piece] =
    (sa ++ sb ++ pieceSetIntersection(sa, sb).map(p => p.copy(sign = -p.sign))).toIndexedSeq

  /** Signed area of a piece set (left-associated in piece order —
    * restate identically when pinning oracles). */
  def pieceSetArea(ps: Seq[Piece]): Double =
    ps.foldLeft(0.0)((s, p) => s + p.sign * Clip.ringArea(p.xs, p.ys))

  /** Per-group piece-count ceiling for [[unionAll]] / [[dissolve]] —
    * a feature-scale bound (groups are feature counts, not data
    * counts); heavily-overlapping groups past it fail loudly rather
    * than quadratically. */
  val MaxDissolvePieces = 200000

  /** Union piece set of MANY polygons, folded left in input order
    * (deterministic: callers sort first). Intersection pieces of
    * disjoint or edge-adjacent members clip empty / drop as slivers,
    * so the common dissolve case (tiled admin polygons) grows
    * linearly; genuine overlaps pay their inclusion-exclusion price. */
  def unionAll(polys: Seq[Polygon]): IndexedSeq[Piece] =
    polys.foldLeft(IndexedSeq.empty[Piece]) { (acc, p) =>
      val next = if (acc.isEmpty) pieces(p) else pieceSetUnion(acc, pieces(p))
      require(next.length <= MaxDissolvePieces,
        s"dissolve group exceeded $MaxDissolvePieces pieces — " +
          "split the group or pre-simplify members")
      next
    }

  /** Union AREA of many polygons (the n-ary inclusion–exclusion
    * closed over [[unionAll]]'s algebra). */
  def unionAreaAll(polys: Seq[Polygon]): Double = pieceSetArea(unionAll(polys))

  // ------------------------------------------------------------------
  // DataFrame operators (per-row transforms — no shuffle)
  // ------------------------------------------------------------------

  private def toPolygon(xs: Seq[Double], ys: Seq[Double]): Polygon =
    Polygon(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq)

  /** General polygon INTERSECTION of every feature ring (pid, xs, ys)
    * with `other` (concave allowed on both sides): per feature the
    * signed piece count and exact intersection area; empty
    * intersections dropped — the [[Clip.intersectConvex]] output
    * contract with the convex restriction removed. */
  def intersect(polys: DataFrame, other: Polygon): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    polys.select(col("pid"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .flatMap { case (pid, xs, ys) =>
        val ps = intersectionPieces(toPolygon(xs, ys), other)
        if (ps.isEmpty) None
        else {
          val a = ps.foldLeft(0.0)((s, p) => s + p.sign * Clip.ringArea(p.xs, p.ys))
          Some((pid, ps.length, a))
        }
      }
      .toDF("pid", "n_pieces", "area")
  }

  /** Per-feature |A ∖ other| and |A △ other| — the JTS difference /
    * symDifference roles; same per-row no-shuffle shape. */
  def differenceFrom(polys: DataFrame, other: Polygon): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    val areaB = area(other)
    polys.select(col("pid"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .map { case (pid, xs, ys) =>
        val subject = toPolygon(xs, ys)
        val ps = intersectionPieces(subject, other)
        val inter = ps.foldLeft(0.0)((s, p) => s + p.sign * Clip.ringArea(p.xs, p.ys))
        val aA = area(subject)
        (pid, aA - inter, aA + areaB - 2.0 * inter)
      }
      .toDF("pid", "area_diff", "area_symdiff")
  }

  /** DISSOLVE — the classic GIS union-by-attribute (JTS unaryUnion /
    * shapely unary_union grouped by key; ArcGIS Dissolve): all
    * features sharing `key` merge into one region, reported as
    * (key, n_polys, n_pieces, area) with the EXACT union area from
    * the signed-piece algebra — overlaps counted once, concave
    * members welcome.
    *
    * Scale shape: ONE shuffle (groupByKey on the dissolve key); each
    * group folds sequentially in ascending-pid order (deterministic —
    * union area is order-free mathematically, the pinned order makes
    * the float sums reproducible for oracles). Per-group cost is
    * feature-count-scale (admin regions per country, parcels per
    * block), never data-scale; [[MaxDissolvePieces]] bounds the
    * pathological heavily-overlapping group loudly. */
  def dissolve(polys: DataFrame): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    polys.select(col("key").cast("long"), col("pid").cast("long"),
        col("xs"), col("ys"))
      .as[(Long, Long, Seq[Double], Seq[Double])]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val members = it.toIndexedSeq.sortBy(_._2)
        val ps = unionAll(members.map { case (_, _, xs, ys) => toPolygon(xs, ys) })
        (key, members.length, ps.length, pieceSetArea(ps))
      }
      .toDF("key", "n_polys", "n_pieces", "area")
  }

  /** Cyrus–Beck (1978) clip of the segment a + t(b−a), t ∈ [0,1],
    * against ONE convex piece: the surviving [t0, t1] span, or None.
    * Orientation-normalized via the shoelace sign; inside = every
    * edge cross ≥ 0 for CCW. */
  private[graft] def clipSegPiece(ax: Double, ay: Double, bx: Double, by: Double,
      p: Piece): Option[(Double, Double)] = {
    val n = p.xs.length
    val ccw = signedArea2(p.xs.zip(p.ys).map { case (x, y) => Pt(x, y) }) >= 0
    var t0 = 0.0; var t1 = 1.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val ex = p.xs(j) - p.xs(i); val ey = p.ys(j) - p.ys(i)
      // f(t) = cross(edge, p(t) − e1), linear in t; CCW inside: f ≥ 0
      var fa = ex * (ay - p.ys(i)) - ey * (ax - p.xs(i))
      var fb = ex * (by - p.ys(i)) - ey * (bx - p.xs(i))
      if (!ccw) { fa = -fa; fb = -fb }
      val df = fb - fa
      if (df == 0) { if (fa < 0) return None }
      else {
        val t = -fa / df
        if (df < 0) { if (t < t1) t1 = t }   // exiting
        else { if (t > t0) t0 = t }          // entering
        if (t0 >= t1) return None
      }
      i += 1
    }
    if (t1 > t0) Some((t0, t1)) else None
  }

  /** EXACT length of a polyline inside a polygon via the signed
    * algebra: for each segment, ∫1_poly dt = Σ_pieces sign·|clip
    * span| (the indicator is a signed piece sum, so overlapping
    * spans need no interval union). Folded in (segment, piece)
    * order — deterministic floats. */
  def lineLengthIn(line: IndexedSeq[Pt], ps: Seq[Piece]): Double = {
    var len = 0.0
    var i = 0
    while (i < line.length - 1) {
      val a = line(i); val b = line(i + 1)
      val segLen = math.hypot(b.x - a.x, b.y - a.y)
      ps.foreach { p =>
        clipSegPiece(a.x, a.y, b.x, b.y, p).foreach { case (t0, t1) =>
          len += p.sign * (t1 - t0) * segLen
        }
      }
      i += 1
    }
    len
  }

  /** LINE × POLYGON overlay join — "road length per district"
    * (ArcGIS Intersect with line inputs / PostGIS
    * ST_Length(ST_Intersection)): every (lid, gid) pair whose line
    * runs inside the polygon, with the exact inside length. Same
    * grid-bucket + canonical-bucket-dedup plan as [[overlayJoin]];
    * per-pair cost is segments × pieces. Pairs with no inside run
    * emit nothing. */
  def lineOverlayJoin(lines: DataFrame, polys: DataFrame,
                      cellSize: Double = 0.0): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val cell = autoCellSize(polys, cellSize)
    candidatePairs(lines, "lid", polys, "gid", cell)
      .flatMap { case (lid, gid, lxs, lys, pxs, pys) =>
        val line = lxs.zip(lys).map { case (x, y) => Pt(x, y) }.toIndexedSeq
        val len = lineLengthIn(line, pieces(toPolygon(pxs, pys)))
        if (len > 1e-9) Some((lid, gid, len)) else None
      }
      .toDF("lid", "gid", "len_in")
  }

  /** Auto grid-cell size for the bucket plans: the mean bbox side of
    * `side` (so a typical feature explodes to ~1-4 buckets). An EMPTY
    * side has no mean — fall back to 1.0 (the join result is empty
    * regardless, this just keeps the plan from NPEing, ADVICE r16). */
  private def autoCellSize(side: DataFrame, cellSize: Double): Double = {
    if (cellSize > 0) return cellSize
    val spark = side.sparkSession
    import spark.implicits._
    val dims = side.select(col("xs"), col("ys"))
      .as[(Seq[Double], Seq[Double])]
      .map { case (xs, ys) => (xs.max - xs.min, ys.max - ys.min) }
      .toDF("w", "h").agg(avg("w"), avg("h")).head()
    if (dims.isNullAt(0) || dims.isNullAt(1)) 1.0
    else math.max(1e-9, math.max(dims.getDouble(0), dims.getDouble(1)))
  }

  /** THE shared bucket pair plan (overlayJoin / overlayJoinPieces /
    * lineOverlayJoin previously carried three copies — ADVICE r16):
    * both sides explode to the coarse grid buckets their bbox
    * overlaps, candidates meet on a bucket EQUI-join, and each pair
    * is evaluated in exactly ONE bucket — the bucket holding its
    * bbox-overlap's min corner — so no distinct pass and no duplicate
    * geometry work. Emits (aid, bid, a_xs, a_ys, b_xs, b_ys). */
  private def candidatePairs(as: DataFrame, aId: String,
                             bs: DataFrame, bId: String, cell: Double):
      org.apache.spark.sql.Dataset[(Long, Long, Seq[Double], Seq[Double], Seq[Double], Seq[Double])] = {
    val spark = as.sparkSession
    import spark.implicits._
    def buckets(side: DataFrame, id: String) =
      side.select(col(id).cast("long"), col("xs"), col("ys"))
        .as[(Long, Seq[Double], Seq[Double])]
        .flatMap { case (fid, xs, ys) =>
          for {
            bx <- math.floor(xs.min / cell).toLong to math.floor(xs.max / cell).toLong
            by <- math.floor(ys.min / cell).toLong to math.floor(ys.max / cell).toLong
          } yield (bx, by, fid, xs, ys, xs.min, ys.min)
        }
        .toDF("bx", "by", id, s"${id}_xs", s"${id}_ys", s"${id}_x0", s"${id}_y0")
    buckets(as, aId).join(buckets(bs, bId), Seq("bx", "by"))
      .where(col("bx") === floor(greatest(col(s"${aId}_x0"), col(s"${bId}_x0")) / cell).cast("long") &&
             col("by") === floor(greatest(col(s"${aId}_y0"), col(s"${bId}_y0")) / cell).cast("long"))
      .select(col(aId), col(bId),
        col(s"${aId}_xs"), col(s"${aId}_ys"), col(s"${bId}_xs"), col(s"${bId}_ys"))
      .as[(Long, Long, Seq[Double], Seq[Double], Seq[Double], Seq[Double])]
  }

  /** OVERLAY JOIN — the ArcGIS Intersect / QGIS "intersection" tool
    * between two polygon LAYERS: every intersecting (aid, bid) pair
    * with its exact intersection area and piece count, concave
    * allowed on both sides. Pairs that don't intersect emit nothing.
    *
    * Scale shape: both sides explode to the coarse grid buckets their
    * bbox overlaps (cell auto-sized to the mean A-side bbox, the
    * [[SpatialJoin.pointsInPolygonsGrid]] discipline), candidates
    * meet on a bucket EQUI-join, and each candidate pair is evaluated
    * in exactly ONE bucket — the bucket holding its bbox-overlap's
    * min corner — so no distinct pass and no duplicate geometry work.
    * Per-pair cost is bounded by ring sizes, never table sizes; no
    * broadcast, no all-pairs. */
  def overlayJoin(as: DataFrame, bs: DataFrame, cellSize: Double = 0.0): DataFrame = {
    val spark = as.sparkSession
    import spark.implicits._
    // one map over the shared pair stream: pieces → (count, area);
    // pieceSetArea folds the identical Piece order, so the IEEE area
    // value matches the former fused form bit-for-bit
    overlayJoinPieces(as, bs, cellSize)
      .map { case (aid, bid, ps0) =>
        val ps = ps0.map { case (s, xs, ys) =>
          Piece(s, xs.toIndexedSeq, ys.toIndexedSeq)
        }.toIndexedSeq
        (aid, bid, ps.length, pieceSetArea(ps))
      }
      .toDF("aid", "bid", "n_pieces", "area")
  }

  /** ERASE JOIN — the ArcGIS Erase / QGIS difference tool between two
    * polygon LAYERS: per A-feature, the area remaining after EVERY
    * intersecting B-feature is subtracted, overlaps among the B's
    * counted once (A ∖ ∪ᵢBᵢ — per A the cut region is the n-ary
    * UNION of its B∩A piece sets, folded in ascending-bid order).
    * Emits every A with its cutter count (0 when untouched).
    *
    * Scale shape: the [[overlayJoin]] bucket plan finds the
    * (A, B∩A-pieces) pairs; ONE groupByKey on aid folds the cut
    * union — per-group work is cutters-per-feature-scale, the
    * [[dissolve]] argument. */
  def eraseJoin(as: DataFrame, bs: DataFrame, cellSize: Double = 0.0): DataFrame = {
    val spark = as.sparkSession
    import spark.implicits._
    val areas = as.select(col("aid").cast("long"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .map { case (aid, xs, ys) => (aid, area(toPolygon(xs, ys))) }
      .toDF("aid", "area_a")
    val cuts = overlayJoinPieces(as, bs, cellSize)
      .groupByKey(_._1)
      .mapGroups { (aid, it) =>
        val members = it.toIndexedSeq.sortBy(_._2)
        val cut = members.foldLeft(IndexedSeq.empty[Piece]) { (acc, m) =>
          val ps = m._3.map { case (s, xs, ys) =>
            Piece(s, xs.toIndexedSeq, ys.toIndexedSeq)
          }.toIndexedSeq
          if (acc.isEmpty) ps else pieceSetUnion(acc, ps)
        }
        (aid, members.length, pieceSetArea(cut))
      }
      .toDF("aid", "n_cutters", "area_cut")
    areas.join(cuts, Seq("aid"), "left")
      .select(col("aid"),
        coalesce(col("n_cutters"), lit(0)).as("n_cutters"),
        (col("area_a") - coalesce(col("area_cut"), lit(0.0))).as("area_left"))
  }

  /** AREAL INTERPOLATION — the census-reaggregation op (re-express an
    * attribute from SOURCE polygons onto TARGET polygons by area
    * weighting, Goodchild & Lam 1980): every target's estimate is
    * Σ_sources v_s · |s∩t| / |s|, the uniform-density assumption.
    * Returns every target that overlaps at least one source with the
    * MICRO-QUANTIZED estimate est_u = Σ round(v·ratio·10⁶) — each
    * pair's contribution quantizes to an exact integer BEFORE the
    * sum, so the groupBy is order-free (the r16 determinism rule;
    * the per-pair IEEE chain area(s∩t)/area(s) is deterministic).
    *
    * Scale shape: the [[overlayJoin]] bucket pair plan + one exact
    * integer groupBy(tid); source areas ride the pair rows (computed
    * per pair from the ring — bounded by ring size, no extra join). */
  def arealInterpolate(sources: DataFrame, targets: DataFrame,
                       cellSize: Double = 0.0): DataFrame = {
    val spark = sources.sparkSession
    import spark.implicits._
    val src = sources.select(col("aid"), col("xs"), col("ys"), col("v"))
    val pairs = overlayJoinPieces(
      src.select(col("aid"), col("xs"), col("ys")),
      targets.select(col("bid").as("bid"), col("xs"), col("ys")), cellSize)
      .toDF("aid", "bid", "pieces")
    pairs
      .join(src.select(col("aid"), col("xs").as("sxs"), col("ys").as("sys"),
        col("v")), Seq("aid"))
      .as[(Long, Long, Seq[(Int, Seq[Double], Seq[Double])], Seq[Double], Seq[Double], Double)]
      .map { case (aid, bid, ps0, sxs, sys, v) =>
        val ps = ps0.map { case (s, xs, ys) =>
          Piece(s, xs.toIndexedSeq, ys.toIndexedSeq)
        }
        val inter = pieceSetArea(ps)
        val srcArea = area(toPolygon(sxs, sys))
        (bid, math.rint(v * (inter / srcArea) * 1e6).toLong)
      }
      .toDF("tid", "contrib_u")
      .groupBy("tid")
      .agg(count(lit(1)).as("n_sources"), sum("contrib_u").as("est_u"))
  }

  /** The (aid, bid, A∩B pieces) pair stream behind [[overlayJoin]] /
    * [[eraseJoin]] — bucket equi-join, canonical-bucket dedup, exact
    * piece intersections; empty intersections dropped. Pieces travel
    * as (sign, xs, ys) tuples (encoder-friendly). */
  private def overlayJoinPieces(as: DataFrame, bs: DataFrame, cellSize: Double):
      org.apache.spark.sql.Dataset[(Long, Long, Seq[(Int, Seq[Double], Seq[Double])])] = {
    val spark = as.sparkSession
    import spark.implicits._
    val cell = autoCellSize(as, cellSize)
    candidatePairs(as, "aid", bs, "bid", cell)
      .flatMap { case (aid, bid, axs, ays, bxs, bys) =>
        val ps = intersectionPieces(toPolygon(axs, ays), toPolygon(bxs, bys))
        if (ps.isEmpty) None
        else Some((aid, bid,
          ps.map(p => (p.sign, p.xs: Seq[Double], p.ys: Seq[Double])): Seq[(Int, Seq[Double], Seq[Double])]))
      }
  }

  /** General polygon UNION area of every feature ring with `other`
    * (concave allowed on both sides) — [[Clip.unionAreaConvex]]
    * without the convex restriction. */
  def unionWith(polys: DataFrame, other: Polygon): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    val areaB = area(other)
    polys.select(col("pid"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .map { case (pid, xs, ys) =>
        val subject = toPolygon(xs, ys)
        val ps = intersectionPieces(subject, other)
        val inter = ps.foldLeft(0.0)((s, p) => s + p.sign * Clip.ringArea(p.xs, p.ys))
        (pid, area(subject) + areaB - inter)
      }
      .toDF("pid", "area_union")
  }
}
