package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** General concave overlay: the signed-convex-decomposition algebra is
  * validated AGAINST INDEPENDENT references — ray-cast point counting
  * on the ORIGINAL rings (never the decomposition) and closed-form
  * areas — plus the algebraic identities (A∩A = A, symmetry,
  * inclusion-exclusion, hole subtraction). */
class OverlaySpec extends AnyFunSuite {

  private def star(cx: Double, cy: Double, outer: Double, inner: Double,
                   points: Int = 5, rot: Double = 0.0): Polygon =
    Polygon((0 until 2 * points).map { k =>
      val r = if (k % 2 == 0) outer else inner
      val a = rot + k * math.Pi / points
      Pt(cx + r * math.cos(a), cy + r * math.sin(a))
    })

  private def cross(cx: Double, cy: Double, w: Double, l: Double): Polygon =
    Polygon(IndexedSeq(
      Pt(cx - w, cy - l), Pt(cx + w, cy - l), Pt(cx + w, cy - w),
      Pt(cx + l, cy - w), Pt(cx + l, cy + w), Pt(cx + w, cy + w),
      Pt(cx + w, cy + l), Pt(cx - w, cy + l), Pt(cx - w, cy + w),
      Pt(cx - l, cy + w), Pt(cx - l, cy - w), Pt(cx - w, cy - w)))

  /** Independent reference: count sub-cell centers inside by the
    * ray-cast `Polygon.contains` over the ORIGINAL rings. */
  private def gridArea(p: (Double, Double) => Boolean,
                       xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                       cells: Int = 400): Double = {
    val dx = (xmax - xmin) / cells; val dy = (ymax - ymin) / cells
    var cnt = 0L
    var i = 0
    while (i < cells) {
      var j = 0
      while (j < cells) {
        if (p(xmin + (i + 0.5) * dx, ymin + (j + 0.5) * dy)) cnt += 1
        j += 1
      }
      i += 1
    }
    cnt * dx * dy
  }

  test("triangulation partitions concave rings: n-2 triangles, area-exact") {
    for (poly <- Seq(star(0, 0, 10, 4), cross(0, 0, 2.5, 7.5),
                     star(3, -2, 8, 3.1, points = 7, rot = 0.3))) {
      val tris = Overlay.triangulate(poly.exterior)
      // collinear triples arising mid-clip drop as zero-area ears, so
      // the count is AT MOST n-2; the area identity is the real claim
      assert(tris.length <= poly.exterior.length - 2 && tris.nonEmpty)
      val sum = tris.map { case (a, b, c) =>
        math.abs((b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)) / 2
      }.sum
      assert(math.abs(sum - Overlay.area(poly)) < 1e-9, poly.exterior.length)
    }
  }

  test("closed-form cross area and star self-intersection identity") {
    val c = cross(0, 0, 2.0, 6.0)
    // plus sign: two 4x12 bars overlapping in a 4x4 center
    assert(math.abs(Overlay.area(c) - (48 + 48 - 16)) < 1e-9)
    val s = star(1, 2, 9, 3.5)
    assert(math.abs(Overlay.intersectionArea(s, s) - Overlay.area(s)) < 1e-7)
    assert(math.abs(Overlay.unionArea(s, s) - Overlay.area(s)) < 1e-7)
  }

  test("concave x concave intersection matches the ray-cast grid count") {
    val a = star(0, 0, 10, 4, points = 6, rot = 0.2)
    val b = cross(3, 1, 2.5, 8.5)
    val alg = Overlay.intersectionArea(a, b)
    val ref = gridArea((x, y) => a.contains(x, y) && b.contains(x, y),
      -12, -12, 14, 14, cells = 900)
    assert(math.abs(alg - ref) < 0.15, s"alg=$alg ref=$ref")
    // symmetry
    assert(math.abs(Overlay.intersectionArea(b, a) - alg) < 1e-7)
    // union by inclusion-exclusion matches the OR grid count
    val algU = Overlay.unionArea(a, b)
    val refU = gridArea((x, y) => a.contains(x, y) || b.contains(x, y),
      -12, -12, 14, 14, cells = 900)
    assert(math.abs(algU - refU) < 0.15, s"algU=$algU refU=$refU")
  }

  test("disjoint and contained cases") {
    val a = star(0, 0, 5, 2)
    val far = cross(40, 40, 2, 6)
    assert(Overlay.intersectionPieces(a, far).isEmpty)
    assert(math.abs(Overlay.unionArea(a, far) - (Overlay.area(a) + Overlay.area(far))) < 1e-9)
    // a tiny rect fully inside one star spike-free center
    val inner = Geometry.rect(-0.5, -0.5, 0.5, 0.5)
    assert(math.abs(Overlay.intersectionArea(a, inner) - 1.0) < 1e-9)
  }

  test("holes subtract: donut x rect by closed form") {
    // square donut: outer 10x10, hole 4x4 centered
    val donut = Polygon(
      Geometry.rect(0, 0, 10, 10).exterior,
      Seq(Geometry.rect(3, 3, 7, 7).exterior))
    assert(math.abs(Overlay.area(donut) - 84) < 1e-9)
    // rect covering the left half: hole contributes 2x4 of the overlap
    val half = Geometry.rect(-1, -1, 5, 11)
    assert(math.abs(Overlay.intersectionArea(donut, half) - (50 - 8)) < 1e-9)
    // rect fully inside the hole: zero
    assert(math.abs(Overlay.intersectionArea(donut, Geometry.rect(4, 4, 6, 6))) < 1e-9)
    // signed containment: 1 in the ring body, 0 in the hole, 0 outside
    val ps = Overlay.pieces(donut)
    assert(Overlay.containsSigned(ps, 1.2, 5.1) == 1)
    assert(Overlay.containsSigned(ps, 5.1, 5.2) == 0)
    assert(Overlay.containsSigned(ps, 11.3, 5.1) == 0)
  }

  test("difference and symmetric difference close the boolean family") {
    val a = star(0, 0, 10, 4, points = 6, rot = 0.2)
    val b = cross(3, 1, 2.5, 8.5)
    val refD = gridArea((x, y) => a.contains(x, y) && !b.contains(x, y),
      -12, -12, 14, 14, cells = 900)
    assert(math.abs(Overlay.differenceArea(a, b) - refD) < 0.15)
    val refS = gridArea((x, y) => a.contains(x, y) != b.contains(x, y),
      -12, -12, 14, 14, cells = 900)
    assert(math.abs(Overlay.symDifferenceArea(a, b) - refS) < 0.2)
    // identities: A \ A = 0, A triangle A = 0; disjoint: A \ B = A
    assert(math.abs(Overlay.differenceArea(a, a)) < 1e-7)
    assert(math.abs(Overlay.symDifferenceArea(a, a)) < 1e-7)
    val far = cross(40, 40, 2, 6)
    assert(math.abs(Overlay.differenceArea(a, far) - Overlay.area(a)) < 1e-9)
    // signed containment of the difference pieces: 1 in A-only, 0 in
    // the intersection and outside — probe points picked off piece
    // boundaries by the ray-cast reference itself
    val dp = Overlay.differencePieces(a, b)
    val probes = for (i <- 0 until 60; j <- 0 until 60)
      yield (-12 + i * 0.437 + 0.11, -12 + j * 0.431 + 0.07)
    var aOnly = 0; var both = 0; var outside = 0
    probes.foreach { case (x, y) =>
      val expect = if (a.contains(x, y) && !b.contains(x, y)) 1 else 0
      val got = Overlay.containsSigned(dp, x, y)
      // skip the rare probe ON a piece edge (got outside {0,1})
      if (got == 0 || got == 1) {
        assert(got == expect, s"($x,$y)")
        if (expect == 1) aOnly += 1
        else if (a.contains(x, y)) both += 1 else outside += 1
      }
    }
    assert(aOnly > 50 && both > 20 && outside > 100, s"$aOnly/$both/$outside")
  }

  test("convex inputs agree with the exact Sutherland-Hodgman fast path") {
    val diamonds = (1 to 6).map(i =>
      Geometry.diamond(i * 11.0, i * 7.0, 5.0 + i))
    val hexa = Polygon(IndexedSeq(Pt(30, 10), Pt(25, 20), Pt(12, 20),
      Pt(7, 10), Pt(12, 0), Pt(25, 0)))
    diamonds.foreach { d =>
      val xs = d.exterior.map(_.x); val ys = d.exterior.map(_.y)
      val (ix, iy) = Clip.clipRingConvex(xs, ys,
        hexa.exterior.map(_.x), hexa.exterior.map(_.y))
      val sh = if (ix.isEmpty) 0.0 else Clip.ringArea(ix, iy)
      assert(math.abs(Overlay.intersectionArea(d, hexa) - sh) < 1e-8)
    }
  }

  test("DataFrame ops: concave pieces/areas per row, no empty rows") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val polys = (1L to 4L).map { i =>
      val s = star(i * 6.0, 5.0, 8, 3, points = 5, rot = i * 0.1)
      (i, s.exterior.map(_.x): Seq[Double], s.exterior.map(_.y): Seq[Double])
    }
    val clipPoly = cross(10, 5, 3, 9)
    val out = Overlay.intersect(polys.toDF("pid", "xs", "ys"), clipPoly)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    polys.foreach { case (pid, xs, ys) =>
      val p = Polygon(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq)
      val expect = Overlay.intersectionArea(p, clipPoly)
      if (expect == 0.0) assert(!out.contains(pid))
      else assert(math.abs(out(pid) - expect) < 1e-9)
    }
    val u = Overlay.unionWith(polys.toDF("pid", "xs", "ys"), clipPoly)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(u.size == 4)
    polys.foreach { case (pid, xs, ys) =>
      val p = Polygon(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq)
      assert(math.abs(u(pid) - Overlay.unionArea(p, clipPoly)) < 1e-9)
    }
  }

  test("bufferPieces: union of pieces equals the distance-ball region (round join)") {
    val L = Polygon(IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 4),
      Pt(4, 4), Pt(4, 10), Pt(0, 10)))
    val d = 2.0
    val ps = Buffer.bufferPieces(L, d, Buffer.Round(16))
    def inPieces(x: Double, y: Double): Boolean = ps.exists(_.contains(x, y))
    def inBall(x: Double, y: Double): Boolean = {
      if (L.contains(x, y)) true
      else {
        val ext = L.exterior
        (0 until ext.length).exists { i =>
          val a = ext(i); val b = ext((i + 1) % ext.length)
          Geometry.pointSegDist(x, y, a.x, a.y, b.x, b.y) <= d
        }
      }
    }
    // dense sample: piece-union and distance-ball disagree only within
    // the inscribed-arc sliver (width d*(1-cos(pi/2/16/2)) ~ 0.005)
    val refA = gridArea(inBall, -3, -3, 13, 13, cells = 640)
    val pieceA = gridArea(inPieces, -3, -3, 13, 13, cells = 640)
    assert(pieceA <= refA + 0.02, s"pieces overshoot: $pieceA vs $refA")
    assert(refA - pieceA < 0.12, s"arc undershoot too large: $pieceA vs $refA")
    // every sampled point inside pieces IS inside the ball (inscribed)
    val rnd = new scala.util.Random(7)
    (0 until 4000).foreach { _ =>
      val x = -3 + rnd.nextDouble() * 16; val y = -3 + rnd.nextDouble() * 16
      if (inPieces(x, y)) assert(inBall(x, y), s"($x,$y)")
    }
  }

  test("bufferPieces miter join covers the ball and matches convex buffer on convex rings") {
    val sq = Geometry.rect(0, 0, 8, 8)
    val d = 1.5
    val ps = Buffer.bufferPieces(sq, d, Buffer.Miter)
    val exact = Buffer.buffer(sq, d) // the convex miter fast path
    // miter union == the convex miter polygon (squares: both are the
    // d-grown square)
    val refA = gridArea((x, y) => exact.contains(x, y), -3, -3, 11, 11, cells = 640)
    val pieceA = gridArea((x, y) => ps.exists(_.contains(x, y)), -3, -3, 11, 11, cells = 640)
    assert(math.abs(refA - pieceA) < 0.05, s"$pieceA vs $refA")
    // concave ring: rejected by buffer, accepted by bufferPieces
    val L = Polygon(IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 4),
      Pt(4, 4), Pt(4, 10), Pt(0, 10)))
    intercept[IllegalArgumentException](Buffer.buffer(L, 1.0))
    assert(Buffer.bufferPieces(L, 1.0, Buffer.Miter).nonEmpty)
    intercept[IllegalArgumentException](Buffer.bufferPieces(L, -1.0))
  }

  test("ear clipping rejects self-intersecting rings loudly") {
    val bowtie = IndexedSeq(Pt(0, 0), Pt(4, 4), Pt(4, 0), Pt(0, 4))
    intercept[IllegalArgumentException](Overlay.triangulate(bowtie))
  }

  test("n-ary union: disjoint adds, nested absorbs, overlap subtracts once") {
    val a = Geometry.rect(0, 0, 4, 4)       // 16
    val b = Geometry.rect(10, 0, 13, 3)     // 9, disjoint from a
    val c = Geometry.rect(1, 1, 3, 3)       // 4, nested in a
    val d = Geometry.rect(2, 2, 6, 6)       // 16, overlaps a by 4
    assert(math.abs(Overlay.unionAreaAll(Seq(a, b)) - 25.0) < 1e-9)
    assert(math.abs(Overlay.unionAreaAll(Seq(a, c)) - 16.0) < 1e-9)
    assert(math.abs(Overlay.unionAreaAll(Seq(a, d)) - 28.0) < 1e-9)
    assert(math.abs(Overlay.unionAreaAll(Seq(a, b, c, d)) - 37.0) < 1e-9)
    // idempotent: A u A = A
    assert(math.abs(Overlay.unionAreaAll(Seq(a, a, a)) - 16.0) < 1e-9)
  }

  test("unionAreaAll equals the exact coordinate-compression reference on random rect sets") {
    // axis-aligned integer rects admit an EXACT independent union
    // area (sweep over the compressed coordinate grid) — the n-ary
    // algebra must match to fp tolerance on every seeded draw
    val rnd = new scala.util.Random(41)
    (0 until 25).foreach { trial =>
      val rects = (0 until 6).map { _ =>
        val x0 = rnd.nextInt(50).toDouble; val y0 = rnd.nextInt(50).toDouble
        (x0, y0, x0 + 1 + rnd.nextInt(20), y0 + 1 + rnd.nextInt(20))
      }
      val got = Overlay.unionAreaAll(
        rects.map { case (x0, y0, x1, y1) => Geometry.rect(x0, y0, x1, y1) })
      val xs = rects.flatMap(r => Seq(r._1, r._3)).distinct.sorted
      val ys = rects.flatMap(r => Seq(r._2, r._4)).distinct.sorted
      var ref = 0.0
      for (i <- 0 until xs.length - 1; j <- 0 until ys.length - 1) {
        val cx = (xs(i) + xs(i + 1)) / 2; val cy = (ys(j) + ys(j + 1)) / 2
        if (rects.exists(r => cx > r._1 && cx < r._3 && cy > r._2 && cy < r._4))
          ref += (xs(i + 1) - xs(i)) * (ys(j + 1) - ys(j))
      }
      assert(math.abs(got - ref) < 1e-6, s"trial $trial: $got vs $ref")
    }
  }

  test("n-ary union: order-free area, concave members, grid reference") {
    val shapes = Seq(
      star(5, 5, 4, 1.8),
      cross(7, 6, 1.3, 4.1),
      Geometry.rect(2.2, 2.7, 9.1, 4.9))
    val base = Overlay.unionAreaAll(shapes)
    // permutations agree (float fold order differs -> tolerance)
    shapes.permutations.foreach { p =>
      assert(math.abs(Overlay.unionAreaAll(p) - base) < 1e-6)
    }
    // independent ray-cast grid reference over the ORIGINAL rings
    val ref = gridArea((x, y) => shapes.exists(_.contains(x, y)),
      0, 0, 13, 13, cells = 650)
    assert(math.abs(base - ref) < 0.2, s"$base vs $ref")
  }

  test("lineLengthIn: hand shapes — square pass-through, concave notch, miss") {
    val sq = Geometry.rect(2, 2, 8, 8)
    // horizontal pass-through: inside length = square width
    assert(math.abs(Overlay.lineLengthIn(
      IndexedSeq(Pt(0, 5), Pt(10, 5)), Overlay.pieces(sq)) - 6.0) < 1e-12)
    // fully inside
    assert(math.abs(Overlay.lineLengthIn(
      IndexedSeq(Pt(3, 3), Pt(7, 3)), Overlay.pieces(sq)) - 4.0) < 1e-12)
    // miss
    assert(Overlay.lineLengthIn(
      IndexedSeq(Pt(0, 9.5), Pt(10, 9.5)), Overlay.pieces(sq)) == 0.0)
    // L-shape: the notch gap is excluded — segment y=6 crosses the
    // vertical arm (x 0..4) only
    val L = Polygon(IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 4),
      Pt(4, 4), Pt(4, 10), Pt(0, 10)))
    assert(math.abs(Overlay.lineLengthIn(
      IndexedSeq(Pt(-2, 6), Pt(12, 6)), Overlay.pieces(L)) - 4.0) < 1e-12)
    // polyline visiting both arms
    assert(math.abs(Overlay.lineLengthIn(
      IndexedSeq(Pt(2, 8), Pt(2, 2), Pt(8, 2)), Overlay.pieces(L)) - 12.0) < 1e-12)
  }

  test("lineLengthIn matches fine sampling on a concave star") {
    val st = star(6, 6, 5, 2.2)
    val line = IndexedSeq(Pt(0, 3.3), Pt(12, 7.1), Pt(2, 11.4))
    val exact = Overlay.lineLengthIn(line, Overlay.pieces(st))
    // independent reference: midpoint sampling over the ORIGINAL ring
    val n = 200000
    var approx = 0.0
    (0 until line.length - 1).foreach { i =>
      val a = line(i); val b = line(i + 1)
      val segLen = math.hypot(b.x - a.x, b.y - a.y)
      var hits = 0
      var k = 0
      while (k < n) {
        val t = (k + 0.5) / n
        if (st.contains(a.x + t * (b.x - a.x), a.y + t * (b.y - a.y))) hits += 1
        k += 1
      }
      approx += segLen * hits / n
    }
    assert(math.abs(exact - approx) < 0.01, s"$exact vs $approx")
    assert(exact > 0.1)
  }

  test("bufferLinePieces: straight corridor area is slab + two polygonal caps") {
    val d = 2.0
    val ps = Buffer.bufferLinePieces(
      IndexedSeq(Pt(0, 0), Pt(10, 0)), d, Buffer.Round(3), Buffer.RoundCap(3))
    // slab 2dL = 40; each cap = 6 triangles of central angle pi/6:
    // 2 * 6 * d^2 sin(pi/6) / 2 = 6 d^2 sin(pi/6) = 12
    val expected = 2 * d * 10 + 6 * d * d * math.sin(math.Pi / 6)
    val got = Overlay.unionAreaAll(ps.map(p => p))
    assert(math.abs(got - expected) < 1e-6, s"$got vs $expected")
  }

  test("bufferLinePieces: 180-degree reversal vertex is fully covered") {
    val d = 1.5
    // path goes out to (10,0) and doubles straight back: the old
    // turn==0 branch treated this as forward-collinear and left the
    // half-disk beyond (10,0) uncovered
    val line = IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(4, 0))
    val ps = Buffer.bufferLinePieces(line, d, Buffer.Round(8), Buffer.RoundCap(8))
    def in(x: Double, y: Double) = ps.exists(_.contains(x, y))
    // points ahead of the reversal vertex, within d (chordal margin)
    assert(in(10 + d * 0.9, 0.0))
    assert(in(10 + d * 0.6, d * 0.6))
    assert(in(10 + d * 0.6, -d * 0.6))
    assert(!in(10 + d + 0.01, 0.0))
    // Miter join gets the square mitre-limited end instead
    val pm = Buffer.bufferLinePieces(line, d, Buffer.Miter, Buffer.FlatCap)
    assert(pm.exists(_.contains(10 + d * 0.9, 0.0)))
    assert(!pm.exists(_.contains(10 + d + 0.01, 0.0)))
  }

  test("miter limit: near-collinear turns bevel instead of spiking") {
    val d = 1.0
    // interior vertex turns by ~1 degree: an unlimited miter would
    // reach ~115*d from the vertex; the JTS limit (5d) must bound it
    val line = IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(20, 0.17))
    val ps = Buffer.bufferLinePieces(line, d, Buffer.Miter, Buffer.FlatCap)
    ps.foreach(p => p.exterior.foreach { pt =>
      val dist = (0 until line.length - 1).map { i =>
        Geometry.pointSegDist(pt.x, pt.y, line(i).x, line(i).y,
          line(i + 1).x, line(i + 1).y)
      }.min
      assert(dist <= Buffer.MiterLimit * d + 1e-9, s"spike at $pt ($dist)")
    })
    // ring miter joints carry the same limit (near-collinear convex turn)
    val ring = Polygon(IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(20, 0.17),
      Pt(20, 10), Pt(0, 10)))
    val rp = Buffer.bufferPieces(ring, d, Buffer.Miter)
    val lim = Buffer.MiterLimit * d + 1e-9
    rp.foreach(p => p.exterior.foreach { pt =>
      assert(pt.x >= -lim && pt.x <= 20 + lim && pt.y >= -lim && pt.y <= 10 + lim,
        s"ring spike at $pt")
    })
  }

  test("bufferLinePieces: covers the corridor, stays near it (both turn signs)") {
    val line = IndexedSeq(Pt(0, 0), Pt(8, 1), Pt(10, 8), Pt(16, 6), Pt(18, 12))
    val d = 1.7
    val ps = Buffer.bufferLinePieces(line, d, Buffer.Round(4), Buffer.RoundCap(4))
    def distToLine(x: Double, y: Double): Double =
      (0 until line.length - 1).map { i =>
        Geometry.pointSegDist(x, y, line(i).x, line(i).y, line(i + 1).x, line(i + 1).y)
      }.min
    val rnd = new scala.util.Random(19)
    (0 until 6000).foreach { _ =>
      val x = -3 + rnd.nextDouble() * 24; val y = -3 + rnd.nextDouble() * 18
      val dist = distToLine(x, y)
      val in = ps.exists(_.contains(x, y))
      // inside the chordal inradius -> covered; beyond d -> excluded
      if (dist < d * math.cos(math.Pi / 16) - 1e-9) assert(in, s"($x,$y) d=$dist")
      if (dist > d + 1e-9) assert(!in, s"($x,$y) d=$dist")
    }
  }

}
