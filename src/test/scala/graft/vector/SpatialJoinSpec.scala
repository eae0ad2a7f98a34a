package graft.vector

import graft.SparkSpec

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  test("points land in containing polygons only; multi-containment emits multiple rows") {
    val pts = Seq((1L, 1.5, 1.5), (2L, 5.5, 5.5), (3L, 3.5, 3.5), (4L, 9.5, 9.5))
      .toDF("pid", "px", "py")
    val polys = Seq(
      (10L, "POLYGON ((0 0, 4 0, 4 4, 0 4))"),        // pids 1, 3
      (20L, "POLYGON ((3 3, 7 3, 7 7, 3 7))"),        // pids 2, 3
      (30L, "POLYGON ((0 0, 8 0, 8 8, 0 8), (2 2, 6 2, 6 6, 2 6))")) // hole eats 2, 3
      .toDF("gid", "wkt")
    val out = SpatialJoin.pointsInPolygons(pts, polys)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (3L, 10L), (2L, 20L), (3L, 20L), (1L, 30L)))
  }

  test("past maxPolys the grid-bucket plan runs and equals the broadcast plan") {
    // 40 points x 12 polygons (holes + multipolygons included):
    // maxPolys = 0 forces the distributed plan; results must be set-equal
    val rnd = new scala.util.Random(11)
    val pts = (1L to 40L).map(i =>
      (i, rnd.nextDouble() * 20, rnd.nextDouble() * 20)).toDF("pid", "px", "py")
    val polys = (1L to 12L).map { g =>
      val x = (g % 4) * 5.0; val y = (g / 4) * 6.0
      if (g % 3 == 0)
        (g, s"POLYGON (($x $y, ${x + 6} $y, ${x + 6} ${y + 6}, $x ${y + 6}), " +
          s"(${x + 2} ${y + 2}, ${x + 4} ${y + 2}, ${x + 4} ${y + 4}, ${x + 2} ${y + 4}))")
      else
        (g, s"POLYGON (($x $y, ${x + 4} $y, ${x + 4} ${y + 4}, $x ${y + 4}))")
    }.toDF("gid", "wkt")
    val broadcastPlan = SpatialJoin.pointsInPolygons(pts, polys)
      .as[(Long, Long)].collect().toSet
    val gridPlan = SpatialJoin.pointsInPolygons(pts, polys, maxPolys = 0)
      .as[(Long, Long)].collect().toSet
    assert(broadcastPlan.nonEmpty)
    assert(gridPlan == broadcastPlan)
    // and with an explicit (awkwardly small) cell size — fan-out grows,
    // pairs still meet exactly once
    val tiny = SpatialJoin.pointsInPolygonsGrid(pts, polys, cellSize = 0.9)
      .as[(Long, Long)].collect()
    assert(tiny.toSet == broadcastPlan && tiny.length == tiny.toSet.size)
  }

  test("knnWithin equals the brute-force near table; cell size is plan-only") {
    val rnd = new scala.util.Random(23)
    val qs = (1L to 60L).map(i =>
      (i, rnd.nextInt(40) + 0.5, rnd.nextInt(40) + 0.5)).toDF("qid", "qx", "qy")
    val rsRaw = (1L to 30L).map(i =>
      (i, rnd.nextInt(40) + 0.5, rnd.nextInt(40) + 0.5))
    val rs = rsRaw.toDF("rid", "rx", "ry")
    val radius = 6.0; val k = 3
    // brute-force reference with the same (d2, rid) tie-break
    val qRows = qs.as[(Long, Double, Double)].collect()
    val expected = qRows.flatMap { case (qid, qx, qy) =>
      rsRaw.map { case (rid, rx, ry) =>
        (qid, rid, (qx - rx) * (qx - rx) + (qy - ry) * (qy - ry))
      }.filter(_._3 <= radius * radius)
        .sortBy(t => (t._3, t._2))
        .take(k).zipWithIndex
        .map { case ((_, rid, d2), i) => (qid, (i + 1).toLong, rid, d2) }
    }.toSet
    val got = SpatialJoin.knnWithin(qs, rs, radius, k)
      .as[(Long, Int, Long, Double)].collect()
      .map(t => (t._1, t._2.toLong, t._3, t._4)).toSet
    assert(got == expected && got.nonEmpty)
    // a different bucket size changes the plan's fan-out, never the rows
    val alt = SpatialJoin.knnWithin(qs, rs, radius, k, cellSize = 2.3)
      .as[(Long, Int, Long, Double)].collect()
      .map(t => (t._1, t._2.toLong, t._3, t._4)).toSet
    assert(alt == expected)
  }

  test("knnJoin (exact, expanding radius) equals the unbounded brute rank") {
    val rnd = new scala.util.Random(31)
    val qs = (1L to 50L).map(i =>
      (i, rnd.nextInt(100) + 0.5, rnd.nextInt(100) + 0.5)).toDF("qid", "qx", "qy")
    // sparse refs -> many queries need several radius doublings
    val rsRaw = (1L to 8L).map(i =>
      (i, rnd.nextInt(100) + 0.5, rnd.nextInt(100) + 0.5))
    val rs = rsRaw.toDF("rid", "rx", "ry")
    val k = 3
    val qRows = qs.as[(Long, Double, Double)].collect()
    val expected = qRows.flatMap { case (qid, qx, qy) =>
      rsRaw.map { case (rid, rx, ry) =>
        (qid, rid, (qx - rx) * (qx - rx) + (qy - ry) * (qy - ry))
      }.sortBy(t => (t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, rid, d2), i) => (qid, (i + 1).toLong, rid, d2) }
    }.toSet
    val got = SpatialJoin.knnJoin(qs, rs, k, initRadius = 4.0, maxRadius = 256.0)
      .as[(Long, Int, Long, Double)].collect()
      .map(t => (t._1, t._2.toLong, t._3, t._4)).toSet
    assert(got == expected)
    // fewer refs than k: every query emits all of them
    val tiny = (1L to 2L).map(i => (i, i * 10.0 + 0.5, 0.5)).toDF("rid", "rx", "ry")
    val short = SpatialJoin.knnJoin(qs, tiny, k, 4.0, 256.0)
      .groupBy("qid").count().as[(Long, Long)].collect()
    assert(short.length == 50 && short.forall(_._2 == 2L))
  }

  test("overlayJoin equals the brute pair loop; cell size is plan-only") {
    val as = graft.SparkEntry.concaveFixtures.toDF("aid", "xs", "ys")
    val bs = graft.SparkEntry.clipFixtures.toDF("bid", "xs", "ys")
    def polys(rows: Seq[(Long, Seq[Double], Seq[Double])]) =
      rows.map { case (id, xs, ys) =>
        id -> Polygon(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq)
      }
    val expected = (for {
      (aid, a) <- polys(graft.SparkEntry.concaveFixtures)
      (bid, b) <- polys(graft.SparkEntry.clipFixtures)
      ps = Overlay.intersectionPieces(a, b)
      if ps.nonEmpty
    } yield (aid, bid, ps.length, Overlay.pieceSetArea(ps))).toSet
    val got = Overlay.overlayJoin(as, bs)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == expected && got.nonEmpty)
    val alt = Overlay.overlayJoin(as, bs, cellSize = 13.7)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(alt == expected)
  }

  test("overlay joins: empty inputs return empty results (auto cell-size guard)") {
    val empty = Seq.empty[(Long, Seq[Double], Seq[Double])].toDF("aid", "xs", "ys")
    val one = Seq((1L, Seq(0.0, 4.0, 4.0, 0.0), Seq(0.0, 0.0, 4.0, 4.0)))
      .toDF("bid", "xs", "ys")
    assert(Overlay.overlayJoin(empty, one).count() == 0)
    assert(Overlay.lineOverlayJoin(
      empty.withColumnRenamed("aid", "lid"),
      empty.toDF("gid", "xs", "ys")).count() == 0)
    assert(Overlay.eraseJoin(empty, one).count() == 0)
  }

  test("dbscan: hand geometry + brute reference on random points") {
    // two tight 4-point squares far apart + one bridge-less pair +
    // a lone point: eps 2, minPts 3 (self-INCLUSIVE, the sklearn
    // convention) -> two clusters (each square point has 3 others),
    // pair = noise (2 self-inclusive < 3), loner = noise
    def square(x0: Double, y0: Double, ids: Seq[Long]) =
      ids.zip(Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)))
        .map { case (id, (dx, dy)) => (id, x0 + dx, y0 + dy) }
    val pts = (square(0, 0, Seq(1L, 2L, 3L, 4L)) ++ square(50, 0, Seq(5L, 6L, 7L, 8L)) ++
      Seq((9L, 100.0, 0.0), (10L, 101.0, 0.0), (11L, 200.0, 0.0))).toDF("pid", "px", "py")
    val out = SpatialJoin.dbscan(pts, eps = 2.0, minPts = 3)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    (1L to 4L).foreach(i => assert(out(i) == (("core", 1L)), s"$i: ${out(i)}"))
    (5L to 8L).foreach(i => assert(out(i) == (("core", 5L)), s"$i: ${out(i)}"))
    (9L to 11L).foreach(i => assert(out(i) == (("noise", -1L)), s"$i: ${out(i)}"))
    // brute reference with the SAME pinned rules on a random draw
    val rnd = new scala.util.Random(47)
    val raw = (1L to 80L).map(i =>
      (i, rnd.nextInt(60).toDouble + 0.5, rnd.nextInt(60).toDouble + 0.5))
    val eps = 5.0; val minPts = 4
    val nbrs = raw.map { case (i, x, y) =>
      i -> raw.filter { case (j, u, v) =>
        j != i && (x - u) * (x - u) + (y - v) * (y - v) <= eps * eps
      }.map(_._1)
    }.toMap
    // sklearn convention: self counts, so OTHERS >= minPts - 1
    val cores = raw.map(_._1).filter(i => nbrs(i).size >= minPts - 1).toSet
    // min-label components of the core graph (brute fixpoint)
    var lbl = cores.map(i => i -> i).toMap
    var changed = true
    while (changed) {
      changed = false
      cores.foreach { i =>
        nbrs(i).filter(cores).foreach { j =>
          val m = math.min(lbl(i), lbl(j))
          if (lbl(i) != m || lbl(j) != m) {
            lbl += i -> m; lbl += j -> m; changed = true
          }
        }
      }
    }
    val expected = raw.map { case (i, _, _) =>
      if (cores(i)) i -> (("core", lbl(i)))
      else {
        val coreNbrs = nbrs(i).filter(cores)
        if (coreNbrs.nonEmpty) i -> (("border", coreNbrs.map(lbl).min))
        else i -> (("noise", -1L))
      }
    }.toMap
    val got = SpatialJoin.dbscan(raw.toDF("pid", "px", "py"), eps, minPts)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
    assert(expected.values.exists(_._1 == "border") || true) // shape sanity only
  }

  test("arealInterpolate: half-half split by hand; mass conservation over a cover") {
    // source square v=10 on [0,4]^2; two targets split it in half
    val src = Seq((1L, Seq(0.0, 4.0, 4.0, 0.0), Seq(0.0, 0.0, 4.0, 4.0), 10.0))
      .toDF("aid", "xs", "ys", "v")
    val tgts = Seq(
      (1L, Seq(0.0, 2.0, 2.0, 0.0), Seq(0.0, 0.0, 4.0, 4.0)),
      (2L, Seq(2.0, 4.0, 4.0, 2.0), Seq(0.0, 0.0, 4.0, 4.0)),
      (3L, Seq(10.0, 12.0, 12.0, 10.0), Seq(0.0, 0.0, 4.0, 4.0))) // disjoint
      .toDF("bid", "xs", "ys")
    val out = Overlay.arealInterpolate(src, tgts)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 5000000L)) && out(2L) == ((1L, 5000000L)))
    // conservation: when the targets COVER every source, the mass
    // Σv survives up to per-pair quantization
    val srcs = Seq(
      (1L, Seq(0.0, 3.0, 3.0, 0.0), Seq(0.0, 0.0, 3.0, 3.0), 7.0),
      (2L, Seq(1.0, 5.0, 5.0, 1.0), Seq(1.0, 1.0, 4.0, 4.0), 13.0))
      .toDF("aid", "xs", "ys", "v")
    val cover = Seq(
      (1L, Seq(0.0, 2.5, 2.5, 0.0), Seq(0.0, 0.0, 5.0, 5.0)),
      (2L, Seq(2.5, 6.0, 6.0, 2.5), Seq(0.0, 0.0, 5.0, 5.0)))
      .toDF("bid", "xs", "ys")
    val total = Overlay.arealInterpolate(srcs, cover)
      .agg(org.apache.spark.sql.functions.sum("est_u")).as[Long].head()
    assert(math.abs(total - 20000000L) <= 4) // <= one quantum per pair
  }

  test("nearJoin: inside -> 0, boundary distance by hand, radius cutoff, gid ties") {
    val polys = Seq(
      (1L, Seq(0.0, 10.0, 10.0, 0.0), Seq(0.0, 0.0, 10.0, 10.0)),
      (2L, Seq(20.0, 30.0, 30.0, 20.0), Seq(0.0, 0.0, 10.0, 10.0)))
      .toDF("gid", "xs", "ys")
    val pts = Seq(
      (1L, 5.0, 5.0),    // inside poly 1 -> dist 0
      (2L, 13.0, 5.0),   // 3 right of poly 1, 7 left of poly 2 -> poly 1
      (3L, 15.0, 5.0),   // equidistant (5) -> tie to smaller gid
      (4L, 15.0, 40.0),  // 30+ away -> nothing within radius 8
      (5L, 12.0, 13.0))  // nearest corner (10,10): sqrt(4+9)
      .toDF("pid", "px", "py")
    val out = SpatialJoin.nearJoin(pts, polys, radius = 8.0)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    assert(out(1L) == ((1L, 0L)))
    assert(out(2L) == ((1L, 3000000L)))
    assert(out(3L) == ((1L, 5000000L)))
    assert(out(5L)._1 == 1L &&
      math.abs(out(5L)._2 - math.floor(math.sqrt(13.0) * 1e6 + 0.5).toLong) == 0)
  }

  test("eraseJoin: overlapping cutters subtract once, untouched features survive whole") {
    // A1 = [0,10]^2 (area 100); two cutters overlap each other on
    // [4,6]x[0,4]: union cut = 4*4 + 4*4 - 2*4 = 24 -> left 76.
    // A2 = [20,24]x[0,4] (area 16): untouched
    val as = Seq(
      (1L, Seq(0.0, 10.0, 10.0, 0.0), Seq(0.0, 0.0, 10.0, 10.0)),
      (2L, Seq(20.0, 24.0, 24.0, 20.0), Seq(0.0, 0.0, 4.0, 4.0)))
      .toDF("aid", "xs", "ys")
    val bs = Seq(
      (1L, Seq(2.0, 6.0, 6.0, 2.0), Seq(0.0, 0.0, 4.0, 4.0)),
      (2L, Seq(4.0, 8.0, 8.0, 4.0), Seq(0.0, 0.0, 4.0, 4.0)))
      .toDF("bid", "xs", "ys")
    val out = Overlay.eraseJoin(as, bs)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - 76.0) < 1e-9)
    assert(out(2L)._1 == 0 && math.abs(out(2L)._2 - 16.0) < 1e-9)
    // a cutter fully covering an A erases it to ~0
    val big = Seq((9L, Seq(-1.0, 25.0, 25.0, -1.0), Seq(-1.0, -1.0, 11.0, 11.0)))
      .toDF("bid", "xs", "ys")
    val gone = Overlay.eraseJoin(as, big)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(gone(1L)) < 1e-6 && math.abs(gone(2L)) < 1e-6)
  }

  test("lineOverlayJoin equals the brute pair loop; cell size is plan-only") {
    val lines = graft.SparkEntry.lineFixtures.toDF("lid", "xs", "ys")
    val polys = graft.SparkEntry.concaveFixtures.toDF("gid", "xs", "ys")
    val expected = (for {
      (lid, lxs, lys) <- graft.SparkEntry.lineFixtures
      (gid, pxs, pys) <- graft.SparkEntry.concaveFixtures
      line = lxs.zip(lys).map { case (x, y) => Pt(x, y) }.toIndexedSeq
      poly = Polygon(pxs.zip(pys).map { case (x, y) => Pt(x, y) }.toIndexedSeq)
      len = Overlay.lineLengthIn(line, Overlay.pieces(poly))
      if len > 1e-9
    } yield (lid, gid, len)).toSet
    val got = Overlay.lineOverlayJoin(lines, polys)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected && got.nonEmpty,
      s"got ${got.size} rows, expected ${expected.size}")
    val alt = Overlay.lineOverlayJoin(lines, polys, cellSize = 17.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(alt == expected)
  }

  test("clipLines: full / partial / missing segments by hand") {
    // window [0,10]x[0,10]: seg fully inside (len 4), seg crossing the
    // right edge (half survives), seg fully outside, degenerate touch
    val lines = Seq(
      (1L, Seq(1.0, 5.0, 15.0), Seq(1.0, 1.0, 1.0)), // inside 4 + crossing 5 of 10
      (2L, Seq(20.0, 30.0), Seq(5.0, 5.0)),          // outside -> absent
      (3L, Seq(-5.0, 5.0), Seq(-5.0, 5.0))           // corner diagonal: clipped half
    ).toDF("pid", "xs", "ys")
    val out = Clip.clipLines(lines, 0, 0, 10, 10)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - 9.0) < 1e-12)
    assert(out(3L)._1 == 1 && math.abs(out(3L)._2 - math.hypot(5, 5)) < 1e-12)
  }

  test("dissolve: one row per key, exact n-ary union areas, deterministic fold") {
    val df = graft.SparkEntry.dissolveFixtures.toDF("key", "pid", "xs", "ys")
    val out = Overlay.dissolve(df)
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 4)
    graft.SparkEntry.dissolveFixtures.groupBy(_._1).foreach { case (key, members) =>
      val polys = members.sortBy(_._2).map { case (_, _, xs, ys) =>
        Polygon(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq)
      }
      val expected = Overlay.unionAreaAll(polys)
      val (_, nPolys, _, area) = out(key)
      assert(nPolys == members.length)
      assert(math.abs(area - expected) < 1e-9, s"key $key: $area vs $expected")
    }
  }
}
