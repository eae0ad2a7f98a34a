package graft.vector

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Delaunay triangulation — the scale path past the
  * driver-side Bowyer-Watson ceiling ([[Voronoi.MaxSitesDual]]), for
  * site sets too large to triangulate in one task (the geotrellis
  * surface is `geotrellis.vector.triangulation.DelaunayTriangulation`;
  * geopyspark reaches it through TIN rasterization — reference
  * geopyspark/geotrellis delegate the algorithm to a single-JVM
  * quad-edge build, which is exactly the wall this path removes).
  *
  * Algorithm — local star + exact global certificate, no seam merge:
  * sites are hashed into grid buckets; each site gathers the sites in
  * the bucket ring around it, runs the EXACT driver Bowyer-Watson
  * ([[Delaunay.triangulateScaled]]) on that local set, and keeps its
  * incident triangles (its "star") only when every one carries a
  * proof of global correctness:
  *
  *  - disk certificate (exact BigInt): the triangle's circumdisk lies
  *    inside the rectangle of guaranteed bucket coverage, so NO site
  *    anywhere in the data can invade it — by the empty-circumcircle
  *    property the triangle is globally Delaunay. (Ring k around a
  *    site's bucket is guaranteed to contain every site within
  *    k·cellWidth horizontally and k·cellHeight vertically.)
  *  - fan certificate: the certified star either closes (2π around an
  *    interior site) or its two open boundary edges are edges of the
  *    GLOBAL convex hull (computed up front by the two-level
  *    mapPartitions monotone chain, collinear boundary points kept so
  *    hull adjacency is exact) — either way no global triangle
  *    incident to the site can exist outside the certified star.
  *
  * Uncertified sites expand their ring (doubling) and retry; with the
  * empty-circle radius bounded by local point spacing, uniform-ish
  * data certifies in 1–2 rounds, so total work is O(n · m²) local
  * predicates for m ≈ sites per gathered ring — embarrassingly
  * parallel, no shuffle beyond the bucket join, no driver state
  * beyond the hull.
  *
  * Each triangle is emitted exactly once, by its lexicographically
  * smallest vertex. Cocircular degeneracies (where the Delaunay
  * triangulation is not unique) are resolved CANONICALLY: the full
  * cocircular vertex set (complete by the disk certificate) is
  * re-triangulated as a fan from its lexicographically smallest
  * point, so every site's view of a degenerate circle agrees — the
  * output is a deterministic function of the point set alone,
  * independent of partitioning and gather order. On general-position
  * inputs the output equals [[Delaunay.triangulateScaled]] exactly
  * (DelaunayDistSpec); on cocircular inputs both are valid Delaunay
  * triangulations that may pick different diagonals.
  *
  * Determinism: every emitted id is decided by exact integer
  * predicates (Long fast path, BigInt past the overflow bounds) —
  * no float ever reaches the output, so the sf0.1 float-closing
  * rules are moot here.
  *
  * Guards (loud, the failOnHot discipline): duplicate sites at the
  * scale, non-integral coordinates, a site whose ring gather exceeds
  * `maxCandidates` (pathological density or fully-cocircular data),
  * rounds exhausted. Fully collinear inputs return zero triangles
  * without touching the loop (matching the driver contract).
  */
object DelaunayDist {

  /** Per-site gather ceiling: a site that cannot certify its star
    * before its ring collects this many candidates is pathological
    * (all-sites-on-one-circle class) — fail loudly rather than let
    * one task absorb the dataset. */
  val MaxCandidates = 65536

  /** Target mean sites per grid bucket (ring 1 then gathers ~9·this,
    * which certifies interior sites of uniform data immediately). */
  val TargetPerBucket = 2.0

  /** Triangulate `sites` (columns: id LONG, x DOUBLE, y DOUBLE)
    * distributed. Returns one row per Delaunay triangle: (a, b, c) —
    * site ids, ascending within each row.
    *
    * @param scale exactness contract of [[Delaunay.triangulateScaled]]:
    *              every coordinate must be integral after ·scale. */
  def triangulate(spark: SparkSession, sites: DataFrame, scale: Long,
                  maxCandidates: Int = MaxCandidates): DataFrame = {
    import spark.implicits._
    require(scale > 0, "scale must be positive")

    // exact integer coordinates (the triangulateScaled rint contract),
    // checked row-locally so a bad coordinate names itself; one
    // localCheckpoint so the stats / hull / bucketing passes below
    // share a single source scan (and the loud checks fire once)
    val pts: Dataset[(Long, Long, Long)] = sites
      .select(col("id").cast("long"), col("x").cast("double"),
        col("y").cast("double"))
      .as[(Long, Double, Double)]
      .map { case (id, x, y) =>
        def toL(v: Double, what: String): Long = {
          val s = v * scale
          val r = math.rint(s)
          require(math.abs(s - r) < 1e-6,
            s"triangulateDistributed: $what = $v (site $id) is not " +
              s"integral at scale $scale")
          require(math.abs(r) < (1L << 52),
            s"triangulateDistributed: |$what * scale| exceeds 2^52 (site $id)")
          r.toLong
        }
        (id, toL(x, "x"), toL(y, "y"))
      }
      .localCheckpoint()

    val stats = pts.toDF("id", "lx", "ly")
      .agg(count(lit(1)), count_distinct(struct(col("lx"), col("ly"))),
        count_distinct(col("id")),
        min("lx"), max("lx"), min("ly"), max("ly"))
      .head()
    val n = stats.getLong(0)
    if (n < 3) return spark.emptyDataset[(Long, Long, Long)].toDF("a", "b", "c")
    require(stats.getLong(1) == n,
      s"triangulateDistributed: duplicate sites at scale $scale — raise " +
        "the scale to the coordinates' true resolution")
    require(stats.getLong(2) == n, "triangulateDistributed: duplicate site ids")
    val (minX, maxX, minY, maxY) =
      (stats.getLong(3), stats.getLong(4), stats.getLong(5), stats.getLong(6))

    // global convex hull, collinear boundary points KEPT, so "hull
    // edge" means ADJACENT boundary sites — the exact fan certificate.
    // Two-level monotone chain (Hull.scala precedent): partition-local
    // contraction, driver merge.
    val hullCand = pts.map { case (_, lx, ly) => (lx, ly) }
      .mapPartitions(it => chainKeep(it.toArray).iterator)
      .collect()
    require(hullCand.length <= (1 << 20),
      s"triangulateDistributed: ${hullCand.length} boundary candidates " +
        "exceed the driver-merge ceiling (near-circular point set)")
    val hull = chainKeep(hullCand)
    // all boundary points collinear == fully collinear input: zero
    // triangles (the driver contract), no loop needed
    if (allCollinear(hull))
      return spark.emptyDataset[(Long, Long, Long)].toDF("a", "b", "c")
    val hullEdges: Set[((Long, Long), (Long, Long))] =
      hull.indices.map { i =>
        canonEdge(hull(i), hull((i + 1) % hull.length))
      }.toSet
    val hullEdgesB = spark.sparkContext.broadcast(hullEdges)

    // grid buckets sized to ~TargetPerBucket sites each; ring k around
    // a site's bucket provably covers [sx ± k·gx] × [sy ± k·gy]
    val gridDim = math.max(1L,
      math.min(8192L, math.ceil(math.sqrt(n / TargetPerBucket)).toLong))
    val gx = math.max(1L, (maxX - minX) / gridDim + 1)
    val gy = math.max(1L, (maxY - minY) / gridDim + 1)
    val nBx = (maxX - minX) / gx + 1
    val nBy = (maxY - minY) / gy + 1

    val bucketed = pts.map { case (id, lx, ly) =>
      (id, lx, ly, Math.floorDiv(lx - minX, gx), Math.floorDiv(ly - minY, gy))
    }.toDF("cid", "clx", "cly", "cbx", "cby").localCheckpoint()

    var active = bucketed
      .select(col("cid").as("id"), col("clx").as("lx"), col("cly").as("ly"),
        col("cbx").as("bx"), col("cby").as("by"))
    // per-round triangle batches collect as checkpointed PARTS and
    // union once at the end (r20, the flowAccumulation cntParts
    // discipline) — re-checkpointing the growing `out` union each
    // round was one extra materialization job per ring expansion
    val outParts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var k = 1L
    var remaining = n
    while (remaining > 0) {
      // full coverage must hold from ANY bucket, including corners
      val full = k >= nBx - 1 && k >= nBy - 1
      if (full) require(n <= maxCandidates,
        s"triangulateDistributed: a site needs the full $n-site set to " +
          s"certify its star (> maxCandidates=$maxCandidates) — " +
          "pathological (cocircular/collinear-heavy) site distribution")
      val gathered =
        if (k <= 32) {
          // ring join by exploded bucket offsets (small rings)
          val offs = (-k to k).toArray
          active
            .withColumn("dx", explode(lit(offs)))
            .withColumn("dy", explode(lit(offs)))
            .join(bucketed,
              col("bx") + col("dx") === col("cbx") &&
                col("by") + col("dy") === col("cby"))
        } else {
          // few stubborn sites, big rings: broadcast range join
          bucketed.join(broadcast(active),
            abs(col("bx") - col("cbx")) <= k && abs(col("by") - col("cby")) <= k)
        }
      val kNow = k
      val fullNow = full
      val maxCand = maxCandidates
      val processed = gathered
        .groupBy("id")
        .agg(first("lx").as("lx"), first("ly").as("ly"),
          first("bx").as("bx"), first("by").as("by"),
          collect_list(struct(col("cid"), col("clx"), col("cly"))).as("cand"))
        .as[(Long, Long, Long, Long, Long, Seq[(Long, Long, Long)])]
        .map { case (id, lx, ly, bx, by, cand) =>
          require(cand.length <= maxCand,
            s"triangulateDistributed: site $id gathered ${cand.length} " +
              s"candidates (> maxCandidates=$maxCand) — pathological density")
          val res = star(id, cand.toArray, kNow * gx, kNow * gy, fullNow,
            hullEdgesB.value)
          (id, lx, ly, bx, by, res.isDefined,
            res.getOrElse(Nil).map { case (a, b, c) => (a, b, c) })
        }
        .toDF("id", "lx", "ly", "bx", "by", "done", "tris")
        .localCheckpoint()
      outParts += processed.where(col("done"))
        .select(explode(col("tris")).as("t"))
        .select(col("t._1").as("a"), col("t._2").as("b"), col("t._3").as("c"))
      active = processed.where(!col("done"))
        .select("id", "lx", "ly", "bx", "by")
      remaining = active.count()
      k *= 2
    }
    // parts read the per-round `processed` checkpoints, so the union
    // is a cheap fan-in, not a recompute
    if (outParts.isEmpty) spark.emptyDataset[(Long, Long, Long)].toDF("a", "b", "c")
    else outParts.reduce(_ unionByName _)
  }

  /** Delaunay neighbor pairs from [[triangulate]]'s output: one row
    * per undirected edge (u < v) — the dual adjacency Voronoi cell
    * clipping consumes ([[Voronoi.cellsDual]]'s theorem, distributed). */
  def neighbors(tris: DataFrame): DataFrame =
    tris.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("a").as("u"), col("c").as("v")),
        struct(col("b").as("u"), col("c").as("v")))).as("e"))
      .select(col("e.u"), col("e.v")).distinct()

  /** Distributed Voronoi cells — the [[Voronoi.cellsDual]] clip run
    * per-site in executors against [[neighbors]] of the distributed
    * triangulation: V(i) = extent ∩ (∩ Delaunay-neighbor bisector
    * half-planes). With cocircular ties the canonical-fan diagonal
    * only ever ADDS a redundant (tangent) bisector — the four cells
    * meet at the circumcenter point either way — so the regions are
    * exact for any resolution. One row per site whose cell meets the
    * extent: (id, xs, ys) ring vertices (CW from the box corner, the
    * cellsDual vertex convention; doubles may differ from the driver
    * paths in the last ulp through clip order, never more —
    * neighbors are clipped in (x, y) order so the output is
    * deterministic). Sites with no Delaunay edges (fewer than 3
    * sites, or fully collinear input) yield no rows — use
    * [[Voronoi.cellsDual]]'s slab path for those degenerate sets. */
  def cells(spark: SparkSession, sites: DataFrame, scale: Long,
            xmin: Double, ymin: Double, xmax: Double, ymax: Double,
            maxCandidates: Int = MaxCandidates): DataFrame = {
    import spark.implicits._
    require(xmin < xmax && ymin < ymax, "degenerate extent")
    val nb = neighbors(triangulate(spark, sites, scale, maxCandidates))
    val pts = sites.select(col("id").cast("long").as("id"),
      col("x").cast("double").as("x"), col("y").cast("double").as("y"))
    val edges = nb.unionByName(
      nb.select(col("v").as("u"), col("u").as("v")))
    edges
      .join(pts.select(col("id").as("u"), col("x").as("ux"), col("y").as("uy")), "u")
      .join(pts.select(col("id").as("v"), col("x").as("vx"), col("y").as("vy")), "v")
      .select(col("u").as("id"), col("ux"), col("uy"), col("vx"), col("vy"))
      .as[(Long, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        val rows = it.toArray
        val s = Pt(rows.head._2, rows.head._3)
        val nbs = rows.map(r => Pt(r._4, r._5)).sortBy(p => (p.x, p.y))
        var ring: IndexedSeq[Pt] = IndexedSeq(
          Pt(xmin, ymin), Pt(xmax, ymin), Pt(xmax, ymax), Pt(xmin, ymax))
        var i = 0
        while (i < nbs.length && ring.length >= 3) {
          ring = Voronoi.clipBisector(ring, s, nbs(i)); i += 1
        }
        if (ring.length >= 3)
          Iterator.single((id, ring.map(_.x), ring.map(_.y)))
        else Iterator.empty
      }
      .toDF("id", "xs", "ys")
  }

  // ---------------------------------------------------------------
  // per-site star construction + certificates (pure, spec-testable)
  // ---------------------------------------------------------------

  /** Certified Delaunay star of site `sid` within `cand` (which must
    * contain sid). `wx`/`wy` are the guaranteed-coverage half-widths
    * around the site; `full` marks total coverage (certificates
    * trivially hold). Returns the triangles THIS site must emit
    * (lex-min-vertex ownership), or None if the star cannot yet be
    * certified globally correct. */
  private[vector] def star(sid: Long, cand: Array[(Long, Long, Long)],
                           wx: Long, wy: Long, full: Boolean,
                           hullEdges: Set[((Long, Long), (Long, Long))])
      : Option[Seq[(Long, Long, Long)]] = {
    // canonical lex order: index order IS (x, y) order below
    val sorted = cand.sortBy(p => (p._2, p._3))
    val ids = sorted.map(_._1)
    val px = sorted.map(_._2)
    val py = sorted.map(_._3)
    val si = sorted.indexWhere(_._1 == sid)
    require(si >= 0, s"site $sid missing from its own gather")
    val m = sorted.length
    if (m < 3) return if (full) Some(Nil) else None
    val tris = Delaunay.triangulateScaled(
      px.zip(py).map { case (x, y) => (x.toDouble, y.toDouble) }, 1L)
    val starT = tris.filter { case (a, b, c) => a == si || b == si || c == si }
    if (starT.isEmpty) return if (full) Some(Nil) else None

    // fan certificate: closed star, or open edges on the GLOBAL hull
    val edgeCnt = collection.mutable.HashMap.empty[Int, Int]
    starT.foreach { case (a, b, c) =>
      Seq(a, b, c).filter(_ != si).foreach(u =>
        edgeCnt(u) = edgeCnt.getOrElse(u, 0) + 1)
    }
    val open = edgeCnt.iterator.filter(_._2 == 1).map(_._1).toArray
    if (open.nonEmpty) {
      if (open.length != 2) return None // degenerate sliver view: expand
      if (!open.forall(u => hullEdges.contains(
        canonEdge((px(si), py(si)), (px(u), py(u)))))) return None
    }

    // disk certificate + witness scan, both exact
    val sx = px(si); val sy = py(si)
    val emitted = collection.mutable.LinkedHashSet.empty[(Long, Long, Long)]
    var t = 0
    while (t < starT.length) {
      val (a, b, c) = starT(t)
      if (!full && !diskInRect(px(a), py(a), px(b), py(b), px(c), py(c),
        sx - wx, sx + wx, sy - wy, sy + wy)) return None
      // cocircular witnesses: every OTHER candidate exactly on the
      // circumcircle (complete by the disk certificate / full coverage)
      var w = List.empty[Int]
      var p = 0
      while (p < m) {
        if (p != a && p != b && p != c &&
          inCircleSign(px(a), py(a), px(b), py(b), px(c), py(c),
            px(p), py(p)) == 0) w ::= p
        p += 1
      }
      if (w.isEmpty) {
        // unique triangle: owned by its lex-min vertex
        if (si == math.min(a, math.min(b, c))) {
          val s3 = Array(ids(a), ids(b), ids(c)).sorted
          emitted += ((s3(0), s3(1), s3(2)))
        }
      } else {
        // degenerate circle: canonical fan from the lex-min point of
        // the FULL cocircular set — every site that sees this circle
        // resolves it identically, and only the lex-min point emits
        val cset = (w ++ List(a, b, c)).distinct.sorted
        if (si == cset.head) {
          // cocircular points are in convex position with no 3
          // collinear, so the keep-collinear chain (BigInt-safe,
          // CCW from lex-min) orders the polygon exactly
          val ring = chainKeep(cset.map(i => (px(i), py(i))).toArray)
          val pos = cset.map(i => (px(i), py(i)) -> i).toMap
          val rid = ring.map(pos)
          var j = 1
          while (j + 1 < rid.length) {
            val s3 = Array(ids(rid(0)), ids(rid(j)), ids(rid(j + 1))).sorted
            emitted += ((s3(0), s3(1), s3(2)))
            j += 1
          }
        }
      }
      t += 1
    }
    Some(emitted.toSeq)
  }

  /** Monotone chain KEEPING collinear boundary points (pop on strictly
    * negative cross only) — boundary adjacency for the fan
    * certificate. BigInt cross: partition-local coords reach 2^52. */
  private[vector] def chainKeep(pts: Array[(Long, Long)]): Array[(Long, Long)] = {
    val s = pts.distinct.sortBy(identity)
    if (s.length < 3) return s
    def cross(a: (Long, Long), b: (Long, Long), c: (Long, Long)): Int =
      ((BigInt(b._1) - a._1) * (BigInt(c._2) - a._2) -
        (BigInt(b._2) - a._2) * (BigInt(c._1) - a._1)).signum
    val h = new Array[(Long, Long)](2 * s.length)
    var k = 0
    for (p <- s) {
      while (k >= 2 && cross(h(k - 2), h(k - 1), p) < 0) k -= 1
      h(k) = p; k += 1
    }
    val lower = k + 1
    for (i <- s.length - 2 to 0 by -1) {
      val p = s(i)
      while (k >= lower && cross(h(k - 2), h(k - 1), p) < 0) k -= 1
      h(k) = p; k += 1
    }
    h.take(k - 1)
  }

  /** All points collinear? (BigInt cross vs the first non-equal pair.) */
  private[vector] def allCollinear(pts: Array[(Long, Long)]): Boolean = {
    val d = pts.distinct
    if (d.length < 3) return true
    val a = d(0)
    val b = d.find(_ != a).get
    d.forall { c =>
      ((BigInt(b._1) - a._1) * (BigInt(c._2) - a._2) -
        (BigInt(b._2) - a._2) * (BigInt(c._1) - a._1)).signum == 0
    }
  }

  private def canonEdge(p: (Long, Long), q: (Long, Long))
      : ((Long, Long), (Long, Long)) =
    if (p._1 < q._1 || (p._1 == q._1 && p._2 < q._2)) (p, q) else (q, p)

  /** Exact: is p on the circumcircle of (a, b, c)? 0 = on; the sign
    * convention is irrelevant to the == 0 test. BigInt throughout —
    * only star triangles reach here. */
  private[vector] def inCircleSign(ax: Long, ay: Long, bx: Long, by: Long,
                                   cx: Long, cy: Long, qx: Long, qy: Long): Int = {
    val Ax = BigInt(ax) - qx; val Ay = BigInt(ay) - qy
    val Bx = BigInt(bx) - qx; val By = BigInt(by) - qy
    val Cx = BigInt(cx) - qx; val Cy = BigInt(cy) - qy
    val a2 = Ax * Ax + Ay * Ay
    val b2 = Bx * Bx + By * By
    val c2 = Cx * Cx + Cy * Cy
    (Ax * (By * c2 - b2 * Cy) - Ay * (Bx * c2 - b2 * Cx) +
      a2 * (Bx * Cy - By * Cx)).signum
  }

  /** Exact (BigInt, no floats): circumdisk of (a, b, c) contained in
    * [x0, x1] × [y0, y1]? Center = A + (ux, uy)/d with d = 2·2·area
    * normalized positive; R²·d² = ux² + uy²; each side check is
    * t = (side − center)·d ≥ 0 ∧ t² ≥ R²·d². */
  private[vector] def diskInRect(ax: Long, ay: Long, bx: Long, by: Long,
                                 cx: Long, cy: Long,
                                 x0: Long, x1: Long, y0: Long, y1: Long): Boolean = {
    val dx1 = BigInt(bx) - ax; val dy1 = BigInt(by) - ay
    val dx2 = BigInt(cx) - ax; val dy2 = BigInt(cy) - ay
    var d = 2 * (dx1 * dy2 - dy1 * dx2)
    if (d.signum == 0) return false // degenerate: never certify
    val q1 = dx1 * dx1 + dy1 * dy1
    val q2 = dx2 * dx2 + dy2 * dy2
    var ux = dy2 * q1 - dy1 * q2
    var uy = dx1 * q2 - dx2 * q1
    if (d.signum < 0) { d = -d; ux = -ux; uy = -uy }
    val r2d2 = ux * ux + uy * uy
    def side(t: BigInt): Boolean = t.signum >= 0 && t * t >= r2d2
    side((BigInt(x1) - ax) * d - ux) && side(ux - (BigInt(x0) - ax) * d) &&
      side((BigInt(y1) - ay) * d - uy) && side(uy - (BigInt(y0) - ay) * d)
  }
}
