package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector point-in-polygon spatial join — the "which zone is each
  * point in" primitive (geotrellis vector joins / shapely contains in
  * the reference's mask arguments), expressed Spark-first with TWO
  * plans chosen by dim-side size:
  *
  *  - BROADCAST (≤ maxPolys): polygons collect driver-side, each
  *    executor holds the parsed list once, points stream through a
  *    bbox prefilter then the exact even-odd test. No shuffle touches
  *    the point side.
  *  - GRID-BUCKET (beyond maxPolys, automatic since r16): polygons
  *    explode to the coarse grid buckets their bbox overlaps, points
  *    key to their single containing bucket, and an equi-join on the
  *    bucket feeds the SAME bbox + even-odd exact test. Per-polygon
  *    fan-out = its bbox's bucket count (the auto cell size targets
  *    ~4); each (point, polygon) pair meets exactly once — in the
  *    point's bucket — so no dedup pass is needed and the result is
  *    EXACTLY the broadcast plan's (SpatialJoinSpec proves equality).
  *    No broadcast, no all-pairs: the 100 TB path.
  */
object SpatialJoin {

  /** Join points (pid, px, py) to polygons (gid, wkt): one row per
    * (point, containing polygon) — points in no polygon emit nothing,
    * points in several emit several. Automatically switches to the
    * distributed [[pointsInPolygonsGrid]] plan past `maxPolys`. */
  def pointsInPolygons(points: DataFrame, polys: DataFrame,
                       maxPolys: Int = 1 << 16): DataFrame = {
    // plan probe: a LIMITED count over a 1-column projection — the
    // over-limit branch scans at most maxPolys+1 rows and moves no
    // geometry bytes to the driver (collecting maxPolys+1 WKT strings
    // just to discard them would trade the row-count OOM for a
    // row-size one); the under-limit branch then collects a dim
    // already known to be small
    val probed = polys.select(lit(1)).limit(maxPolys + 1).count()
    if (probed > maxPolys) return pointsInPolygonsGrid(points, polys)
    val collected = polys.select(col("gid").cast("long"), col("wkt")).collect()
    val spark = points.sparkSession
    import spark.implicits._
    val parsed: Array[(Long, Array[((Double, Double, Double, Double), Polygon)])] =
      collected.map { r =>
        r.getLong(0) -> Wkt.parsePolygons(r.getString(1)).map(p => (p.bbox, p)).toArray
      }
    val bc = spark.sparkContext.broadcast(parsed)
    points.select(col("pid").cast("long"), col("px"), col("py"))
      .as[(Long, Double, Double)]
      .mapPartitions { it =>
        val gs = bc.value
        it.flatMap { case (pid, x, y) =>
          gs.iterator.collect {
            case (gid, ps) if ps.exists { case ((x0, y0, x1, y1), poly) =>
              x >= x0 && x <= x1 && y >= y0 && y <= y1 && poly.contains(x, y)
            } => (pid, gid)
          }
        }
      }
      .toDF("pid", "gid")
  }

  /** Distributed point-in-polygon join (the past-maxPolys plan): an
    * equi-join on coarse grid buckets, then the exact test. `cellSize`
    * ≤ 0 derives one from the average polygon bbox (~4 buckets per
    * polygon). Exact — equal to the broadcast plan on any input. */
  def pointsInPolygonsGrid(points: DataFrame, polys: DataFrame,
                           cellSize: Double = 0.0): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val p = polys.select(col("gid").cast("long"), col("wkt")).as[(Long, String)]
    val cell =
      if (cellSize > 0) cellSize
      else {
        // one bounded agg over the dim side: mean bbox extent
        val dims = p.map { case (_, wkt) =>
          val bs = Wkt.parsePolygons(wkt).map(_.bbox)
          val w = bs.map(b => b._3 - b._1).maxOption.getOrElse(0.0)
          val h = bs.map(b => b._4 - b._2).maxOption.getOrElse(0.0)
          (w, h)
        }.toDF("w", "h").agg(avg("w"), avg("h")).head()
        math.max(1e-9, math.max(dims.getDouble(0), dims.getDouble(1)))
      }
    // polygon side: one row per (covered bucket, gid); the wkt rides
    // along and re-parses behind a per-partition gid cache at probe time
    val polyBuckets = p.flatMap { case (gid, wkt) =>
      val boxes = Wkt.parsePolygons(wkt).map(_.bbox)
      val buckets = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
      boxes.foreach { case (x0, y0, x1, y1) =>
        var bx = math.floor(x0 / cell).toLong
        while (bx <= math.floor(x1 / cell).toLong) {
          var by = math.floor(y0 / cell).toLong
          while (by <= math.floor(y1 / cell).toLong) {
            buckets += ((bx, by))
            by += 1
          }
          bx += 1
        }
      }
      buckets.iterator.map { case (bx, by) => (bx, by, gid, wkt) }
    }.toDF("bx", "by", "gid", "wkt")
    val pts = points.select(col("pid").cast("long"), col("px"), col("py"))
      .withColumn("bx", floor(col("px") / cell).cast("long"))
      .withColumn("by", floor(col("py") / cell).cast("long"))
    pts.join(polyBuckets, Seq("bx", "by"))
      .select(col("pid"), col("px"), col("py"), col("gid"), col("wkt"))
      .as[(Long, Double, Double, Long, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap
          .empty[Long, Array[((Double, Double, Double, Double), Polygon)]]
        it.flatMap { case (pid, x, y, gid, wkt) =>
          val ps = cache.getOrElseUpdate(gid,
            Wkt.parsePolygons(wkt).map(q => (q.bbox, q)).toArray)
          val hit = ps.exists { case ((x0, y0, x1, y1), poly) =>
            x >= x0 && x <= x1 && y >= y0 && y <= y1 && poly.contains(x, y)
          }
          if (hit) Some((pid, gid)) else None
        }
      }
      .toDF("pid", "gid")
  }

  /** k-nearest-neighbor join WITHIN a search radius (the ArcGIS
    * GenerateNearTable / PostGIS KNN-with-limit shape): for every
    * query point (qid, qx, qy) the ≤ k nearest reference points
    * (rid, rx, ry) with d² ≤ radius², ranked by (d², rid) — the
    * deterministic tie-break. Queries with nothing in range emit no
    * rows.
    *
    * Scale shape: references key to one grid bucket of side `cell`
    * (default = radius), queries explode to the ⌈radius/cell⌉-ring
    * bucket neighborhood (3×3 at the default) — an EQUI-join with
    * bounded fan-out; candidates per query are its neighborhood's
    * occupancy, never the table. The rank is a per-query window
    * (partitioned by qid — no global window), k rows survive. Exact
    * by construction: any reference within `radius` of q lies in a
    * joined bucket. The unbounded-k nearest-neighbor needs expanding
    * rings — run again with a larger radius if a query came back
    * short (the bounded radius IS the semantics here, as in the
    * ArcGIS near table). */
  def knnWithin(queries: DataFrame, refs: DataFrame,
                radius: Double, k: Int, cellSize: Double = 0.0): DataFrame = {
    require(radius > 0 && k >= 1, "knnWithin needs radius > 0, k >= 1")
    val spark = queries.sparkSession
    import spark.implicits._
    val cell = if (cellSize > 0) cellSize else radius
    val reach = math.ceil(radius / cell).toLong
    val r2 = radius * radius
    val ref = refs.select(col("rid").cast("long"), col("rx"), col("ry"))
      .withColumn("bx", floor(col("rx") / cell).cast("long"))
      .withColumn("by", floor(col("ry") / cell).cast("long"))
    val qs = queries.select(col("qid").cast("long"), col("qx"), col("qy"))
      .as[(Long, Double, Double)]
      .flatMap { case (qid, qx, qy) =>
        val bx = math.floor(qx / cell).toLong
        val by = math.floor(qy / cell).toLong
        for {
          dx <- -reach to reach
          dy <- -reach to reach
        } yield (qid, qx, qy, bx + dx, by + dy)
      }
      .toDF("qid", "qx", "qy", "bx", "by")
    val d2 = (col("qx") - col("rx")) * (col("qx") - col("rx")) +
      (col("qy") - col("ry")) * (col("qy") - col("ry"))
    val pairs = qs.join(ref, Seq("bx", "by"))
      .select(col("qid"), col("rid"), d2.as("d2"))
      .where(col("d2") <= lit(r2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("rid"))
    pairs.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("rid"), col("d2"))
  }

  /** Grid-accelerated DBSCAN (Ester et al. 1996, public) over a point
    * table — the spatial-clustering workhorse, with the algorithm's
    * arbitrary choices PINNED deterministic:
    *  - CORE: ≥ minPts points within eps COUNTING THE POINT ITSELF —
    *    the Ester 1996 / sklearn min_samples / PostGIS convention
    *    (the self-excluded pair counts compare against minPts − 1),
    *    so minPts values port unchanged from those systems;
    *  - clusters: connected components of the core-core eps-graph,
    *    labeled by their MINIMUM core pid (the
    *    [[graft.pipeline.Dedup.connectedComponents]] stack — guarded
    *    driver union-find, large-star/small-star beyond the edge
    *    ceiling);
    *  - BORDER: non-core with a core neighbor, taking the SMALLEST
    *    cluster label among its core neighbors;
    *  - everything else NOISE (cluster −1).
    *
    * Scale shape: ONE eps-bucket equi-join (the [[knnWithin]] plan,
    * no rank window) yields the ordered neighbor pairs; counts,
    * core flags and edges are its aggregates; the CC stack carries
    * the only iteration. The pair table is localCheckpoint'd — three
    * consumers read it.
    *
    * @return (pid, kind core/border/noise, cluster; −1 for noise) */
  def dbscan(points: DataFrame, eps: Double, minPts: Int): DataFrame = {
    require(eps > 0 && minPts >= 1, "dbscan needs eps > 0, minPts >= 1")
    val spark = points.sparkSession
    import spark.implicits._
    val cell = eps
    val e2 = eps * eps
    val ref = points.select(col("pid").cast("long").as("rid"),
        col("px").as("rx"), col("py").as("ry"))
      .withColumn("bx", floor(col("rx") / cell).cast("long"))
      .withColumn("by", floor(col("ry") / cell).cast("long"))
    val qs = points.select(col("pid").cast("long"), col("px"), col("py"))
      .as[(Long, Double, Double)]
      .flatMap { case (pid, px, py) =>
        val bx = math.floor(px / cell).toLong
        val by = math.floor(py / cell).toLong
        for { dx <- -1L to 1L; dy <- -1L to 1L } yield (pid, px, py, bx + dx, by + dy)
      }
      .toDF("qid", "qx", "qy", "bx", "by")
    val d2 = (col("qx") - col("rx")) * (col("qx") - col("rx")) +
      (col("qy") - col("ry")) * (col("qy") - col("ry"))
    val pairs = qs.join(ref, Seq("bx", "by"))
      .where(col("qid") =!= col("rid") && d2 <= lit(e2))
      .select(col("qid"), col("rid"))
      .localCheckpoint()
    // self-excluded counts vs minPts − 1 == self-included vs minPts;
    // minPts = 1 makes EVERY point core (sklearn), including isolated
    // ones the pair table never sees
    val core =
      if (minPts <= 1) points.select(col("pid").cast("long").as("pid"))
      else pairs.groupBy("qid").agg(count(lit(1)).as("_n"))
        .where(col("_n") >= minPts - 1).select(col("qid").as("pid"))
    val coreEdges = pairs
      .join(core.withColumnRenamed("pid", "qid"), Seq("qid"))
      .join(core.withColumnRenamed("pid", "rid"), Seq("rid"))
      .where(col("qid") < col("rid"))
      .select(col("qid").as("d1"), col("rid").as("d2"))
    val comps = graft.pipeline.Dedup.connectedComponents(
        coreEdges, core.select(col("pid").as("doc_id")))
      .select(col("doc_id").as("pid"), col("component").as("cluster"))
    val borders = pairs
      .join(core.withColumnRenamed("pid", "rid"), Seq("rid"))
      .join(core.withColumnRenamed("pid", "qid"), Seq("qid"), "left_anti")
      .join(comps.select(col("pid").as("rid"), col("cluster")), Seq("rid"))
      .groupBy(col("qid")).agg(min(col("cluster")).as("cluster"))
      .select(col("qid").as("pid"), col("cluster"))
    val labeled = comps.select(col("pid"), lit("core").as("kind"), col("cluster"))
      .unionByName(borders.select(col("pid"), lit("border").as("kind"), col("cluster")))
    points.select(col("pid").cast("long").as("pid"))
      .join(labeled, Seq("pid"), "left")
      .select(col("pid"),
        coalesce(col("kind"), lit("noise")).as("kind"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }

  /** NEAR JOIN to POLYGON features (the ArcGIS Near tool with polygon
    * targets): for every point, the nearest polygon within `radius`
    * and the micro-quantized boundary distance (0 inside). Distance
    * to a polygon = min over its edges of the point-segment distance,
    * with the clamped-projection formula stated EXACTLY as in the
    * oracle (explicit sqrt(dx²+dy²) form — no hypot, whose extra
    * precision would diverge from the SQL twin); ties break to the
    * smallest gid.
    *
    * Scale shape: polygons explode to the grid buckets of their bbox
    * EXPANDED by `radius` (cell = radius), points key to one bucket —
    * every polygon within range meets the point in its bucket, an
    * equi-join with bounded fan-out. Per-pair cost is the ring size.
    * Points with nothing in range emit nothing. */
  def nearJoin(points: DataFrame, polys: DataFrame, radius: Double): DataFrame = {
    require(radius > 0, "nearJoin needs a positive search radius")
    val spark = points.sparkSession
    import spark.implicits._
    val cell = radius
    val polyBuckets = polys.select(col("gid").cast("long"), col("xs"), col("ys"))
      .as[(Long, Seq[Double], Seq[Double])]
      .flatMap { case (gid, xs, ys) =>
        for {
          bx <- math.floor((xs.min - radius) / cell).toLong to
                math.floor((xs.max + radius) / cell).toLong
          by <- math.floor((ys.min - radius) / cell).toLong to
                math.floor((ys.max + radius) / cell).toLong
        } yield (bx, by, gid, xs, ys)
      }
      .toDF("bx", "by", "gid", "xs", "ys")
    val pts = points.select(col("pid").cast("long"), col("px"), col("py"))
      .withColumn("bx", floor(col("px") / cell).cast("long"))
      .withColumn("by", floor(col("py") / cell).cast("long"))
    pts.join(polyBuckets, Seq("bx", "by"))
      .select(col("pid"), col("px"), col("py"), col("gid"), col("xs"), col("ys"))
      .as[(Long, Double, Double, Long, Seq[Double], Seq[Double])]
      .flatMap { case (pid, px, py, gid, xs, ys) =>
        val n = xs.length
        val poly = Polygon(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq)
        val dist =
          if (poly.contains(px, py)) 0.0
          else {
            var best = Double.MaxValue
            var i = 0
            while (i < n) {
              // (cur, prev) orientation — the EXACT segment endpoints
              // the SQL twin states (the projection arithmetic is not
              // direction-invariant in floating point)
              val j = (i + n - 1) % n
              val ax = xs(i); val ay = ys(i); val dx = xs(j) - ax; val dy = ys(j) - ay
              val len2 = dx * dx + dy * dy
              val t = math.max(0.0, math.min(1.0,
                ((px - ax) * dx + (py - ay) * dy) / len2))
              val ex = px - (ax + t * dx); val ey = py - (ay + t * dy)
              val dd = ex * ex + ey * ey
              if (dd < best) best = dd
              i += 1
            }
            math.sqrt(best)
          }
        // floor(x·10⁶ + 0.5): the same expression the SQL twin states
        // (identical IEEE chain -> identical integer either way)
        if (dist <= radius) Some((pid, gid, math.floor(dist * 1e6 + 0.5).toLong))
        else None
      }
      .toDF("pid", "gid", "dist_u")
      .groupBy("pid")
      .agg(min(struct(col("dist_u"), col("gid"))).as("m"))
      .select(col("pid"), col("m.gid").as("gid"), col("m.dist_u").as("dist_u"))
  }

  /** EXACT k-nearest-neighbor join (unbounded — the true PostGIS
    * `<->` LIMIT k semantics): expanding-radius rounds of
    * [[knnWithin]]. A query returning k rows at radius r is PROVABLY
    * complete (its kth distance ≤ r, every unexamined reference is
    * > r), so each round keeps the finished queries and re-runs only
    * the unfinished ones at 2r — geometric rounds, log(maxRadius/
    * initRadius) of them worst-case, each a bounded-fan-out bucket
    * join over a SHRINKING query side. `maxRadius` (default: set it
    * to the domain diameter) bounds termination for queries with
    * fewer than k references in range — they emit what exists.
    * localCheckpoint per round (the iterative-DataFrame rule). */
  def knnJoin(queries: DataFrame, refs: DataFrame, k: Int,
              initRadius: Double, maxRadius: Double): DataFrame = {
    require(initRadius > 0 && maxRadius >= initRadius, "bad radii")
    val spark = queries.sparkSession
    var remaining = queries.select(col("qid").cast("long"), col("qx"), col("qy"))
      .localCheckpoint()
    var acc: DataFrame = null
    var r = initRadius
    var done = false
    while (!done) {
      val last = r >= maxRadius
      val got = knnWithin(remaining, refs, r, k).localCheckpoint()
      val finished =
        if (last) got
        else got.join(
          got.groupBy("qid").agg(count(lit(1)).as("_n")).where(col("_n") === k)
            .select(col("qid")),
          Seq("qid"))
      acc = if (acc == null) finished else acc.unionByName(finished)
      if (last) done = true
      else {
        remaining = remaining.join(finished.select(col("qid")).distinct(),
          Seq("qid"), "left_anti").localCheckpoint()
        if (remaining.isEmpty) done = true else r = math.min(r * 2, maxRadius)
      }
    }
    acc
  }
}
