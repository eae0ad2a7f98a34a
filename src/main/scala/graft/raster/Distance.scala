package graft.raster

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.LayoutDefinition

/** Distance rasters.
  *
  * Reference: euclidean_distance.py (:10) — per-cell distance to the
  * nearest source geometry over the full layout; cost_distance.py (:8)
  * — accumulated friction cost from source cells.
  */
object Distance {

  /** Euclidean distance raster: for every cell of the layout, distance
    * from the cell center to the nearest point (grid coords).
    *
    * Tile-wise pruned gather (replaces r1's O(cells x points)
    * crossJoin): points are collected and broadcast (they are the
    * operator's small geometry argument, like the reference's
    * euclidean_distance.py:10 `geometry`); each layout tile bounds the
    * distance from its circumscribed circle to every point — a point
    * whose lower bound exceeds the tile's best upper bound can never
    * be nearest for ANY cell of the tile and is dropped before the
    * per-cell scan. Narrow plan, zero shuffles; per-cell work is
    * O(local candidates), independent of the global point count.
    * Per-distance floats use the exact r1 formula, so results are
    * bit-identical to the brute-force oracle (min over a superset
    * that contains the argmin).
    */
  /** Driver-side cap on the broadcast point set: euclidean's contract
    * is "points are the operator's small geometry argument"; failing
    * fast beats an opaque driver OOM when a caller passes a data-scale
    * table. */
  val MaxPoints = 10_000_000

  def euclidean(spark: SparkSession, points: DataFrame, layout: LayoutDefinition,
                maxPoints: Int = MaxPoints): DataFrame = {
    import spark.implicits._
    val tl = layout.tileLayout
    val (tc, tr, lc, lr) = (tl.tileCols, tl.tileRows, tl.layoutCols, tl.layoutRows)
    val pts = points.select(col("px").cast("double"), col("py").cast("double"))
      .limit(maxPoints + 1)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    require(pts.length <= maxPoints,
      s"euclidean: more than $maxPoints source points — too large to broadcast; " +
        "rasterize the points and use costDistanceTiled with unit friction instead")
    val bc = spark.sparkContext.broadcast(pts)
    val nTiles = lc.toLong * lr
    spark.range(0, nTiles, 1, math.min(nTiles, spark.sparkContext.defaultParallelism).toInt)
      .as[Long]
      .flatMap { t =>
        val all = bc.value
        if (all.isEmpty) Iterator.empty
        else {
          val tx = (t % lc).toInt; val ty = (t / lc).toInt
          val x0 = tx.toLong * tc; val y0 = ty.toLong * tr
          // cell centers span [x0+0.5, x0+tc-0.5]: bounding circle
          val cx = x0 + tc / 2.0; val cy = y0 + tr / 2.0
          val rad = math.sqrt((tc - 1.0) * (tc - 1.0) + (tr - 1.0) * (tr - 1.0)) / 2.0
          val center = new Array[Double](all.length)
          var best = Double.MaxValue
          var i = 0
          while (i < all.length) {
            val dx = cx - all(i)._1; val dy = cy - all(i)._2
            val d = math.sqrt(dx * dx + dy * dy)
            center(i) = d
            if (d + rad < best) best = d + rad
            i += 1
          }
          // relative-epsilon slack: the bound compares two rounded
          // sqrt chains; a few ulps must never drop the true argmin
          // (the gate demands bit-identical doubles downstream)
          val bestU = best + 1e-9 * (1.0 + best)
          val cand = all.indices.collect { case i if center(i) - rad <= bestU => all(i) }
          Iterator.tabulate(tc * tr) { o =>
            val x = x0 + o % tc; val y = y0 + o / tc
            var m = Double.MaxValue
            var j = 0
            while (j < cand.length) {
              val (px, py) = cand(j)
              val d = math.sqrt((x + 0.5 - px) * (x + 0.5 - px) +
                                (y + 0.5 - py) * (y + 0.5 - py))
              if (d < m) m = d
              j += 1
            }
            (x, y, m)
          }
        }
      }
      .toDF("x", "y", "v")
  }

  /** Euclidean ALLOCATION: every cell of the layout takes the id of
    * its nearest source point (the gdal_proximity / ArcGIS Euclidean
    * Allocation companion of [[euclidean]]; geotrellis pairs the same
    * distance kernel with a zone output). Ties break to the smallest
    * pid.
    *
    * Same tile-wise pruned-gather shape as [[euclidean]] — points
    * broadcast under the [[MaxPoints]] guard, each tile drops every
    * point whose circumscribed-circle lower bound exceeds the tile's
    * best upper bound (a tied argmin always survives: its distance at
    * the tying cell IS the tile bound, so `center - rad <= best`
    * holds by the triangle inequality). Narrow plan, zero shuffles.
    *
    * Determinism: for half-cell-aligned points (px - 0.5 integral —
    * the operator's documented contract, shared with the IDW oracle)
    * the squared distance `(x+0.5-px)^2 + (y+0.5-py)^2` is an exact
    * integer, so the (d2, pid) argmin is exact integer arithmetic with
    * no float compare anywhere.
    *
    * @return (x, y, pid, d2) — d2 the exact squared distance (BIGINT)
    */
  def allocation(spark: SparkSession, points: DataFrame, layout: LayoutDefinition,
                 maxPoints: Int = MaxPoints): DataFrame = {
    import spark.implicits._
    val tl = layout.tileLayout
    val (tc, tr, lc, lr) = (tl.tileCols, tl.tileRows, tl.layoutCols, tl.layoutRows)
    val pts = points.select(col("pid").cast("long"),
        col("px").cast("double"), col("py").cast("double"))
      .limit(maxPoints + 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    require(pts.length <= maxPoints,
      s"allocation: more than $maxPoints source points — too large to broadcast; " +
        "rasterize the points and use costDistanceTiled with unit friction instead")
    require(pts.forall { case (_, px, py) =>
      (px - 0.5) == math.floor(px - 0.5) && (py - 0.5) == math.floor(py - 0.5) },
      "allocation: points must be half-cell-aligned (px - 0.5 integral) so the " +
        "squared-distance argmin is exact")
    val bc = spark.sparkContext.broadcast(pts)
    val nTiles = lc.toLong * lr
    spark.range(0, nTiles, 1, math.min(nTiles, spark.sparkContext.defaultParallelism).toInt)
      .as[Long]
      .flatMap { t =>
        val all = bc.value
        if (all.isEmpty) Iterator.empty
        else {
          val tx = (t % lc).toInt; val ty = (t / lc).toInt
          val x0 = tx.toLong * tc; val y0 = ty.toLong * tr
          val cx = x0 + tc / 2.0; val cy = y0 + tr / 2.0
          val rad = math.sqrt((tc - 1.0) * (tc - 1.0) + (tr - 1.0) * (tr - 1.0)) / 2.0
          val center = new Array[Double](all.length)
          var best = Double.MaxValue
          var i = 0
          while (i < all.length) {
            val dx = cx - all(i)._2; val dy = cy - all(i)._3
            val d = math.sqrt(dx * dx + dy * dy)
            center(i) = d
            if (d + rad < best) best = d + rad
            i += 1
          }
          val bestU = best + 1e-9 * (1.0 + best)
          val cand = all.indices.collect { case i if center(i) - rad <= bestU => all(i) }
          Iterator.tabulate(tc * tr) { o =>
            val x = x0 + o % tc; val y = y0 + o / tc
            var bd2 = Long.MaxValue; var bpid = Long.MaxValue
            var j = 0
            while (j < cand.length) {
              val (pid, px, py) = cand(j)
              // exact: both factors are integral-valued doubles
              val dx = (x + 0.5 - px); val dy = (y + 0.5 - py)
              val d2 = (dx * dx + dy * dy).toLong
              if (d2 < bd2 || (d2 == bd2 && pid < bpid)) { bd2 = d2; bpid = pid }
              j += 1
            }
            (x, y, bpid, bd2)
          }
        }
      }
      .toDF("x", "y", "pid", "d2")
  }

  /** Cost distance (friction-weighted shortest path from sources) via
    * per-tile multi-source Dijkstra with halo frontier exchange — the
    * scale-correct distributed SSSP shape: each round runs Dijkstra to
    * fixpoint INSIDE every tile (cheap, local), then ships only the
    * improved border cells to the 8 neighbor tiles. Rounds needed =
    * tile-graph hops (O(layout diameter)), and each round shuffles
    * O(changed tiles x perimeter) bytes, not cell rings.
    *
    * Cost model (reference cost_distance.py:8): entering cell n from c
    * costs step(c,n) * friction(n), step = 1 or sqrt(2); NaN friction
    * is impassable.
    *
    * `maxCost` mirrors the reference's max_distance: cells beyond it
    * stay unreached. Pruning mid-relaxation is exact — path prefixes
    * are monotone under nonnegative weights, so no <=maxCost path is
    * ever cut. It also gives the operator a DuckDB oracle: with
    * friction >= f_min every edge costs >= f_min, so ceil(maxCost /
    * f_min) Bellman-Ford rounds provably converge for every surviving
    * cell (SparkEntry unrolls exactly that).
    */
  /** Least-cost PATH extraction (the ArcGIS CostPath companion of
    * cost_distance): backtrack from `dest` — by default the farthest
    * reachable cell (max accumulated cost, ties to the smallest
    * linear id) — to the nearest source, stepping each round to the
    * neighbor minimizing d(n) + step * f(cur), ties to the smallest
    * linear id. Because every hop costs >= min friction, the walk
    * strictly descends and is bounded by maxCost / f_min hops.
    *
    * Determinism: d and f are the exact doubles the cost-distance
    * fixpoint produced (identical accumulation order to the oracle's
    * unrolled relaxation), so argmin/argmax compares are
    * engine-identical. Scale shape: the walk is sequential, so below
    * `maxDriverCells` it runs driver-side over the collected
    * REACHABLE set — bounded by the maxCost disk, NOT the raster;
    * ABOVE the guard (r17) it falls back to the fully distributed
    * backtrack: per-cell next-hop pointers from one 8-offset shifted
    * self-join (the same (key, id) argmin the walk computes), then
    * the dest chain extracted by pointer DOUBLING with hop
    * accumulation — O(log pathLen) co-keyed joins, label-identical
    * to the walk. The distance fixpoint itself stays distributed in
    * both regimes.
    *
    * @return (seq, x, y, v_u): step index from dest (0) to source,
    *         the accumulated cost at each path cell micro-quantized
    *         (round(d*1e5) as BIGINT — the portable closing) */
  def costPath(friction: RasterLayer, sources: DataFrame,
               maxRounds: Int = 64,
               maxCost: Double = Double.PositiveInfinity,
               maxDriverCells: Long = 1L << 22,
               distance: Option[RasterLayer] = None): DataFrame = {
    val spark = friction.spark
    import spark.implicits._
    // r20: pin the friction tiles — the cost-distance fixpoint AND the
    // reach join both consume them (each re-ran the upstream build +
    // normalize before)
    val fr = friction.copy(df = friction.df.localCheckpoint())
    // reuse a caller-supplied cost-distance layer (e.g. when the same
    // analysis also materializes costDistanceTiled) instead of paying
    // the whole fixpoint a second time
    val dist = distance.getOrElse(costDistanceTiled(fr, sources, maxRounds, maxCost))
    val tl = fr.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val gridCols = tl.totalCols
    // tile-aligned join + per-tile zip (r20): dist and friction tiles
    // are co-keyed on (col, row), so joining TILES and exploding once
    // replaces the old per-cell double explode + cell-keyed shuffle —
    // same (x, y, d, f) rows (toCells' exact coordinate arithmetic)
    val reachDf = dist.df.select(col("col").as("_tc"), col("row").as("_tr"),
        col("tile").as("_d"))
      .join(fr.df.select(col("col").as("_tc"), col("row").as("_tr"),
        col("tile").as("_f")), Seq("_tc", "_tr"))
      .select(col("_tc"), col("_tr"),
        posexplode(arrays_zip(col("_d"), col("_f"))).as(Seq("off", "z")))
      .where(!isnan(col("z._d")) && !isnan(col("z._f")))
      .select(
        (col("_tc").cast("long") * tc + col("off") % tc).as("x"),
        (col("_tr").cast("long") * tr + floor(col("off") / tc).cast("long")).as("y"),
        col("z._d").as("d"), col("z._f").as("f"))
      .localCheckpoint() // one compute: counted for the guard, then collected
    // guard BEFORE materializing on the driver — count() keeps the
    // reachable set distributed, so an over-guard disk routes to the
    // distributed backtrack instead of OOMing the driver collect.
    val nReach = reachDf.count()
    if (nReach > maxDriverCells) return costPathDistributed(reachDf, gridCols)
    val reach = reachDf.as[(Long, Long, Double, Double)].collect()
    val byId = reach.map { case (x, y, d, f) => (y * gridCols + x) -> (x, y, d, f) }.toMap
    if (byId.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)].toDF("seq", "x", "y", "v_u")
    // dest: farthest reachable cell, ties to the smallest id
    var cur = reach.map { case (x, y, d, _) => (d, y * gridCols + x) }
      .reduce { (a, b) => if (a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)) a else b }._2
    val Sqrt2 = math.sqrt(2.0)
    val path = mutable.ListBuffer.empty[(Long, Long, Long, Double)]
    var seq = 0L
    var steps = 0
    while ({
      val (x, y, d, _) = byId(cur)
      path += ((seq, x, y, d))
      // a simple path visits each reachable cell at most once; more
      // steps means the argmin chain cycled on a zero-friction
      // plateau — fail LOUDLY instead of silently truncating (the
      // old fixed 100000 cap returned a cut path with no error)
      require(steps <= nReach,
        s"cost-path backtrack exceeded the $nReach reachable cells — " +
          "zero-friction cycle in the next-hop chain")
      d > 0
    }) {
      val (x, y, _, f) = byId(cur)
      var best = (Double.PositiveInfinity, Long.MaxValue)
      for (dy <- -1 to 1; dx <- -1 to 1 if dx != 0 || dy != 0) {
        val nid = (y + dy) * gridCols + (x + dx)
        byId.get(nid).foreach { case (nx, ny, nd, _) =>
          if (nx == x + dx && ny == y + dy) { // no linear-id aliasing
            val step = if (dx == 0 || dy == 0) 1.0 else Sqrt2
            val key = nd + step * f
            if (key < best._1 || (key == best._1 && nid < best._2)) best = (key, nid)
          }
        }
      }
      cur = best._2
      seq += 1; steps += 1
    }
    path.toSeq.toDF("seq", "x", "y", "d")
      .select(col("seq"), col("x"), col("y"),
        // micro-quantized BIGINT closing (the CLAUDE.md r16 rule:
        // never emit round(x, k) DOUBLE columns — integer rounding of
        // the identical IEEE chain is engine-portable)
        round(col("d") * 100000.0).cast("long").as("v_u"))
  }

  /** The distributed [[costPath]] backtrack (over-guard regime):
    *  1. next-hop forest — every reachable cell with d > 0 points to
    *     the (d_n + step·f_cell, id)-argmin of its 8 present
    *     neighbors, computed by one shifted self-join + min(struct)
    *     (coordinate-keyed, so no linear-id aliasing); source cells
    *     (d = 0) have no out-edge and terminate chains;
    *  2. dest = the (d desc, id asc) argmax, one limit(1);
    *  3. the dest chain extracted by pointer DOUBLING with hop
    *     accumulation — the binary-counter invariant: after round k
    *     the frontier holds every chain node at < 2^(k+1) hops, the
    *     jump table holds 2^(k+1)-hop ancestors.
    * The per-step argmin states the EXACT driver-walk comparison
    * ((key, nid) lexicographic min over the same IEEE key doubles),
    * so the emitted path is row-identical to the collected walk. */
  private def costPathDistributed(reach: DataFrame, gridCols: Long): DataFrame = {
    val spark = reach.sparkSession
    import spark.implicits._
    val Sqrt2 = math.sqrt(2.0)
    val cells = reach.select(col("x"), col("y"), col("d"), col("f"))
      .withColumn("id", col("y") * gridCols + col("x"))
      .localCheckpoint() // feeds next-hop join (twice), dest, and the closing join
    val offs = for { dy <- -1 to 1; dx <- -1 to 1 if dx != 0 || dy != 0 } yield (dx, dy)
    val nbrs = offs.map { case (dx, dy) =>
      val step = if (dx == 0 || dy == 0) 1.0 else Sqrt2
      cells.select((col("x") - dx).as("x"), (col("y") - dy).as("y"),
        col("d").as("nd"), col("id").as("nid"), lit(step).as("step"))
    }.reduce(_ unionAll _)
    val next = cells.where(col("d") > 0.0)
      .join(nbrs, Seq("x", "y"))
      .select(col("id").as("u"),
        struct((col("nd") + col("step") * col("f")).as("key"),
          col("nid").as("nid")).as("cand"))
      .groupBy("u").agg(min("cand").as("cand"))
      .select(col("u"), col("cand.nid").as("anc"))
    var frontier = cells.orderBy(col("d").desc, col("id").asc).limit(1)
      .select(col("id").as("node"), lit(0L).as("seq"))
      .localCheckpoint()
    var jump = next.select(col("u"), col("anc"), lit(1L).as("len"))
      .localCheckpoint()
    var done = false
    var rounds = 0
    // carry the frontier's size across rounds instead of re-counting
    // the previous checkpoint every round (r20: one fewer job/round)
    var frontierCnt = frontier.count()
    while (!done && rounds < 48) { // 2^48 hops: unreachable backstop
      val added = frontier.join(jump, frontier("node") === jump("u"))
        .select(jump("anc").as("node"), (frontier("seq") + jump("len")).as("seq"))
      // chain nodes have a unique hop count; min() is pure dedup
      val grown = frontier.unionByName(added)
        .groupBy("node").agg(min("seq").as("seq"))
        .localCheckpoint()
      val grownCnt = grown.count()
      done = grownCnt == frontierCnt
      frontier = grown
      frontierCnt = grownCnt
      if (!done) {
        jump = jump.as("a").join(jump.as("b"), col("a.anc") === col("b.u"))
          .select(col("a.u").as("u"), col("b.anc").as("anc"),
            (col("a.len") + col("b.len")).as("len"))
          .localCheckpoint()
      }
      rounds += 1
    }
    frontier.join(cells, frontier("node") === cells("id"))
      .select(col("seq"), col("x"), col("y"),
        // micro-quantized BIGINT closing (the CLAUDE.md r16 rule:
        // never emit round(x, k) DOUBLE columns — integer rounding of
        // the identical IEEE chain is engine-portable)
        round(col("d") * 100000.0).cast("long").as("v_u"))
  }

  /** ArcGIS Corridor: per-cell SUM of two accumulative-cost surfaces
    * over the same friction — the corridor-selection input (threshold
    * the result to delineate the lowest-total-cost swath between the
    * two source sets). Cells reachable from BOTH sets within maxCost
    * survive the co-keyed inner tile join; a pure composition of two
    * tiled Dijkstra passes + one local add, so every scale property
    * of [[costDistanceTiled]] carries over unchanged. */
  def corridor(friction: RasterLayer, sourcesA: DataFrame, sourcesB: DataFrame,
               maxCost: Double = Double.PositiveInfinity): RasterLayer = {
    // r20: pin the friction tiles — both Dijkstra passes seed from them
    val fr = friction.copy(df = friction.df.localCheckpoint())
    costDistanceTiled(fr, sourcesA, maxCost = maxCost) +
      costDistanceTiled(fr, sourcesB, maxCost = maxCost)
  }

  def costDistanceTiled(friction: RasterLayer, sources: DataFrame,
                        maxRounds: Int = 64,
                        maxCost: Double = Double.PositiveInfinity): RasterLayer = {
    val spark = friction.spark
    import spark.implicits._
    val tl = friction.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val (lc, lr) = (tl.layoutCols, tl.layoutRows)
    val Sqrt2 = math.sqrt(2.0)

    // (col, row, friction, dist): dist NaN = unreached
    val srcCells = sources
      .select(floor(col("px")).cast("long").as("x"), floor(col("py")).cast("long").as("y"))
      .withColumn("scol", (col("x") / tc).cast("int"))
      .withColumn("srow", (col("y") / tr).cast("int"))
      .withColumn("off", ((col("y") % tr) * tc + (col("x") % tc)).cast("int"))
      .groupBy("scol", "srow").agg(collect_list("off").as("offs"))

    var state = friction.df
      .join(srcCells,
        friction.df("col") === srcCells("scol") && friction.df("row") === srcCells("srow"),
        "left_outer")
      .select(col("col"), col("row"), col("tile").as("friction"), col("offs"))
      .as[(Int, Int, Seq[Double], Option[Seq[Int]])]
      .map { case (c, r, fr, offs) =>
        val frA = fr.toArray // deserialized Seq is a List: O(n) apply
        val dist = Array.fill(frA.length)(Double.NaN)
        offs.toSeq.flatten.foreach(o => if (!frA(o).isNaN) dist(o) = 0.0)
        (c, r, fr, dist.toSeq)
      }
      .toDF("col", "row", "friction", "dist")
      .localCheckpoint()

    /** Dijkstra to fixpoint within one tile from the given seeds;
      * returns improved dist and the set of changed offsets. */
    def localDijkstra(fr: Array[Double], dist: Array[Double],
                      seeds: Iterable[Int]): mutable.BitSet = {
      val changed = new mutable.BitSet(fr.length)
      val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
      seeds.foreach(o => if (!dist(o).isNaN) pq.enqueue((dist(o), o)))
      while (pq.nonEmpty) {
        val (d, o) = pq.dequeue()
        if (d <= dist(o)) {
          val cx = o % tc; val cy = o / tc
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              if (dx != 0 || dy != 0) {
                val nx = cx + dx; val ny = cy + dy
                if (nx >= 0 && nx < tc && ny >= 0 && ny < tr) {
                  val no = ny * tc + nx
                  val f = fr(no)
                  if (!f.isNaN) {
                    val step = if (dx == 0 || dy == 0) 1.0 else Sqrt2
                    val nd = d + step * f
                    if (nd <= maxCost && (dist(no).isNaN || nd < dist(no))) {
                      dist(no) = nd
                      changed += no
                      pq.enqueue((nd, no))
                    }
                  }
                }
              }
              dx += 1
            }
            dy += 1
          }
        }
      }
      changed
    }

    // round 0: settle each tile internally from its sources; `dirty`
    // marks tiles whose borders changed (only they emit halos)
    var state2 = state
      .as[(Int, Int, Seq[Double], Seq[Double])]
      .map { case (c, r, frS, distS) =>
        val fr = frS.toArray; val dist = distS.toArray
        val seeds = dist.indices.filter(o => !dist(o).isNaN)
        val dirty =
          if (seeds.isEmpty) false
          else { localDijkstra(fr, dist, seeds); true }
        (c, r, frS, dist.toSeq, dirty)
      }
      .toDF("col", "row", "friction", "dist", "dirty")
      .localCheckpoint()

    // halo rounds: dirty tiles ship border candidates; receivers rerun
    // Dijkstra from improved cells; an accumulator decides convergence
    // without an extra per-round count job
    var round = 0
    var active = true
    while (active && round < maxRounds) {
      val improvedAcc = spark.sparkContext.longAccumulator(s"graft_cd_improved_$round")
      val halo = state2.as[(Int, Int, Seq[Double], Seq[Double], Boolean)]
        .flatMap { case (c, r, _, distS, dirty) =>
          if (!dirty) Iterator.empty
          else {
            val dist = distS.toArray
            val out = mutable.ArrayBuffer.empty[(Int, Int, Int, Double, Double)]
            var o = 0
            while (o < dist.length) {
              val d = dist(o)
              if (!d.isNaN) {
                val cx = o % tc; val cy = o / tc
                if (cx == 0 || cx == tc - 1 || cy == 0 || cy == tr - 1) {
                  var dy = -1
                  while (dy <= 1) {
                    var dx = -1
                    while (dx <= 1) {
                      if (dx != 0 || dy != 0) {
                        val gx = cx + dx; val gy = cy + dy
                        // only cells crossing the tile boundary
                        if (gx < 0 || gx >= tc || gy < 0 || gy >= tr) {
                          val ncol = c + (if (gx < 0) -1 else if (gx >= tc) 1 else 0)
                          val nrow = r + (if (gy < 0) -1 else if (gy >= tr) 1 else 0)
                          if (ncol >= 0 && ncol < lc && nrow >= 0 && nrow < lr) {
                            val lx = ((gx % tc) + tc) % tc
                            val ly = ((gy % tr) + tr) % tr
                            val step = if (dx == 0 || dy == 0) 1.0 else Sqrt2
                            out += ((ncol, nrow, ly * tc + lx, d, step))
                          }
                        }
                      }
                      dx += 1
                    }
                    dy += 1
                  }
                }
              }
              o += 1
            }
            out.iterator
          }
        }.toDF("col", "row", "off", "base", "step")
        .groupBy("col", "row")
        .agg(collect_list(struct(col("off"), col("base"), col("step"))).as("cands"))

      state2 = state2.drop("dirty").join(halo, Seq("col", "row"), "left_outer")
        .as[(Int, Int, Seq[Double], Seq[Double], Option[Seq[(Int, Double, Double)]])]
        .map { case (c, r, frS, distS, cands) =>
          val fr = frS.toArray; val dist = distS.toArray
          val seeds = mutable.ArrayBuffer.empty[Int]
          cands.toSeq.flatten.foreach { case (o, base, step) =>
            val f = fr(o)
            if (!f.isNaN) {
              val nd = base + step * f
              if (nd <= maxCost && (dist(o).isNaN || nd < dist(o))) { dist(o) = nd; seeds += o }
            }
          }
          val dirty =
            if (seeds.nonEmpty) { localDijkstra(fr, dist, seeds); improvedAcc.add(1); true }
            else false
          (c, r, frS, dist.toSeq, dirty)
        }
        .toDF("col", "row", "friction", "dist", "dirty")
        .localCheckpoint() // eager: runs the round and fills the accumulator
      active = improvedAcc.value > 0
      round += 1
    }

    friction.copy(df = state2.select(col("col"), col("row"), col("dist").as("tile")))
  }

  /** Cell-level Bellman-Ford variant (kept for cross-checking the
    * tiled implementation in specs).
    */
  def costDistanceCells(friction: RasterLayer, sources: DataFrame, maxIterations: Int = 24,
                   maxCost: Double = Double.MaxValue): DataFrame = {
    val spark = friction.spark
    import spark.implicits._
    val fcells = friction.toCells.select(col("x"), col("y"), col("v").as("cost")).cache()
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) yield (dx, dy)
    val offsetDf = offsets.toDF("dx", "dy")

    // localCheckpoint each round: truncates the logical plan so the
    // lineage (and optimizer work) stays O(1) across iterations instead
    // of O(rounds) — without it the driver heap grows unboundedly.
    var dist = fcells.join(
        sources.select(floor(col("px")).cast("long").as("x"), floor(col("py")).cast("long").as("y")),
        Seq("x", "y"))
      .select(col("x"), col("y"), lit(0.0).as("d"))
      .localCheckpoint()
    var i = 0
    var converged = false
    var lastCount = -1L
    while (i < maxIterations && !converged) {
      val expanded = dist.crossJoin(broadcast(offsetDf))
        .select((col("x") + col("dx")).as("x"), (col("y") + col("dy")).as("y"),
                col("d"), sqrt(col("dx") * col("dx") + col("dy") * col("dy")).as("step"))
        .join(fcells, Seq("x", "y"))
        .select(col("x"), col("y"), (col("d") + col("step") * col("cost")).as("d"))
      val next = dist.unionByName(expanded)
        .groupBy("x", "y").agg(min("d").as("d"))
        .where(col("d") <= maxCost)
        .localCheckpoint()
      val cnt = next.count()
      // stop when the reachable set stops growing (cheap proxy; exact
      // fixpoint would also require cost stability)
      converged = cnt == lastCount && i > 2
      lastCount = cnt
      dist = next
      i += 1
    }
    fcells.unpersist()
    dist
  }
}
