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
      // linear id computed before the pin so the distributed backtrack
      // consumes the SAME checkpointed rows (r21: it re-checkpointed a
      // projection of this frame before — one extra materialization)
      .withColumn("id", col("y") * gridCols + col("x"))
      .localCheckpoint() // one compute: counted for the guard, then collected
    // guard BEFORE materializing on the driver — count() keeps the
    // reachable set distributed, so an over-guard disk routes to the
    // distributed backtrack instead of OOMing the driver collect.
    val nReach = reachDf.count()
    if (nReach > maxDriverCells) return costPathDistributed(reachDf, gridCols, nReach)
    val reach = reachDf.select(col("x"), col("y"), col("d"), col("f"))
      .as[(Long, Long, Double, Double)].collect()
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
  private def costPathDistributed(cells: DataFrame, gridCols: Long,
                                  nReach: Long): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val Sqrt2 = math.sqrt(2.0)
    // cells (x, y, d, f, id) arrive PINNED from the caller — every
    // consumer below (8 shift branches, dest, closing join) scans the
    // checkpointed RDD
    val offs = for { dy <- -1 to 1; dx <- -1 to 1 if dx != 0 || dy != 0 } yield (dx, dy)
    val nbrs = offs.map { case (dx, dy) =>
      val step = if (dx == 0 || dy == 0) 1.0 else Sqrt2
      cells.select((col("x") - dx).as("x"), (col("y") - dy).as("y"),
        col("d").as("nd"), col("id").as("nid"), lit(step).as("step"))
    }.reduce(_ unionAll _)
    // ONE shuffle: the join keys (x, y) determine u = y*gridCols + x
    // bijectively, so aggregating on (x, y) reuses the join's own
    // exchange (r21: the old groupBy(u) re-shuffled the joined rows)
    val next = cells.where(col("d") > 0.0)
      .join(nbrs, Seq("x", "y"))
      .groupBy("x", "y")
      .agg(min(struct((col("nd") + col("step") * col("f")).as("key"),
        col("nid").as("nid"))).as("cand"))
      .select((col("y") * gridCols + col("x")).as("u"), col("cand.nid").as("anc"))
    // dest is ONE row — collect it so round 1's frontier is a local
    // relation (zero-job scans) instead of a checkpointed frame
    val destRow = cells.orderBy(col("d").desc, col("id").asc).limit(1)
      .select(col("id")).as[Long].take(1)
    if (destRow.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)].toDF("seq", "x", "y", "v_u")
    // r21 (guide §8 — the Pregel shape, same as costDistanceTiled's
    // loop): frontier and jump live as KEYED RDDs under one sticky
    // HashPartitioner, so the per-round frontier probe is a NARROW
    // co-partitioned join (zero shuffle on both sides), the grown
    // frontier is a partitioner-aware union (narrow), and only the
    // doubling re-key of the jump table shuffles. Each round is one
    // job with no SQL planning/codegen. Per-step values are the same
    // (anc, seq + len) longs the old DataFrame joins produced.
    // partitions derived from the KNOWN reach size (~24 B/row, target
    // ~1M rows / ~24 MB per partition): a 50k-row disk runs 1-task
    // stages instead of 32, a 100 TB disk still gets one partition per
    // ~24 MB — scale-adaptive, not tuned to either local mode or the
    // cluster (guide §2.2/§2.5)
    val part = new org.apache.spark.HashPartitioner(
      math.min(1L << 20, (nReach >> 20) + 1L).toInt)
    var jump: org.apache.spark.rdd.RDD[(Long, (Long, Long))] =
      next.as[(Long, Long)].rdd
        .map { case (u, anc) => (u, (anc, 1L)) }
        .partitionBy(part)
    jump.localCheckpoint()
    var frontier: org.apache.spark.rdd.RDD[(Long, Long)] =
      spark.sparkContext.parallelize(Seq((destRow.head, 0L)), 1).partitionBy(part)
    frontier.localCheckpoint()
    var frontierRows = 1L
    var done = false
    var rounds = 0
    while (!done && rounds < 48) { // 2^48 hops: unreachable backstop
      // TWO doubling steps ride each materialization. Invariant:
      // entering with frontier = chain nodes at < 2^k hops and jump =
      // exact 2^k jumps, step A adds the nodes at [2^k, 2^{k+1}) and
      // step B — probing with the squared table — those at [2^{k+1},
      // 2^{k+2}): each such node factors uniquely through its ancestor
      // 2^{k+1} hops below, which step A just completed. Added nodes
      // have distinct hop counts, so the unions need no dedup, and
      // emptiness via accumulator is exact (an empty frame counts 0
      // under any retry; inflation only pads frontierRows, at worst
      // triggering the exact cycle re-count below). The chain is
      // contiguous, so no nodes past an empty step B exist: done =
      // step B empty.
      val acc1 = spark.sparkContext.longAccumulator(s"graft_cp_add_$rounds")
      val acc2 = spark.sparkContext.longAccumulator(s"graft_cp_add_${rounds + 1}")
      val added1 = frontier.join(jump, part) // narrow: co-partitioned
        .map { case (_, (seq, (anc, len))) => acc1.add(1); (anc, seq + len) }
        .partitionBy(part)
      val f2 = frontier.union(added1) // partitioner-aware: narrow
      // J_{k+1} = J_k o J_k: re-key by ancestor (one shuffle), compose
      // narrow, re-key back to the node; cached for step B AND the
      // next iteration
      val jump2 = jump
        .map { case (u, (anc, len)) => (anc, (u, len)) }
        .partitionBy(part)
        .join(jump, part) // narrow: both sides co-partitioned
        .map { case (_, ((u, len), (anc2, len2))) => (u, (anc2, len + len2)) }
        .partitionBy(part)
      jump2.localCheckpoint()
      val added2 = f2.join(jump2, part) // narrow
        .map { case (_, (seq, (anc, len))) => acc2.add(1); (anc, seq + len) }
        .partitionBy(part)
      val grown = f2.union(added2) // narrow
      grown.localCheckpoint()
      grown.count() // eager: runs both steps and fills the accumulators
      done = acc2.value == 0
      frontierRows += acc1.value + acc2.value
      frontier = grown
      // the next iteration's frontier spans < 2^{k+2} hops, so it
      // needs 2^{k+2} jumps: square AGAIN (lazy — never materialized
      // when this was the last iteration)
      val jump4 = jump2
        .map { case (u, (anc, len)) => (anc, (u, len)) }
        .partitionBy(part)
        .join(jump2, part)
        .map { case (_, ((u, len), (anc2, len2))) => (u, (anc2, len + len2)) }
        .partitionBy(part)
      jump4.localCheckpoint()
      jump = jump4
      if (frontierRows > nReach) {
        // a simple path visits each reachable cell at most once — more
        // nodes means a zero-friction cycle in the next-hop chain.
        // Accumulator inflation could fake this, so confirm with one
        // exact count before failing loudly (the driver walk's guard).
        val exact = frontier.count()
        require(exact <= nReach,
          s"cost-path backtrack exceeded the $nReach reachable cells — " +
            "zero-friction cycle in the next-hop chain")
        frontierRows = exact
      }
      rounds += 2
    }
    frontier.toDF("node", "seq")
      .join(cells, col("node") === cells("id"))
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

    // consumed exactly once (by the round-0 RDD conversion below), so
    // no pin needed (r21: the old loop read it from a checkpoint)
    val state = friction.df
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
    // marks tiles whose borders changed (only they emit halos).
    //
    // r21 (guide §8 — the Pregel shape): the halo loop runs on a KEYED
    // RDD under a sticky HashPartitioner, so the tile state cogroups
    // with the halo WITHOUT re-shuffling (only the O(changed tiles x
    // perimeter) halo rows move each round), each round is ONE job
    // with no per-round SQL planning/codegen and no encoder round-trip
    // of the tile arrays, and the convergence probe rides the
    // checkpoint materialization as an accumulator exactly as before.
    // Arithmetic is byte-identical: the same relax + localDijkstra
    // code runs on the same arrays in the same order — only the
    // carrier (RDD vs Dataset) changed, and relax order was already
    // immaterial (each candidate min-folds independently).
    val nParts = math.max(1,
      math.min(spark.sparkContext.defaultParallelism.toLong, lc.toLong * lr).toInt)
    val part = new org.apache.spark.HashPartitioner(nParts)
    var rdd = state.as[(Int, Int, Seq[Double], Seq[Double])].rdd
      .map { case (c, r, frS, distS) =>
        val fr = frS.toArray; val dist = distS.toArray
        val seeds = dist.indices.filter(o => !dist(o).isNaN)
        val dirty =
          if (seeds.isEmpty) false
          else { localDijkstra(fr, dist, seeds); true }
        ((c, r), (fr, dist, dirty))
      }
      .partitionBy(part)
    rdd.localCheckpoint()
    rdd.count()

    var round = 0
    var active = true
    while (active && round < maxRounds) {
      val improvedAcc = spark.sparkContext.longAccumulator(s"graft_cd_improved_$round")
      val halo = rdd.flatMap { case ((c, r), (_, dist, dirty)) =>
        if (!dirty) Iterator.empty
        else {
          val out = mutable.ArrayBuffer.empty[((Int, Int), (Int, Double, Double))]
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
                          out += (((ncol, nrow), (ly * tc + lx, d, step)))
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
      }
      // state side is co-partitioned -> narrow; halo rows targeting a
      // missing tile drop out (the old left_outer join kept state rows
      // only, same effect)
      val next = rdd.cogroup(halo, part)
        .flatMapValues { case (states, cands) =>
          states.headOption.iterator.map { case (fr, distOld, _) =>
            val dist = distOld.clone() // cached blocks are shared: never mutate
            val seeds = mutable.ArrayBuffer.empty[Int]
            cands.foreach { case (o, base, step) =>
              val f = fr(o)
              if (!f.isNaN) {
                val nd = base + step * f
                if (nd <= maxCost && (dist(o).isNaN || nd < dist(o))) { dist(o) = nd; seeds += o }
              }
            }
            val dirty =
              if (seeds.nonEmpty) { localDijkstra(fr, dist, seeds); improvedAcc.add(1); true }
              else false
            (fr, dist, dirty)
          }
        }
      next.localCheckpoint()
      next.count() // eager: runs the round and fills the accumulator
      val prev = rdd
      rdd = next
      prev.unpersist(blocking = false)
      active = improvedAcc.value > 0
      round += 1
    }

    friction.copy(df = rdd
      .map { case ((c, r), (_, dist, _)) => (c, r, dist.toSeq) }
      .toDF("col", "row", "tile"))
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
