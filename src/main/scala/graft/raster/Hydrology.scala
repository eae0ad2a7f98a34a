package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hydrology operators over elevation grids — the geotrellis
  * `raster.hydrology` surface (FlowDirection / Accumulation, public
  * ESRI D8 semantics) re-expressed declaratively.
  *
  * D8 flow direction: each cell drains toward the neighbor with the
  * steepest positive drop (z_c - z_n, diagonals divided by sqrt 2);
  * codes are the ESRI powers of two (E=1, SE=2, S=4, SW=8, W=16,
  * NW=32, N=64, NE=128, y-down grid), 0 for pits/flats. Ties break to
  * the smallest code via an explicit CASE cascade — the same cascade
  * the oracle states, so the choice is engine-identical (drops are
  * exact-integer differences with at most one IEEE division each).
  *
  * Scale shape: ONE shuffle. Every cell explodes to itself plus its
  * eight neighbor targets (the IDW disk pattern at radius 1), and a
  * single groupBy rebuilds each cell's 3x3 neighborhood as nine
  * conditional aggregates — map-side combine, no self-joins, no halo
  * machinery needed for a radius-1 stencil. Missing neighbors (grid
  * edge or NoData holes) coalesce to a -inf sentinel and can never
  * win the cascade.
  */
object Hydrology {

  /** (dx, dy, ESRI code) in ascending code order — the tie cascade. */
  val Dirs: Seq[(Int, Int, Int)] = Seq(
    (1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
    (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128))

  private val Sentinel = -1e300

  /** @param cells (x, y, v) elevation grid; absent cells are NoData
    * @return (x, y, dir) — dir 0 for pits/flats */
  def flowDirection(cells: DataFrame, gridCols: Long, gridRows: Long): DataFrame = {
    val z = cells.select(col("x").cast("long").as("x"),
      col("y").cast("long").as("y"), col("v").cast("double").as("z"))
    // cell -> (target, code-at-target): from the target's view the
    // contributor sits at the OPPOSITE offset, so code labels use the
    // target-relative direction
    val contrib = z.select(explode(array(
        struct(col("x").as("tx"), col("y").as("ty"), lit(0).as("code"), col("z")) +:
        Dirs.map { case (dx, dy, code) =>
          struct((col("x") - dx).as("tx"), (col("y") - dy).as("ty"),
            lit(code).as("code"), col("z"))
        }: _*)).as("c"))
      .select(col("c.tx").as("x"), col("c.ty").as("y"), col("c.code"), col("c.z"))
      .where(col("x") >= 0 && col("x") < gridCols &&
             col("y") >= 0 && col("y") < gridRows)
    val nbrs = contrib.groupBy("x", "y")
      .agg(max(when(col("code") === 0, col("z"))).as("zc"),
        Dirs.map { case (_, _, code) =>
          max(when(col("code") === code, col("z"))).as(s"n$code")
        }: _*)
      .where(col("zc").isNotNull)
    def drop(code: Int, dx: Int, dy: Int): Column = {
      val d = (col("zc") - col(s"n$code")) /
        (if (dx != 0 && dy != 0) sqrt(lit(2.0)) else lit(1.0))
      coalesce(d, lit(Sentinel))
    }
    val drops = Dirs.map { case (dx, dy, code) => code -> drop(code, dx, dy) }
    val best = greatest(drops.map(_._2): _*)
    val dir = drops.foldLeft(when(best <= 0, lit(0))) { case (acc, (code, d)) =>
      acc.when(d === best, lit(code))
    }
    nbrs.select(col("x"), col("y"), dir.cast("long").as("dir"))
  }

  /** Pit fill (geotrellis raster.hydrology Fill semantics, single
    * pass): a sink — a cell strictly lower than all eight neighbors —
    * rises to the neighbor minimum so D8 flow has an out-edge there;
    * everything else (including edge cells with partial windows)
    * passes through unchanged. Exact: min/select over integral cells
    * introduces no floating error. One halo exchange via the terrain
    * window machinery. */
  def fill(layer: RasterLayer): RasterLayer = Focal.terrain(layer, "fill")

  /** Flow accumulation: for each cell, how many other cells' D8 flow
    * paths pass through it (the upstream drainage count; ESRI
    * Accumulation semantics with unit cell weight). Tokens start one
    * per cell and walk the single-out-edge flow graph to the pit;
    * every visit increments the visited cell.
    *
    * Scale shape: the flow graph has exactly one out-edge per cell, so
    * each round is one equi-join (frontier x edges) + one fold into
    * the per-cell counts, localCheckpoint'd per round (CLAUDE.md
    * iterative rule). Round count = the longest flow path — bounded
    * by terrain correlation length, not grid size, for hash-noise or
    * real DEM surfaces; `maxSteps` fails loudly rather than looping.
    * Small grids take a guarded driver walk instead (one collect of
    * the <= `maxDriverEdges` out-edges beats per-round job overhead;
    * the connectedComponents fast path is the precedent).
    */
  def flowAccumulation(cells: DataFrame, gridCols: Long, gridRows: Long,
                       maxSteps: Int = 0,
                       maxDriverEdges: Long = 1L << 22): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    // default bound: strict-descent D8 never revisits a cell, so no
    // path exceeds the cell count — real DEMs with long drainage
    // channels must not fail on an arbitrary small default (64 did)
    val maxSteps0 = if (maxSteps > 0) maxSteps
      else math.min(gridCols * gridRows, Int.MaxValue.toLong).toInt
    val dirs = flowDirection(cells, gridCols, gridRows).localCheckpoint()
    // (from, to) one edge per non-pit cell
    val edge = dirs.where(col("dir") =!= 0)
      .select((col("y") * gridCols + col("x")).as("from"),
        Dirs.map { case (dx, dy, code) =>
          when(col("dir") === code,
            (col("y") + dy) * gridCols + (col("x") + dx))
        }.reduce(coalesce(_, _)).as("to"))
      .localCheckpoint()
    if (edge.count() <= maxDriverEdges) {
      val next = new scala.collection.mutable.HashMap[Long, Long]()
      edge.as[(Long, Long)].collect().foreach { case (f, t) => next(f) = t }
      val acc = new scala.collection.mutable.HashMap[Long, Long]()
      next.keysIterator.foreach { start =>
        var cur = next.get(start)
        var hops = 0
        while (cur.isDefined) {
          require(hops <= maxSteps0, s"flowAccumulation: path longer than " +
            s"$maxSteps0 steps — raise maxSteps")
          val c = cur.get
          acc(c) = acc.getOrElse(c, 0L) + 1
          cur = next.get(c)
          hops += 1
        }
      }
      val lab = broadcast(acc.toSeq.toDF("id", "cnt"))
      return dirs.join(lab, (col("y") * gridCols + col("x")) === lab("id"), "left")
        .select(col("x"), col("y"), coalesce(col("cnt"), lit(0L)).cast("long").as("acc"))
    }
    var frontier = edge.groupBy(col("to").as("id"))
      .agg(count(lit(1)).cast("long").as("cnt")).localCheckpoint()
    val rounds = scala.collection.mutable.ListBuffer(frontier)
    var step = 0
    while (step < maxSteps0 && !frontier.isEmpty) {
      frontier = frontier.join(edge, frontier("id") === edge("from"))
        .groupBy(col("to").as("id")).agg(sum("cnt").as("cnt"))
        .localCheckpoint()
      rounds += frontier
      step += 1
    }
    require(frontier.isEmpty,
      s"flowAccumulation: paths longer than $maxSteps0 steps — raise maxSteps " +
      "(or the flow graph has a cycle, which strict-descent D8 cannot produce)")
    // fold all per-round visit counts in ONE aggregation at the end
    // instead of a union+groupBy per round
    val acc = rounds.reduce(_ union _).groupBy("id").agg(sum("cnt").as("cnt"))
    dirs.join(acc, (col("y") * gridCols + col("x")) === acc("id"), "left")
      .select(col("x"), col("y"), coalesce(col("cnt"), lit(0L)).cast("long").as("acc"))
  }
}
