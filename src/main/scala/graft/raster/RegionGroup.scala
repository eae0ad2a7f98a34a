package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Region grouping — connected components over equal-valued cells
  * (the geotrellis RegionGroup operation, public; geopyspark exposes
  * the same semantics through its layer API). Each maximal 4- or
  * 8-connected set of cells sharing a class value becomes one region;
  * the region id is the minimum linear cell id (y * gridCols + x) in
  * the region, so labels are canonical and engine-restatable.
  *
  * Scale shape: neighbor edges come from `connectivity`/2 equi-joins
  * of the cell set with itself on shifted keys (hash-partitioned on
  * (x, y, cls) — distributed, no driver state), then the alternating
  * large-star/small-star component algorithm (O(log n) rounds,
  * diameter-independent — a continent-sized region converges as fast
  * as a puddle). Edge count is bounded by connectivity * n / 2, and
  * isolated cells never enter the loop (they come back as singleton
  * regions from the vertex union).
  */
object RegionGroup {

  /** @param cells (x, y, cls) — cls is the class value; NoData cells
    *              are simply absent from the input
    * @param gridCols linear-id stride (layout total columns)
    * @param connectivity 4 (edge-adjacent) or 8 (corner-adjacent too)
    * @return (x, y, cls, region) */
  def regionGroup(cells: DataFrame, gridCols: Long,
                  connectivity: Int = 4): DataFrame = {
    require(connectivity == 4 || connectivity == 8,
      "connectivity must be 4 or 8")
    // consumed by every shifted self-join plus the vertex set: pin it
    // (CLAUDE.md iterative-loop rule — the CC loop downstream must not
    // re-run the upstream aggregation per round either)
    val g = cells.select(col("x").cast("long").as("x"),
        col("y").cast("long").as("y"), col("cls").cast("long").as("cls"))
      .withColumn("id", col("y") * gridCols + col("x"))
      .localCheckpoint()
    val offsets =
      if (connectivity == 4) Seq((1, 0), (0, 1))
      else Seq((1, 0), (0, 1), (1, 1), (1, -1))
    val edges = offsets.map { case (dx, dy) =>
      g.as("a").join(g.as("b"),
          col("b.x") === col("a.x") + dx && col("b.y") === col("a.y") + dy &&
            col("b.cls") === col("a.cls"))
        .select(col("a.id").as("d1"), col("b.id").as("d2"))
    }.reduce(_ union _)
    val comp = graft.pipeline.Dedup.connectedComponents(
      edges, g.select(col("id").as("doc_id")))
    g.join(comp, g("id") === comp("doc_id"))
      .select(col("x"), col("y"), col("cls"), col("component").as("region"))
  }
}
