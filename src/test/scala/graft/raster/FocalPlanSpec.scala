package graft.raster

import org.apache.spark.sql.catalyst.plans.logical.MapGroups
import org.apache.spark.sql.graft.FocalPlan

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

/** Optimizer-level focal fusion: two plain .focal() calls — no
  * explicit focalChain — must compile to ONE halo-gather exchange. */
class FocalPlanSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  private def mkLayer(): RasterLayer = {
    // ragged grid: one absent tile, NoData holes inside present tiles
    val cells = for { x <- 0L until 8L; y <- 0L until 8L
                      if !(x >= 4 && y >= 4) && (x + y) % 7 != 3 }
      yield (x, y, (x * 3 + y * 5 + 1).toDouble)
    RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout)
  }

  test("two .focal() calls fuse to ONE gather (plan-verified) and match sequential eager") {
    val l = mkLayer()
    val fused = l.focal(Neighborhood.Square(1), "Mean").focal(Neighborhood.Square(1), "Max")

    // analysis sees two stacked FocalPlan nodes...
    val analyzed = fused.df.queryExecution.analyzed
    assert(analyzed.collect { case f: FocalPlan => f }.size == 2)
    // ...the optimizer fuses + lowers them to exactly one gather:
    // no FocalPlan survives, and there is ONE MapGroups (= one
    // keyed exchange) in the whole optimized plan
    val optimized = fused.df.queryExecution.optimizedPlan
    assert(optimized.collect { case f: FocalPlan => f }.isEmpty)
    assert(optimized.collect { case m: MapGroups => m }.size == 1)

    // bit-identical to the sequential eager path (two exchanges)
    val seq = Focal.focalChainEager(
      Focal.focalChainEager(l, Seq((Neighborhood.Square(1), FocalOp.Mean))),
      Seq((Neighborhood.Square(1), FocalOp.Max)))
    assert(fused.toCells.as[(Long, Long, Double)].collect().toSet ==
      seq.toCells.as[(Long, Long, Double)].collect().toSet)
  }

  test("explicit focalChain and fused .focal().focal() agree; single focal plans one gather") {
    val l = mkLayer()
    val viaChain = l.focalChain(
      (Neighborhood.Square(1), "Mean"), (Neighborhood.Circle(2.0), "Min"))
    val viaPlan = l.focal(Neighborhood.Square(1), "Mean")
      .focal(Neighborhood.Circle(2.0), "Min")
    assert(viaPlan.toCells.as[(Long, Long, Double)].collect().toSet ==
      viaChain.toCells.as[(Long, Long, Double)].collect().toSet)

    val single = l.focal(Neighborhood.Square(1), "Sum")
    assert(single.df.queryExecution.optimizedPlan
      .collect { case m: MapGroups => m }.size == 1)
    // a downstream op after focal doesn't break lowering
    assert((single + 1.0).toCells.count() > 0)
  }

  test("temporal layers fuse identically (instant key preserved)") {
    val cells = for { x <- 0L until 8L; y <- 0L until 8L; t <- 0L until 2L }
      yield (x, y, t, (x + y * 2 + t * 10).toDouble)
    val l = RasterLayer.fromCellsTemporal(cells.toDF("x", "y", "instant", "v"), layout)
    val fused = l.focal(Neighborhood.Square(1), "Mean").focal(Neighborhood.Square(1), "Max")
    assert(fused.df.queryExecution.optimizedPlan
      .collect { case m: MapGroups => m }.size == 1)
    val seq = Focal.focalChainEager(
      Focal.focalChainEager(l, Seq((Neighborhood.Square(1), FocalOp.Mean))),
      Seq((Neighborhood.Square(1), FocalOp.Max)))
    assert(fused.toCells.as[(Long, Long, Long, Double)].collect().toSet ==
      seq.toCells.as[(Long, Long, Long, Double)].collect().toSet)
  }
}
