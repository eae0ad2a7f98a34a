package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Viewshed — which cells an observer can see over the terrain (the
  * geotrellis `raster.viewshed.R2Viewshed` operation, public; R3
  * reference semantics here): a target is visible when no sampled
  * cell along the sight line subtends an equal-or-greater vertical
  * angle than the target itself.
  *
  * Ray sampling is nearest-neighbor DDA: for a target n = chebyshev
  * steps away, sample k = 1..n-1 at the rounded positions
  * (ox + round(k dx / n), oy + round(k dy / n)) with round(q) =
  * floor(q + 1/2) — stated identically in the oracle. NoData holes
  * along a ray are transparent; samples that round onto the observer
  * or target cells are skipped.
  *
  * Determinism: the angle comparison dz_s / d_s >= dz_t / d_t is
  * evaluated as sign(dz_s) dz_s^2 q_t >= sign(dz_t) dz_t^2 q_s (q =
  * squared distance; sign(u) u^2 is strictly increasing), so the
  * VISIBILITY TEST is exact integer arithmetic — no sqrt, no
  * division. The DDA sample rounding floor((2 k d + n) / (2 n)) is
  * evaluated in IEEE doubles; it is deterministic because the oracle
  * states the bit-identical float expression and the operands stay
  * far below 2^53 (|d| <= radius, n <= radius), so the double math is
  * itself exact for in-range grids.
  *
  * Scale shape: radius-bounded target disk (pushdown filter on the
  * scan), one explode of at most R sample steps per target, one
  * equi-join back to the grid for sample elevations, one groupBy
  * target for the blocked bit, one left join onto the targets. For
  * many observers the same pipeline runs keyed by observer id —
  * nothing is driver-side.
  */
object Viewshed {

  /** @param cells (x, y, v) elevation grid, v integral-valued
    * @param ox,oy observer cell; zObs ABSOLUTE observer eye elevation
    *              (tower height — the observer cell need not exist)
    * @param radius max sight distance in cells (Euclidean)
    * @return (x, y, visible 0/1) for grid cells within the radius */
  def viewshed(cells: DataFrame, ox: Long, oy: Long, zObs: Long,
               radius: Int = 24): DataFrame = {
    val r2 = radius.toLong * radius
    def sq(c: Column): Column = c * c
    def sgn2(c: Column): Column = when(c >= 0, c * c).otherwise(-(c * c))
    val g = cells.select(col("x").cast("long").as("x"),
      col("y").cast("long").as("y"), col("v").cast("long").as("z"))
    val targets = g
      .select(col("x"), col("y"),
        (col("x") - ox).as("dx"), (col("y") - oy).as("dy"),
        (col("z") - zObs).as("dzt"))
      .withColumn("qt", sq(col("dx")) + sq(col("dy")))
      .where(col("qt") <= r2)
      .withColumn("n", greatest(abs(col("dx")), abs(col("dy"))))
      .localCheckpoint() // consumed by the sample explode AND the final join
    // k = 1..n-1 interior samples; round(k d / n) = floor((2 k d + n) / (2 n))
    def rnd(d: Column, k: Column, n: Column): Column =
      floor((lit(2.0) * k * d + n) / (lit(2) * n)).cast("long")
    val samples = targets.where(col("n") >= 2)
      .select(col("x"), col("y"), col("qt"), col("dzt"),
        explode(sequence(lit(1L), col("n") - 1)).as("k"),
        col("dx"), col("dy"), col("n"))
      .select(col("x"), col("y"), col("qt"), col("dzt"),
        (rnd(col("dx"), col("k"), col("n")) + ox).as("sx"),
        (rnd(col("dy"), col("k"), col("n")) + oy).as("sy"))
      .where(!(col("sx") === ox && col("sy") === oy) &&
             !(col("sx") === col("x") && col("sy") === col("y")))
    val blocked = samples
      .join(g.select(col("x").as("sx"), col("y").as("sy"), col("z").as("zs")),
        Seq("sx", "sy"))
      .withColumn("qs", sq(col("sx") - ox) + sq(col("sy") - oy))
      .groupBy("x", "y")
      .agg(max(when(
        sgn2(col("zs") - zObs) * col("qt") >= sgn2(col("dzt")) * col("qs"),
        1L).otherwise(0L)).as("b"))
    targets.join(blocked, Seq("x", "y"), "left")
      .select(col("x"), col("y"),
        when(coalesce(col("b"), lit(0L)) === 0, 1L).otherwise(0L).as("visible"))
  }
}
