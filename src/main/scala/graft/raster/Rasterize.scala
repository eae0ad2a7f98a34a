package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.LayoutDefinition
import graft.vector.Polygon

/** Geometry burning — reference rasterize.py rasterize (:13) /
  * rasterize_features (:86): polygons (each with a burn value) become
  * a tiled layer; overlaps resolve by the CellOp (reference uses
  * zindex priority — Max here, deterministic).
  *
  * Shape: the cell space is generated distributed over each geometry's
  * bbox (spark.range cross), geometries broadcast in the closure, the
  * contains test is a partition-local filter and the tiling is the
  * usual one-shuffle TileBuildAgg. Value-aggregation rasterize of an
  * existing table is `RasterLayer.fromCells` directly.
  */
object Rasterize {

  def features(spark: SparkSession, geoms: Seq[(Polygon, Double)],
               layout: LayoutDefinition, op: CellOp = CellOp.Max): RasterLayer = {
    import spark.implicits._
    val cellDfs = geoms.map { case (poly, value) =>
      val (bxmin, bymin, bxmax, bymax) = poly.bbox
      val x0 = math.max(0L, math.floor(bxmin).toLong)
      val x1 = math.min(layout.tileLayout.totalCols, math.ceil(bxmax).toLong)
      val y0 = math.max(0L, math.floor(bymin).toLong)
      val y1 = math.min(layout.tileLayout.totalRows, math.ceil(bymax).toLong)
      spark.range(x0, x1).select(col("id").as("x"))
        .crossJoin(spark.range(y0, y1).select(col("id").as("y")))
        .as[(Long, Long)]
        .filter { case (x, y) => poly.contains(x + 0.5, y + 0.5) }
        .map { case (x, y) => (x, y, value) }
        .toDF("x", "y", "v")
    }
    RasterLayer.fromCells(cellDfs.reduce(_ unionByName _), layout, op)
  }

  /** Data-driven rasterize: a table of WKT features `(wkt STRING,
    * v DOUBLE)` burns to a layer. Geometries parse IN THE EXECUTORS
    * (one row at a time — the 100 TB shape: feature count scales out,
    * each feature's cell scan is bounded by its bbox), cells flow
    * straight into the usual one-shuffle TileBuildAgg. Overlaps
    * resolve by `op` (Max default, like the reference's zindex
    * priority in rasterize.py:86 rasterize_features). */
  def fromWktTable(features: org.apache.spark.sql.DataFrame,
                   layout: LayoutDefinition, op: CellOp = CellOp.Max): RasterLayer = {
    val spark = features.sparkSession
    import spark.implicits._
    val totC = layout.tileLayout.totalCols
    val totR = layout.tileLayout.totalRows
    val cells = features
      .select(col("wkt").cast("string"), col("v").cast("double"))
      // null wkt/v rows carry no geometry to burn — drop them here
      // rather than NPE inside the executor-side parser
      .where(col("wkt").isNotNull && col("v").isNotNull)
      .as[(String, Double)]
      .flatMap { case (wkt, value) =>
        graft.vector.Wkt.parsePolygons(wkt).iterator.flatMap { poly =>
          val (bxmin, bymin, bxmax, bymax) = poly.bbox
          val x0 = math.max(0L, math.floor(bxmin).toLong)
          val x1 = math.min(totC, math.ceil(bxmax).toLong)
          val y0 = math.max(0L, math.floor(bymin).toLong)
          val y1 = math.min(totR, math.ceil(bymax).toLong)
          for {
            x <- (x0 until x1).iterator
            y <- (y0 until y1).iterator
            if poly.contains(x + 0.5, y + 0.5)
          } yield (x, y, value)
        }
      }
      .toDF("x", "y", "v")
    RasterLayer.fromCells(cells, layout, op)
  }

  /** Tile keys whose extent intersects a geometry (GRID coordinates,
    * like maskGrid) — reference key_conversion.py geometry_to_keys:
    * the tile-level pruning set a geometry-scoped catalog read needs.
    *
    * Exact for the supported geometry kinds: a tile intersects a
    * polygon iff (a) a tile corner is inside it, (b) one of its
    * vertices is inside the tile, or (c) a ring edge crosses the tile
    * — (c) enumerated by the same Amanatides–Woo traversal run on the
    * TILE grid. Holes fall out of contains(): a tile wholly inside a
    * hole triggers none of the three. Points/lines via floor / pure
    * traversal. Driver-side: key counts are bounded by the geometry's
    * bbox in tiles, not by the layer. */
  /** Fractional-coverage rasterization of axis-aligned rectangles —
    * the anti-aliased burn (each cell gets the EXACT area of
    * rect ∩ cell, summed over features) a cell-center rasterize
    * approximates. Quarter-aligned coordinates double to exact
    * integer quarter-units, so per-cell coverage is an exact integer
    * in 1/16-cell² units (`cov_q`) — no float ever enters.
    *
    * Scale shape: each rect explodes to the bounded cell range it
    * covers (clamped to the layout, `maxCellsPerRect` guard with a
    * loud failure — the IDW disk discipline), one (x, y) groupBy
    * sums coverage with map-side combine.
    *
    * @param rects (fid, x0, y0, x1, y1) in grid coords, quarter-aligned
    * @return (x, y, cov_q) — coverage in 1/16-cell² integer units */
  def fromRectsCoverage(rects: DataFrame, layout: LayoutDefinition,
                        maxCellsPerRect: Long = 1L << 20): DataFrame =
    fromRectsCoverageByZone(rects.withColumn("zone", col("fid")),
        layout, maxCellsPerRect)
      .groupBy("x", "y").agg(sum("cov_q").cast("long").as("cov_q"))

  /** [[fromRectsCoverage]] keyed by a `zone` column — the coverage
    * half of [[ZonalOps.zonalStatsCoverage]]'s exactextract-style
    * area-weighted zonal statistics: overlapping rects of DIFFERENT
    * zones stay separate (zone, x, y, cov_q) rows instead of merging.
    * Same quarter-unit exact-integer arithmetic and per-rect guard. */
  def fromRectsCoverageByZone(rects: DataFrame, layout: LayoutDefinition,
                              maxCellsPerRect: Long = 1L << 20): DataFrame = {
    val gx = layout.tileLayout.totalCols
    val gy = layout.tileLayout.totalRows // per-axis clamp (r12 advice:
    // a totalCols clamp on y truncated/burned outside non-square grids)
    def q(c: Column) = round(c * 4).cast("long") // quarter-units, exact
    val clamped = rects.select(
        col("zone").cast("long").as("zone"),
        greatest(q(col("x0")), lit(0L)).as("sx0"),
        least(q(col("x1")), lit(4L * gx)).as("sx1"),
        greatest(q(col("y0")), lit(0L)).as("sy0"),
        least(q(col("y1")), lit(4L * gy)).as("sy1"))
      .where(col("sx1") > col("sx0") && col("sy1") > col("sy0"))
    // `div`, never `/`: Column division is IEEE double (the recurring
    // integer-quotient trap); coords are clamped nonneg so div == floor
    val spans = clamped.select(col("zone"), col("sx0"), col("sx1"), col("sy0"), col("sy1"),
      expr("(sx1 - 1) div 4 - sx0 div 4 + 1").as("ncx"),
      expr("(sy1 - 1) div 4 - sy0 div 4 + 1").as("ncy"))
    val tooBig = spans.where(col("ncx") * col("ncy") > maxCellsPerRect).limit(1).count()
    require(tooBig == 0,
      s"a rectangle covers more than maxCellsPerRect=$maxCellsPerRect cells; " +
        "raise the ceiling or pre-clip the features")
    spans
      .select(col("zone"), col("sx0"), col("sx1"), col("sy0"), col("sy1"),
        explode(expr("sequence(sx0 div 4, (sx1 - 1) div 4)")).as("cx"))
      .select(col("zone"), col("sx0"), col("sx1"), col("sy0"), col("sy1"), col("cx"),
        explode(expr("sequence(sy0 div 4, (sy1 - 1) div 4)")).as("cy"))
      .select(col("zone"), col("cx").as("x"), col("cy").as("y"),
        ((least(col("sx1"), (col("cx") + 1) * 4) - greatest(col("sx0"), col("cx") * 4)) *
         (least(col("sy1"), (col("cy") + 1) * 4) - greatest(col("sy0"), col("cy") * 4))).as("wq"))
      .groupBy("zone", "x", "y").agg(sum("wq").cast("long").as("cov_q"))
  }

  def geometryToKeys(layout: LayoutDefinition, g: graft.vector.Wkt.Geom): Seq[(Int, Int)] = {
    val tl = layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val (lc, lr) = (tl.layoutCols, tl.layoutRows)
    def inBounds(k: (Long, Long)) = k._1 >= 0 && k._2 >= 0 && k._1 < lc && k._2 < lr
    def keyOf(x: Double, y: Double): (Long, Long) =
      (math.floor(x / tc).toLong, math.floor(y / tr).toLong)
    def lineKeys(ps: IndexedSeq[graft.vector.Pt]): Iterator[(Long, Long)] =
      ps.iterator.zip(ps.iterator.drop(1)).flatMap { case (a, b) =>
        traverse(a.x / tc, a.y / tr, b.x / tc, b.y / tr, lc, lr)
      }
    def polyKeys(p: Polygon): Iterator[(Long, Long)] = {
      val rings = p.exterior +: p.holes
      // (b) vertices' tiles + (c) edge-crossed tiles (rings closed)
      val boundary = rings.iterator.flatMap { ring =>
        lineKeys(if (ring.length > 1) ring :+ ring.head else ring)
      }
      // (a) tiles with a corner inside the polygon, over the bbox
      val (bxmin, bymin, bxmax, bymax) = p.bbox
      val c0 = math.max(0L, math.floor(bxmin / tc).toLong - 1)
      val c1 = math.min(lc - 1L, math.floor(bxmax / tc).toLong + 1)
      val r0 = math.max(0L, math.floor(bymin / tr).toLong - 1)
      val r1 = math.min(lr - 1L, math.floor(bymax / tr).toLong + 1)
      val corners = for {
        c <- (c0 to c1).iterator
        r <- (r0 to r1).iterator
        if Seq((c * tc, r * tr), ((c + 1) * tc, r * tr),
               (c * tc, (r + 1) * tr), ((c + 1) * tc, (r + 1) * tr))
          .exists { case (x, y) => p.contains(x.toDouble, y.toDouble) }
      } yield (c, r)
      boundary ++ corners
    }
    val keys: Iterator[(Long, Long)] = g match {
      case graft.vector.Wkt.PointG(p)            => Iterator.single(keyOf(p.x, p.y))
      case graft.vector.Wkt.MultiPointG(ps)      => ps.iterator.map(p => keyOf(p.x, p.y))
      case graft.vector.Wkt.LineStringG(ps)      => lineKeys(ps)
      case graft.vector.Wkt.MultiLineStringG(ls) => ls.iterator.flatMap(lineKeys)
      case graft.vector.Wkt.PolygonG(p)          => polyKeys(p)
      case graft.vector.Wkt.MultiPolygonG(ps)    => ps.iterator.flatMap(polyKeys)
    }
    keys.filter(inBounds).map(k => (k._1.toInt, k._2.toInt)).toSet.toSeq.sorted
  }

  /** All cells a segment passes through — Amanatides–Woo grid
    * traversal (unit cells), endpoints inclusive. The line-burn
    * primitive behind LINESTRING rasterize (GDAL all-touched
    * semantics). */
  private[raster] def traverse(x0: Double, y0: Double, x1: Double, y1: Double,
                               totC: Long, totR: Long): Iterator[(Long, Long)] = {
    val dx = x1 - x0; val dy = y1 - y0
    var cx = math.floor(x0).toLong; var cy = math.floor(y0).toLong
    val ex = math.floor(x1).toLong; val ey = math.floor(y1).toLong
    val stepX = if (dx > 0) 1L else if (dx < 0) -1L else 0L
    val stepY = if (dy > 0) 1L else if (dy < 0) -1L else 0L
    // parametric distance to the next vertical / horizontal grid line
    var tMaxX = if (stepX == 0) Double.PositiveInfinity
                else if (stepX > 0) (cx + 1 - x0) / dx else (cx - x0) / dx
    var tMaxY = if (stepY == 0) Double.PositiveInfinity
                else if (stepY > 0) (cy + 1 - y0) / dy else (cy - y0) / dy
    val tDeltaX = if (stepX == 0) Double.PositiveInfinity else math.abs(1.0 / dx)
    val tDeltaY = if (stepY == 0) Double.PositiveInfinity else math.abs(1.0 / dy)
    val cells = Iterator.single((cx, cy)) ++ new Iterator[(Long, Long)] {
      def hasNext: Boolean = (cx, cy) != ((ex, ey))
      def next(): (Long, Long) = {
        if (tMaxX < tMaxY) { cx += stepX; tMaxX += tDeltaX }
        else               { cy += stepY; tMaxY += tDeltaY }
        (cx, cy)
      }
    }
    cells.filter { case (x, y) => x >= 0 && y >= 0 && x < totC && y < totR }
  }

  /** General data-driven rasterize — the reference rasterize
    * (rasterize.py:13) accepts ANY geometry kind: POLYGON /
    * MULTIPOLYGON area-fill (cell-center-in-polygon), LINESTRING
    * all-touched grid traversal, POINT / MULTIPOINT single cells.
    * Same executor-side parse + one-shuffle TileBuildAgg shape as
    * [[fromWktTable]]. */
  def fromWktFeatures(features: org.apache.spark.sql.DataFrame,
                      layout: LayoutDefinition, op: CellOp = CellOp.Max): RasterLayer = {
    val spark = features.sparkSession
    import spark.implicits._
    val totC = layout.tileLayout.totalCols
    val totR = layout.tileLayout.totalRows
    def polyCells(poly: Polygon): Iterator[(Long, Long)] = {
      val (bxmin, bymin, bxmax, bymax) = poly.bbox
      val x0 = math.max(0L, math.floor(bxmin).toLong)
      val x1 = math.min(totC, math.ceil(bxmax).toLong)
      val y0 = math.max(0L, math.floor(bymin).toLong)
      val y1 = math.min(totR, math.ceil(bymax).toLong)
      for {
        x <- (x0 until x1).iterator
        y <- (y0 until y1).iterator
        if poly.contains(x + 0.5, y + 0.5)
      } yield (x, y)
    }
    def pointCell(p: graft.vector.Pt): Iterator[(Long, Long)] = {
      val x = math.floor(p.x).toLong; val y = math.floor(p.y).toLong
      if (x >= 0 && y >= 0 && x < totC && y < totR) Iterator.single((x, y))
      else Iterator.empty
    }
    val cells = features
      .select(col("wkt").cast("string"), col("v").cast("double"))
      .where(col("wkt").isNotNull && col("v").isNotNull)
      .as[(String, Double)]
      .flatMap { case (wkt, value) =>
        val touched: Iterator[(Long, Long)] = graft.vector.Wkt.parse(wkt) match {
          case graft.vector.Wkt.PolygonG(p)       => polyCells(p)
          case graft.vector.Wkt.MultiPolygonG(ps) => ps.iterator.flatMap(polyCells)
          case graft.vector.Wkt.PointG(p)         => pointCell(p)
          case graft.vector.Wkt.MultiPointG(ps)   => ps.iterator.flatMap(pointCell)
          case graft.vector.Wkt.LineStringG(ps)   =>
            ps.iterator.zip(ps.iterator.drop(1)).flatMap { case (a, b) =>
              traverse(a.x, a.y, b.x, b.y, totC, totR)
            }
          case graft.vector.Wkt.MultiLineStringG(ls) =>
            ls.iterator.flatMap(ps =>
              ps.iterator.zip(ps.iterator.drop(1)).flatMap { case (a, b) =>
                traverse(a.x, a.y, b.x, b.y, totC, totR)
              })
        }
        // a geometry can touch a cell more than once (ring vertices,
        // segment joints) — dedup before the value aggregation
        touched.toSet.iterator.map((c: (Long, Long)) => (c._1, c._2, value))
      }
      .toDF("x", "y", "v")
    RasterLayer.fromCells(cells, layout, op)
  }
}
