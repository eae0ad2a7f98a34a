package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.vector.Polygon

/** Zonal / polygonal / masking operators.
  *
  * Reference surface: layer.py mask (:2044), polygonal_min/max/sum/mean
  * (:2392-2464), get_cell_value_counts (:2347), get_point_values
  * (:2215), *_series over geometries (:2014-2040).
  *
  * Scale shape (SURVEY §4): geometries are tiny and ride the closure
  * (broadcast); masking is a narrow per-tile map; summaries are
  * partial-aggregated per tile before the final reduce — no per-cell
  * shuffle ever.
  */
object ZonalOps {

  /** Mask: keep cells whose center falls inside any polygon
    * (reference layer.py:2044). Native codegen'd expression
    * (TileMaskExpr), per-tile, no shuffle — the tile never leaves the
    * unsafe row, unlike the r7 UDF that boxed every tile to a
    * Seq[Double] and back. */
  def mask(layer: RasterLayer, polys: Seq[Polygon]): RasterLayer = {
    val layout = layer.meta.layout
    val tl = layout.tileLayout
    layer.copy(df = layer.df.withColumn("tile",
      org.apache.spark.sql.graft.TileMaskExpr.maskTileWorld(
        col("col"), col("row"), col("tile"), polys, tl.tileCols, tl.tileRows,
        layout.extent.xmin, layout.cellWidth, layout.extent.ymax, layout.cellHeight)))
  }

  /** Grid-coordinate mask variant for unit layouts where the oracle
    * speaks grid coords directly (y-down, no extent flip). */
  def maskGrid(layer: RasterLayer, polys: Seq[Polygon]): RasterLayer = {
    val tl = layer.meta.layout.tileLayout
    layer.copy(df = layer.df.withColumn("tile",
      org.apache.spark.sql.graft.TileMaskExpr.maskTileGrid(
        col("col"), col("row"), col("tile"), polys, tl.tileCols, tl.tileRows)))
  }

  /** Erosion (negative-buffer) mask in grid coords: keep cells whose
    * center lies in erode(poly, d) — inside the polygon AND at least
    * d from its boundary. Works on ANY simple ring, concave included
    * (the JTS `buffer(-d)`→mask workflow); Buffer.erodePieces supplies
    * the (interior, boundary-corridor) containment-test pair and the
    * whole test runs in ONE codegen'd per-tile pass, no shuffle. */
  def erodeMaskGrid(layer: RasterLayer, poly: Polygon, d: Double,
                    join: graft.vector.Buffer.Join = graft.vector.Buffer.Round(8)): RasterLayer = {
    val (keep, drop) = graft.vector.Buffer.erodePieces(poly, d, join)
    val tl = layer.meta.layout.tileLayout
    layer.copy(df = layer.df.withColumn("tile",
      org.apache.spark.sql.graft.TileMaskExpr.erodeTileGrid(
        col("col"), col("row"), col("tile"), keep, drop, tl.tileCols, tl.tileRows)))
  }

  /** Polygonal summary: min/max/sum/mean/count of cells inside the
    * polygon, one output row (reference polygonal_* layer.py:2392-2464).
    * Partial aggregation per tile -> single global combine. */
  def polygonalSummary(layer: RasterLayer, poly: Polygon): DataFrame = {
    def nanNull(c: Column) = when(isnan(c), lit(null)).otherwise(c)
    val masked = maskGrid(layer, Seq(poly))
    masked.df
      .select(org.apache.spark.sql.graft.TileStatsExpr.tileStats(col("tile")).as("st"))
      .select(
        sum(col("st.vsum")).as("vsum"),
        sum(col("st.vcnt")).cast("long").as("vcount"),
        min(nanNull(col("st.vmin"))).as("vmin"),
        max(nanNull(col("st.vmax"))).as("vmax"))
      .select(col("vsum"), col("vcount"), col("vmin"), col("vmax"),
              (col("vsum") / col("vcount")).as("vmean"))
  }

  /** Per-geometry summary series — reference histogram/mean/max/min/
    * sum_series (layer.py:2014-2040): one summary row per geometry
    * (geometries may overlap; each is summarized independently).
    *
    * ONE scan for the whole geometry list (r7 ran one masked scan per
    * geometry — fine at "a few", quadratic waste at a county table):
    * the geometries ride the closure, each tile emits per-geometry
    * partials (sum/count/min/max), and a single partial-aggregated
    * groupBy(gid) reduces them — the zonalStats shape. Geometries with
    * no covered cells still get their row (vcount 0, null stats, as
    * the SQL twin's empty aggregate) via the broadcast gid-universe
    * join. Exactly one shuffle Exchange regardless of |geoms|. */
  def summarySeries(layer: RasterLayer, geoms: Seq[Polygon]): DataFrame = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val polys = geoms.toArray
    val partials = udf { (c: Int, r: Int, tile: Seq[Double]) =>
      val arr = tile.toArray // encoder Seq is a List — never index it
      val out = Seq.newBuilder[(Int, Double, Long, Double, Double)]
      var g = 0
      while (g < polys.length) {
        val poly = polys(g)
        var s = 0.0; var n = 0L
        var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
        var j = 0
        while (j < tr) {
          var i = 0
          while (i < tc) {
            val v = arr(j * tc + i)
            if (!v.isNaN) {
              val gx = c.toLong * tc + i + 0.5
              val gy = r.toLong * tr + j + 0.5
              if (poly.contains(gx, gy)) {
                s += v; n += 1
                if (v < mn) mn = v
                if (v > mx) mx = v
              }
            }
            i += 1
          }
          j += 1
        }
        if (n > 0) out += ((g, s, n, mn, mx))
        g += 1
      }
      out.result()
    }
    val spark = layer.df.sparkSession
    val gids = spark.range(geoms.length).select(col("id").cast("int").as("gid"))
    val agg = layer.df
      .select(explode(partials(col("col"), col("row"), col("tile"))).as("p"))
      .groupBy(col("p._1").as("gid"))
      .agg(sum(col("p._2")).as("vsum"), sum(col("p._3")).cast("long").as("vcount"),
           min(col("p._4")).as("vmin"), max(col("p._5")).as("vmax"))
    gids.join(broadcast(agg), Seq("gid"), "left")
      .select(col("gid"), col("vsum"),
        coalesce(col("vcount"), lit(0L)).as("vcount"),
        col("vmin"), col("vmax"),
        (col("vsum") / col("vcount")).as("vmean"))
  }

  /** Temporal per-geometry series — reference star_series and its
    * mean/max/min/sum_series family (layer.py:2014-2042): summarize
    * the cells inside a geometry separately at EACH instant of a
    * space-time layer. Masked cells partial-aggregate per instant
    * map-side, so only one row per (instant, partition) crosses the
    * exchange (same shape as zonalStats).
    *
    * Sums go through DECIMAL(18,6): cell values are decimal-quantized,
    * so a float sum's last ulp depends on reduction order and a
    * rounded mean can flip at a boundary (bit Spark and the DuckDB
    * oracle differently — observed flaky). Exact decimal sums + one
    * double division are deterministic with no rounding at all. */
  def temporalSeries(layer: RasterLayer, poly: Polygon): DataFrame = {
    require(layer.meta.temporal, "star_series requires a space-time layer")
    maskGrid(layer, Seq(poly)).toCells
      .groupBy(col("instant"))
      .agg(sum(col("v").cast("decimal(18,6)")).as("_dsum"),
           count(lit(1)).as("vcount"), min("v").as("vmin"), max("v").as("vmax"))
      .select(col("instant"), col("_dsum").cast("double").as("vsum"), col("vcount"),
        col("vmin"), col("vmax"),
        (col("_dsum").cast("double") / col("vcount")).as("vmean"))
  }

  /** Temporal histogram series — reference histogram_series
    * (layer.py:2024): an equal-width histogram of the cells inside a
    * geometry at EACH instant, bins spanning that instant's own
    * min/max (each instant is its own fastHistogram in the reference).
    * The per-instant min/max table is tiny (one row per instant) so
    * the join broadcasts; a constant-valued instant (mx == mn) puts
    * everything in bin 0 on both sides. */
  def histogramSeries(layer: RasterLayer, poly: Polygon, bins: Int = 10): DataFrame = {
    require(layer.meta.temporal, "histogram_series requires a space-time layer")
    val cells = maskGrid(layer, Seq(poly)).toCells
    val mm = cells.groupBy("instant").agg(min("v").as("mn"), max("v").as("mx"))
    cells.join(broadcast(mm), "instant")
      .select(col("instant"),
        when(col("mx") > col("mn"),
          least(floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / bins)),
            lit(bins - 1.0)).cast("long"))
          .otherwise(lit(0L)).as("bin"))
      .groupBy("instant", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Zonal statistics of `values` grouped by the co-located `zones`
    * layer (reference *_series :2014-2040 generalized). Tile-aligned
    * join then per-tile pair explode feeding a partial-aggregated
    * groupBy zone — the per-cell rows exist only inside the exchange-
    * free map stage. */
  def zonalStats(values: RasterLayer, zones: RasterLayer): DataFrame = {
    val spark = values.spark
    import spark.implicits._
    val v = values.df.select(col("col"), col("row"), col("tile").as("_v"))
    val z = zones.df.select(col("col"), col("row"), col("tile").as("_z"))
    // per-PARTITION Scala partials instead of a per-cell explode: the
    // arrays_zip/explode form burned one codegen row per cell; here
    // only |zones| rows per partition cross the exchange. Sums stay
    // order-free because cells are integral-valued doubles (the
    // oracle-determinism contract); the single mean division happens
    // once at the end, same as avg().
    val parts = v.join(z, Seq("col", "row"))
      .select(col("_v"), col("_z")).as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[Long, (Long, Double, Double, Double)]
        it.foreach { case (vs, zs) =>
          val va = vs.toArray; val za = zs.toArray // List apply is O(n)
          var i = 0
          while (i < va.length) {
            val vv = va(i); val zz = za(i)
            if (!vv.isNaN && !zz.isNaN) {
              val k = zz.toLong
              val cur = acc.getOrElse(k,
                (0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
              acc(k) = (cur._1 + 1, cur._2 + vv,
                math.min(cur._3, vv), math.max(cur._4, vv))
            }
            i += 1
          }
        }
        acc.iterator.map { case (k, (c, s, mn, mx)) => (k, c, s, mn, mx) }
      }.toDF("zone", "cnt", "vsum", "vmin", "vmax")
    parts.groupBy("zone")
      .agg(sum("cnt").as("cnt"), sum("vsum").as("vsum"),
           min("vmin").as("vmin"), max("vmax").as("vmax"))
      .withColumn("vmean", col("vsum") / col("cnt"))
      .select(col("zone"), col("cnt"), col("vsum"), col("vmin"), col("vmax"), col("vmean"))
  }

  /** Zonal majority / minority / variety (the geotrellis
    * `Zonal.majority`/`minority` summaries over a zone raster): per
    * zone, the most and least frequent cell VALUE (ties break to the
    * smallest value — the focal Mode/Minority rule) and the distinct
    * value count.
    *
    * Scale shape: the same per-partition Scala partial as
    * [[zonalStats]], keyed by (zone, value) — only |zones x distinct
    * values| rows per partition cross the first exchange; the second
    * aggregation collapses to |zones| rows with min-struct argmax /
    * argmin (map-side combine both times, no windows). Values follow
    * the integral-cell oracle contract.
    *
    * @return (zone, variety, majority, minority) */
  def zonalMajority(values: RasterLayer, zones: RasterLayer): DataFrame =
    zoneValueCounts(values, zones)
      .groupBy("zone")
      .agg(count(lit(1)).as("variety"),
        min(struct((-col("cnt")).as("nc"), col("v"))).as("mj"),
        min(struct(col("cnt").as("c"), col("v"))).as("mn"))
      .select(col("zone"), col("variety"),
        col("mj.v").as("majority"), col("mn.v").as("minority"))

  /** Zonal histogram / tabulate-area (the ESRI `ZonalHistogram` /
    * `TabulateArea` cross-tabulation): per (zone, cell value) the cell
    * count — i.e. the long-form zone x class contingency table land-
    * cover analyses pivot into "area of each class within each zone".
    * Area in map units is `cnt * cellWidth * cellHeight` (cell size 1
    * on the oracle grid, so counts ARE areas there).
    *
    * Scale shape: identical to [[zonalMajority]]'s first phase — per-
    * partition Scala partials keyed by (zone, value), ONE exchange of
    * |zones x classes| rows per partition, map-side combine. State
    * scales with the contingency table, never with cells.
    *
    * @return (zone, v, cnt) */
  def zonalHistogram(values: RasterLayer, zones: RasterLayer): DataFrame =
    zoneValueCounts(values, zones)

  /** Weighted zonal mean (the population-weighted summary — ESRI
    * Zonal Statistics with a weight raster): per zone,
    * Σ w·v / Σ w over cells valid in ALL THREE layers. Integral cells
    * make both sums exact Longs; one closing division (round in the
    * caller per the float rule).
    *
    * Scale shape: one three-way co-keyed tile join, per-partition
    * Scala partials — |zones| rows per partition cross the exchange.
    *
    * @return (zone, w_total, wmean) */
  def zonalWeightedMean(values: RasterLayer, weights: RasterLayer,
                        zones: RasterLayer): DataFrame = {
    val spark = values.spark
    import spark.implicits._
    val v = values.df.select(col("col"), col("row"), col("tile").as("_v"))
    val w = weights.df.select(col("col"), col("row"), col("tile").as("_w"))
    val z = zones.df.select(col("col"), col("row"), col("tile").as("_z"))
    val parts = v.join(w, Seq("col", "row")).join(z, Seq("col", "row"))
      .select(col("_v"), col("_w"), col("_z"))
      .as[(Seq[Double], Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
        it.foreach { case (vs, ws, zs) =>
          val va = vs.toArray; val wa = ws.toArray; val za = zs.toArray
          var i = 0
          while (i < va.length) {
            val vv = va(i); val ww = wa(i); val zz = za(i)
            if (!vv.isNaN && !ww.isNaN && !zz.isNaN) {
              val k = zz.toLong
              val cur = acc.getOrElse(k, (0L, 0L))
              acc(k) = (cur._1 + ww.toLong, cur._2 + ww.toLong * vv.toLong)
            }
            i += 1
          }
        }
        acc.iterator.map { case (k, (sw, swv)) => (k, sw, swv) }
      }.toDF("zone", "sw", "swv")
    parts.groupBy("zone")
      .agg(sum("sw").cast("long").as("w_total"), sum("swv").cast("long").as("swv"))
      .select(col("zone"), col("w_total"),
        (col("swv").cast("double") / col("w_total").cast("double")).as("wmean"))
  }

  /** Zonal median (the geotrellis Zonal percentile summary at q=0.5,
    * exact-int semantics): per zone, the smallest cell value whose
    * cumulative count reaches half the zone's cells — the
    * quantile_breaks_int rule applied per zone. Runs on the shared
    * (zone, value) partials; the two windows partition BY ZONE over
    * distinct values only (never per-cell rows).
    *
    * @return (zone, median) */
  def zonalMedian(values: RasterLayer, zones: RasterLayer): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("zone").orderBy("v")
    val wz = org.apache.spark.sql.expressions.Window.partitionBy("zone")
    zoneValueCounts(values, zones)
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("tot", sum("cnt").over(wz))
      .where(col("cum") * 2 >= col("tot"))
      .groupBy("zone").agg(min("v").cast("long").as("median"))
  }

  /** Zonal quantile at rational q = num/den (exact cross-multiplied
    * rule: smallest value with cum·den >= num·tot — no float q ever
    * compares): the general form [[zonalMedian]] is the 1/2 case of.
    * Same shared partials + zone-partitioned distinct-value windows. */
  def zonalQuantile(values: RasterLayer, zones: RasterLayer,
                    num: Long, den: Long): DataFrame = {
    require(num >= 0 && num <= den && den > 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("zone").orderBy("v")
    val wz = org.apache.spark.sql.expressions.Window.partitionBy("zone")
    zoneValueCounts(values, zones)
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("tot", sum("cnt").over(wz))
      .where(col("cum") * den >= col("tot") * num)
      .groupBy("zone").agg(min("v").cast("long").as("q"))
  }

  /** Zonal Shannon diversity + evenness (the FRAGSTATS SHDI/SHEI
    * landscape metrics): per zone H = ln(n) − (1/n)·Σ cᵢ·ln(cᵢ) over
    * class counts, evenness = H / ln(variety) (1-class zones report
    * 0). Same micro-nat determinism as [[graft.pipeline.TextAnalysis
    * .charEntropy]]: each class's c·ln(c) quantizes ONCE, the zone
    * sum is exact integer, and — the r12 focal-entropy lesson — the
    * closing ln(n) and ln(variety) quantize to micro-nats too, so
    * every hashed value is a quotient of exact integers (bit-identical
    * across libms; no raw transcendental reaches the output).
    * Runs on the shared (zone, value) partials. */
  def zonalDiversity(values: RasterLayer, zones: RasterLayer): DataFrame = {
    val lnN = round(log(col("n_cells").cast("double")) * lit(1000000.0)).cast("long")
    val shannonExact = (lnN * col("n_cells") - col("s")).cast("double") /
      (col("n_cells").cast("double") * lit(1000000.0))
    val lnV = round(log(col("variety").cast("double")) * lit(1000000.0)).cast("long")
    zoneValueCounts(values, zones)
      .groupBy("zone")
      .agg(sum("cnt").cast("long").as("n_cells"),
        count(lit(1)).cast("long").as("variety"),
        sum(round(col("cnt").cast("double") * log(col("cnt").cast("double")) * lit(1000000.0))
          .cast("long")).cast("long").as("s"))
      .select(col("zone"), col("n_cells"), col("variety"),
        round(shannonExact * lit(100000.0)).cast("long").as("shannon_u"),
        round(when(col("variety") > 1,
          shannonExact / (lnV.cast("double") / lit(1000000.0)))
          .otherwise(lit(0.0)) * lit(100000.0)).cast("long").as("evenness_u"))
  }

  /** Shared (zone, value) -> count partial: per-partition Scala
    * accumulation (the [[zonalStats]] shape) so per-cell rows never
    * cross an exchange. */
  private def zoneValueCounts(values: RasterLayer, zones: RasterLayer): DataFrame = {
    val spark = values.spark
    import spark.implicits._
    val v = values.df.select(col("col"), col("row"), col("tile").as("_v"))
    val z = zones.df.select(col("col"), col("row"), col("tile").as("_z"))
    val parts = v.join(z, Seq("col", "row"))
      .select(col("_v"), col("_z")).as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
        it.foreach { case (vs, zs) =>
          val va = vs.toArray; val za = zs.toArray // List apply is O(n)
          var i = 0
          while (i < va.length) {
            val vv = va(i); val zz = za(i)
            if (!vv.isNaN && !zz.isNaN) {
              val k = (zz.toLong, vv.toLong)
              acc(k) = acc.getOrElse(k, 0L) + 1
            }
            i += 1
          }
        }
        acc.iterator.map { case ((zz, vv), c) => (zz, vv, c) }
      }.toDF("zone", "v", "cnt")
    parts.groupBy("zone", "v").agg(sum("cnt").as("cnt"))
  }

  /** Zonal circular (directional) mean — the directional-statistics
    * summary for angular rasters (mean ASPECT per watershed, mean wind
    * direction per region): per zone, the circular mean
    * atan2(Σ sin θ, Σ cos θ) normalized to [0, 360), plus the
    * resultant length R = |Σe^iθ| / n (1 = perfectly aligned, 0 =
    * uniform) — the standard concentration measure an arithmetic mean
    * of angles gets wrong (mean of 359° and 1° is 0°, not 180°).
    *
    * Determinism: per-cell sin/cos are quantized to integer
    * micro-units BEFORE summation (exact order-free long adds; raw
    * float Σsin would be partition-order-dependent), one atan2/sqrt
    * at the end. Values layer holds angles in DEGREES.
    *
    * Scale shape: the [[zonalStats]] per-partition partial — only
    * |zones| rows per partition cross the exchange. */
  def zonalCircularMean(values: RasterLayer, zones: RasterLayer): DataFrame = {
    val spark = values.spark
    import spark.implicits._
    val v = values.df.select(col("col"), col("row"), col("tile").as("_v"))
    val z = zones.df.select(col("col"), col("row"), col("tile").as("_z"))
    val parts = v.join(z, Seq("col", "row"))
      .select(col("_v"), col("_z")).as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Long, Long)]
        it.foreach { case (vs, zs) =>
          val va = vs.toArray; val za = zs.toArray // List apply is O(n)
          var i = 0
          while (i < va.length) {
            val vv = va(i); val zz = za(i)
            if (!vv.isNaN && !zz.isNaN) {
              val k = zz.toLong
              val r = math.toRadians(vv)
              val sq = math.rint(math.sin(r) * 1e6).toLong
              val cq = math.rint(math.cos(r) * 1e6).toLong
              val cur = acc.getOrElse(k, (0L, 0L, 0L))
              acc(k) = (cur._1 + 1, cur._2 + sq, cur._3 + cq)
            }
            i += 1
          }
        }
        acc.iterator.map { case (k, (n, s, c)) => (k, n, s, c) }
      }.toDF("zone", "n", "ssin", "scos")
      .groupBy("zone")
      .agg(sum("n").as("n_cells"), sum("ssin").as("sq"), sum("scos").as("cq"))
    val deg = degrees(atan2(col("sq").cast("double"), col("cq").cast("double")))
    parts.select(col("zone"), col("n_cells"),
      round(when(deg < 0, deg + 360).otherwise(deg)
        * lit(100000.0)).cast("long").as("mean_deg_u"),
      round(sqrt(col("sq").cast("double") * col("sq") + col("cq").cast("double") * col("cq")) /
        (col("n_cells").cast("double") * lit(1000000.0))
        * lit(1000000.0)).cast("long").as("resultant_u"))
  }

  /** Zonal geometry (the ESRI ZonalGeometry family's raster form):
    * per zone, the cell count (area at unit cell size), the 4-connected
    * perimeter (cell edges facing a different zone, a NoData hole, or
    * the grid boundary), and the isoperimetric compactness
    * 4·π·area / perimeter² (1 for a disc, π/4 ≈ 0.785 is the square's
    * ceiling on a grid).
    *
    * Scale shape (r13, the §4 "no per-cell rows in the physical path"
    * discipline): a radius-1 [[Focal.gatherPartials]] halo — each tile
    * scans its own cells against the padded window (NaN beyond the
    * grid / in NoData holes reads as boundary, exactly the old
    * adjacency-gap check) and emits ONE (zone, n_cells, perimeter)
    * partial per zone it touches; only border strips and those bounded
    * partials cross exchanges. The previous shape (lag/lead windows
    * keyed by grid row/column) put every cell through two exchanges
    * and made each 10^6-cell grid line a single-task window scan.
    * All-integer arithmetic until the final compactness division. */
  def zonalGeometry(zones: RasterLayer): DataFrame = {
    val spark = zones.spark
    import spark.implicits._
    val tl = zones.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    Focal.gatherPartials[(Long, Long, Long)](zones, 1) { (_, _, padded, w) =>
      val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
      var j = 0
      while (j < tr) {
        var i = 0
        while (i < tc) {
          val v = padded((j + 1) * w + (i + 1))
          if (!v.isNaN) {
            val zone = v.toLong
            def same(n: Double): Int = if (!n.isNaN && n.toLong == zone) 1 else 0
            val p = 4L -
              same(padded((j + 1) * w + i)) - same(padded((j + 1) * w + (i + 2))) -
              same(padded(j * w + (i + 1))) - same(padded((j + 2) * w + (i + 1)))
            val (n0, p0) = acc.getOrElse(zone, (0L, 0L))
            acc(zone) = (n0 + 1, p0 + p)
          }
          i += 1
        }
        j += 1
      }
      acc.iterator.map { case (z, (n, p)) => (z, n, p) }
    }.toDF("zone", "nc", "pc")
      .groupBy("zone")
      .agg(sum("nc").cast("long").as("n_cells"), sum("pc").cast("long").as("perimeter"))
      .select(col("zone"), col("n_cells"), col("perimeter"),
        round(lit(4 * math.Pi) * col("n_cells") / (col("perimeter") * col("perimeter"))
          * lit(1000000.0)).cast("long")
          .as("compactness_u"))
  }

  /** Area-weighted (fractional-coverage) zonal statistics — the
    * exactextract operator: zones are quarter-aligned rects (zone,
    * x0, y0, x1, y1 in grid coords) and every cell contributes to a
    * zone WEIGHTED by the exact fraction the zone covers it, so
    * boundary pixels split between zones instead of being
    * whole-assigned (the systematic bias plain zonal stats carries on
    * small/sliver zones). Coverage comes from
    * [[Rasterize.fromRectsCoverageByZone]] in 1/16-cell² integer
    * units; a zone's weighted sum Σ v·cov_q and weight Σ cov_q are
    * exact integers for integral-valued cells, the mean is their one
    * IEEE quotient.
    *
    * Scale shape: coverage cells group to (zone, col, row) offset
    * arrays FIRST, so each value tile joins once per zone touching it
    * (never once per covered cell); the per-tile scan folds into
    * per-partition zone partials and only |zones| rows cross the
    * final exchange. NaN cells are skipped (they carry no weight).
    *
    * @return (zone, n_cells, cov_q, wsum_q, wmean) — n_cells =
    *         covered cells with data, cov_q the total coverage in
    *         1/16-cell² units, wsum_q = Σ v·cov_q, wmean their
    *         quotient (round 6) */
  def zonalStatsCoverage(values: RasterLayer, rects: DataFrame): DataFrame = {
    val spark = values.spark
    import spark.implicits._
    val tl = values.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val cov = Rasterize.fromRectsCoverageByZone(rects, values.meta.layout)
      .select(col("zone"),
        (col("x") / tc).cast("int").as("col"),
        (col("y") / tr).cast("int").as("row"),
        (((col("y") % tr) * tc + (col("x") % tc)).cast("int")).as("off"),
        col("cov_q"))
      .groupBy("zone", "col", "row")
      .agg(collect_list(struct(col("off"), col("cov_q"))).as("offs"))
    cov.join(values.df.select(col("col"), col("row"), col("tile")), Seq("col", "row"))
      .select(col("zone"), col("offs"), col("tile"))
      .as[(Long, Seq[(Int, Long)], Seq[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Long, Long)]
        it.foreach { case (z, offs, tile) =>
          var n = 0L; var cq = 0L; var ws = 0L
          offs.foreach { case (off, c) =>
            val v = tile(off)
            if (!v.isNaN) { n += 1; cq += c; ws += v.toLong * c }
          }
          val (n0, c0, w0) = acc.getOrElse(z, (0L, 0L, 0L))
          acc(z) = (n0 + n, c0 + cq, w0 + ws)
        }
        acc.iterator.map { case (z, (n, c, w)) => (z, n, c, w) }
      }
      .toDF("zone", "n", "c", "w")
      .groupBy("zone")
      .agg(sum("n").cast("long").as("n_cells"), sum("c").cast("long").as("cov_q"),
        sum("w").cast("long").as("wsum_q"))
      .where(col("cov_q") > 0)
      .select(col("zone"), col("n_cells"), col("cov_q"), col("wsum_q"),
        round(col("wsum_q").cast("double") / col("cov_q").cast("double")
          * lit(1000000.0)).cast("long").as("wmean_u"))
  }

  /** Ceiling for [[zonalPercentage]]'s driver fast path: 2^21 zones
    * (~32 MB as a broadcast Long map). Above it the zone totals never
    * leave the cluster — the per-cell join fallback runs instead.
    * Same explicit-guard convention as Dedup.connectedComponents /
    * Bpe.train / the contamination broadcast. */
  val MaxDriverZones: Long = 1L << 21

  /** Zonal percentage (geotrellis ZonalPercentage, the zonal family's
    * per-cell form): each cell's value as the integer percent of its
    * zone's total — pct = (v * 100) div zoneSum, exact for
    * integral-valued cells (truncating division == DuckDB's `//` for
    * the non-negative contract). Zone totals reuse [[zonalStats]]'s
    * partition-partial machinery (only |zones| rows shuffle).
    *
    * When |zones| <= `maxDriverZones` the totals come back as a
    * broadcast map and the output is one tile-aligned join + a
    * per-tile array scan — per-cell rows never cross an exchange. A
    * parcel/segment-scale zone raster above the ceiling takes the
    * distributed fallback: cells explode, join the totals DataFrame
    * (Spark picks broadcast vs shuffle), and tiles reassemble in one
    * TileBuildAgg groupBy — per-cell rows cross exactly one exchange,
    * the honest minimum once the zone table itself is cluster-sized.
    *
    * Cells NoData in either layer stay NoData; a zone whose total is
    * 0 yields NoData for its cells (the percent is undefined — callers
    * needing the oracle path must keep zone sums positive). */
  def zonalPercentage(values: RasterLayer, zones: RasterLayer,
                      maxDriverZones: Long = MaxDriverZones): RasterLayer = {
    val spark = values.spark
    import spark.implicits._
    // both layers are consumed TWICE (zone totals, then the per-cell
    // join) — pin them so upstream rasterization runs once
    val vdf = values.df.localCheckpoint()
    val zdf = zones.df.localCheckpoint()
    // one row per zone; pinned because it feeds the guard count and
    // then whichever branch wins
    val sumsDf = zonalStats(values.copy(df = vdf), zones.copy(df = zdf))
      .select(col("zone"), col("vsum").cast("long").as("zsum"))
      .localCheckpoint()
    val joined = vdf.select(col("col"), col("row"), col("tile").as("_v"))
      .join(zdf.select(col("col"), col("row"), col("tile").as("_z")), Seq("col", "row"))
    val tiles = if (sumsDf.count() <= maxDriverZones) {
      val sums = sumsDf.as[(Long, Long)].collect().toMap
      val bc = spark.sparkContext.broadcast(sums)
      joined.select(col("col"), col("row"), col("_v"), col("_z"))
        .as[(Int, Int, Seq[Double], Seq[Double])]
        .map { case (c, r, vs, zs) =>
          val va = vs.toArray; val za = zs.toArray // List apply is O(n)
          val out = new Array[Double](va.length)
          var i = 0
          while (i < va.length) {
            val vv = va(i); val zz = za(i)
            out(i) =
              if (vv.isNaN || zz.isNaN) Double.NaN
              else {
                val s = bc.value(zz.toLong)
                if (s == 0L) Double.NaN else (vv.toLong * 100L / s).toDouble
              }
            i += 1
          }
          (c, r, out)
        }.toDF("col", "row", "tile")
    } else {
      val tl = values.meta.layout.tileLayout
      val cells = joined
        .select(col("col"), col("row"),
          posexplode(arrays_zip(col("_v"), col("_z"))).as(Seq("off", "vz")))
        .select(col("col"), col("row"), col("off").cast("int").as("off"),
          col("vz._v").as("v"),
          when(isnan(col("vz._v")) || isnan(col("vz._z")), lit(null))
            .otherwise(col("vz._z").cast("long")).as("zone"))
      val agg = udaf(new TileBuildAgg(tl.tileSize, CellOp.Last),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Double)]())
      cells.join(sumsDf, Seq("zone"), "left")
        .select(col("col"), col("row"), col("off"),
          when(col("zone").isNull || col("zsum") === 0L, lit(Double.NaN))
            .otherwise(expr("CAST((CAST(v AS BIGINT) * 100) DIV zsum AS DOUBLE)"))
            .as("pv"))
        .groupBy("col", "row").agg(agg(col("off"), col("pv")).as("tile"))
    }
    values.copy(df = tiles)
  }

  /** Count occurrences of each (integral) cell value — reference
    * get_cell_value_counts (layer.py:2347). */
  def cellValueCounts(layer: RasterLayer): DataFrame =
    layer.toCells
      .groupBy(col("v").cast("long").as("value"))
      .agg(count(lit(1)).as("cnt"))

  /** Sample the layer at points `(pid, px, py)` in grid coords —
    * reference get_point_values (layer.py:2215). Points join tiles on
    * the tile key (broadcast when small), cell picked with element_at:
    * one narrow join, no explode. */
  /** get_point_values with bilinear resampling (layer.py:2215 takes a
    * ResampleMethod): sample at (px, py) interpolating the 4 cell
    * centers around the point. A point yields a value only when all
    * four taps exist (the same all-taps rule as Resample.bilinear*).
    * Shape: each point explodes to 4 weighted corner cells, one
    * broadcast-or-shuffle join against the tiles, then a 4-row groupBy
    * per point. */
  def pointValuesBilinear(layer: RasterLayer, points: DataFrame): DataFrame = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val base = points.select(col("pid"),
      floor(col("px") - 0.5).cast("long").as("x0"),
      floor(col("py") - 0.5).cast("long").as("y0"),
      (col("px") - 0.5 - floor(col("px") - 0.5)).as("tx"),
      (col("py") - 0.5 - floor(col("py") - 0.5)).as("ty"))
    val one = lit(1.0)
    val corners = base.select(col("pid"), explode(array(
        struct(col("x0").as("cx"), col("y0").as("cy"),
          ((one - col("tx")) * (one - col("ty"))).as("w")),
        struct((col("x0") + 1).as("cx"), col("y0").as("cy"),
          (col("tx") * (one - col("ty"))).as("w")),
        struct(col("x0").as("cx"), (col("y0") + 1).as("cy"),
          ((one - col("tx")) * col("ty")).as("w")),
        struct((col("x0") + 1).as("cx"), (col("y0") + 1).as("cy"),
          (col("tx") * col("ty")).as("w")))).as("c"))
      .select(col("pid"), col("c.cx").as("cx"), col("c.cy").as("cy"), col("c.w").as("w"))
      .where(col("cx") >= 0 && col("cy") >= 0 &&
        col("cx") < tl.totalCols && col("cy") < tl.totalRows)
      .withColumn("col", (col("cx") / tc).cast("int"))
      .withColumn("row", (col("cy") / tr).cast("int"))
      .withColumn("off", ((col("cy") % tr) * tc + (col("cx") % tc)).cast("int"))
    corners.join(layer.df, Seq("col", "row"))
      .select(col("pid"), col("w"), element_at(col("tile"), col("off") + 1).as("cv"))
      .where(!isnan(col("cv")))
      .groupBy(col("pid"))
      .agg(sum(col("w") * col("cv")).as("_v"), count(lit(1)).as("_n"))
      .where(col("_n") === 4)
      .select(col("pid"), col("_v").as("v"))
  }

  /** Terrain profile along the segment (x0,y0) -> (x1,y1) in grid
    * coords (the ArcGIS StackProfile / gdallocationinfo-along-a-line
    * shape): N = max(dx, dy) + 1 samples at rounded-to-nearest DDA
    * positions, each carrying its distance along the line. Sampling is
    * EXACT integer math — cell_t = p0 + (2·t·d + N) div (2·N), the
    * half-up rational rounding both engines state identically; only
    * the per-sample distance t·step is float (one multiply of the
    * driver-computed step, rounded 5).
    *
    * Scale shape: the sample list (spark.range) broadcasts into a
    * tile-keyed join against the layer — the raster never shuffles and
    * only tiles the line crosses are touched after pushdown.
    * Currently requires x1 >= x0 and y1 >= y0 (integer div rounds
    * toward -inf on negatives, which would break the oracle twin). */
  def profile(layer: RasterLayer, x0: Long, y0: Long, x1: Long, y1: Long): DataFrame = {
    require(x1 >= x0 && y1 >= y0, "profile requires x1 >= x0 && y1 >= y0")
    val spark = layer.spark
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val dx = x1 - x0; val dy = y1 - y0
    val n = math.max(dx, dy)
    require(n > 0, "profile endpoints must differ")
    val step = math.sqrt((dx * dx + dy * dy).toDouble) / n
    val pts = spark.range(0, n + 1).select(col("id").as("t"),
      (lit(x0) + expr(s"(2 * id * $dx + $n) div (2 * $n)")).as("cx"),
      (lit(y0) + expr(s"(2 * id * $dy + $n) div (2 * $n)")).as("cy"))
    val keyed = pts
      .withColumn("col", (col("cx") / tc).cast("int"))
      .withColumn("row", (col("cy") / tr).cast("int"))
      .withColumn("off", ((col("cy") % tr) * tc + (col("cx") % tc)).cast("int"))
    broadcast(keyed).join(layer.df, Seq("col", "row"))
      .select(col("t"), col("cx").as("x"), col("cy").as("y"),
        element_at(col("tile"), col("off") + 1).as("v"),
        round(col("t") * lit(step) * lit(100000.0)).cast("long").as("dist_u"))
      .where(!isnan(col("v")))
  }

  def pointValues(layer: RasterLayer, points: DataFrame): DataFrame = {
    val tl = layer.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val keyed = points.select(
      col("pid"),
      floor(col("px")).cast("long").as("cx"),
      floor(col("py")).cast("long").as("cy"))
      .withColumn("col", (col("cx") / tc).cast("int"))
      .withColumn("row", (col("cy") / tr).cast("int"))
      .withColumn("off", ((col("cy") % tr) * tc + (col("cx") % tc)).cast("int"))
    keyed.join(layer.df, Seq("col", "row"))
      .select(col("pid"), element_at(col("tile"), col("off") + 1).as("v"))
      .where(!isnan(col("v")))
  }

  /** Landscape Simpson diversity (FRAGSTATS SIDI) over a class
    * raster: SIDI = 1 − Σ(aᵢ/A)², restated exact-integer as
    * (A² − Σaᵢ²)·10⁶ / A² — one multiply + single divide on exact
    * Longs (A ≤ 2^16 cells keeps A²·10⁶ < 2^53). One row:
    * (n_classes, a_total, sidi_u). */
  def simpsonDiversity(classes: RasterLayer): DataFrame =
    classes.toCells.groupBy(col("v").cast("long").as("cls"))
      .agg(count(lit(1)).as("a"))
      .agg(count(lit(1)).as("n_classes"), sum("a").as("a_total"),
        sum(col("a") * col("a")).as("sum_a2"))
      .select(col("n_classes"), col("a_total"),
        round((col("a_total") * col("a_total") - col("sum_a2")) * lit(1000000.0) /
          (col("a_total") * col("a_total"))).cast("long").as("sidi_u"))

  /** Hypsometric integral per zone (elevation-relief ratio, Pike &
    * Wilson 1971): HI = (mean − min)/(max − min), the landform-
    * maturity index. Exact integer zone moments close as ONE
    * micro-quantized ratio round((Σv − n·min)·10⁶ / (n·(max − min)));
    * flat zones (max == min) report NULL. Same co-keyed cell join +
    * map-side zone aggregate as zonalStats. */
  def hypsometric(values: RasterLayer, zones: RasterLayer): DataFrame =
    values.toCells
      .join(zones.toCells.withColumnRenamed("v", "zone"), Seq("x", "y"))
      .groupBy(col("zone").cast("long").as("zone"))
      .agg(count(lit(1)).as("n"), sum("v").as("vsum"),
        min("v").as("vmin"), max("v").as("vmax"))
      .select(col("zone"), col("n"), col("vmin"), col("vmax"),
        when(col("vmax") > col("vmin"),
          round((col("vsum") - col("n") * col("vmin")) * lit(1000000.0) /
            (col("n") * (col("vmax") - col("vmin")))).cast("long")).as("hi_u"))
}
