package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-layer comparison summaries — the change-detection /
  * surface-vs-surface statistics ArcGIS ships as BandCollectionStats
  * and CutFill, computed over co-located cells of two layers with
  * matching layouts.
  *
  * Scale shape (the zonalStats discipline): one co-keyed tile join,
  * per-PARTITION Scala accumulation of exact integer moments — a
  * handful of scalars per partition cross the exchange, never a
  * per-cell row. Cells follow the integral-valued oracle contract, so
  * every sum is an exact Long and the single closing float expression
  * is engine-identical.
  */
object Compare {

  private def paired(a: RasterLayer, b: RasterLayer) = {
    val va = a.df.select(col("col"), col("row"), col("tile").as("_a"))
    val vb = b.df.select(col("col"), col("row"), col("tile").as("_b"))
    va.join(vb, Seq("col", "row")).select(col("_a"), col("_b"))
  }

  /** Pearson correlation between co-located cells of `a` and `b`:
    * r = (n·Σxy - Σx·Σy) / sqrt((n·Σx² - Σx²)·(n·Σy² - Σy²)),
    * all six moments exact Longs, one float expression at the end
    * (round 5). Cells where either side is NoData are excluded.
    *
    * @return one row (n_cells, corr) */
  def correlate(a: RasterLayer, b: RasterLayer): DataFrame = {
    val spark = a.spark
    import spark.implicits._
    val parts = paired(a, b).as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        var n = 0L; var sx = 0L; var sy = 0L
        var sxy = 0L; var sxx = 0L; var syy = 0L
        it.foreach { case (as, bs) =>
          val aa = as.toArray; val ba = bs.toArray // List apply is O(n)
          var i = 0
          while (i < aa.length) {
            val x = aa(i); val y = ba(i)
            if (!x.isNaN && !y.isNaN) {
              val xl = x.toLong; val yl = y.toLong
              n += 1; sx += xl; sy += yl
              sxy += xl * yl; sxx += xl * xl; syy += yl * yl
            }
            i += 1
          }
        }
        Iterator.single((n, sx, sy, sxy, sxx, syy))
      }.toDF("n", "sx", "sy", "sxy", "sxx", "syy")
      .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxy").as("sxy"), sum("sxx").as("sxx"), sum("syy").as("syy"))
    parts.select(col("n").as("n_cells"),
      // micro-quantized closing (the portable BIGINT form)
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
             (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
        * lit(100000.0)).cast("long").as("corr_u"))
  }

  /** Change vector analysis (Malila 1980 — the remote-sensing CVA):
    * per pixel, the MAGNITUDE √(Σ dᵢ²) and DIRECTION atan2(d₁, d₀)
    * of the band-space displacement between two co-located 2-band
    * stacks. One keyed join + per-pixel expression math; NoData in
    * any band propagates. Returns (magnitude, direction-degrees
    * [0, 360)) stacked as a 2-band layer's cells — float rule:
    * round 5 in the caller. */
  def changeVector(before: MultibandLayer, after: MultibandLayer): DataFrame = {
    require(before.bandCount == 2 && after.bandCount == 2,
      "CVA here takes 2-band stacks (generalize by pairing bands)")
    val a = before.df.select(col("col"), col("row"), col("bands").as("_a"))
    val b = after.df.select(col("col"), col("row"), col("bands").as("_b"))
    val j = a.join(b, Seq("col", "row"))
    def d(i: Int) =
      (c: Column) => element_at(element_at(col("_b"), i), c) - element_at(element_at(col("_a"), i), c)
    val mag = transform(element_at(col("_a"), 1), (_, idx) => {
      val d0 = d(1)(idx + 1); val d1 = d(2)(idx + 1)
      sqrt(d0 * d0 + d1 * d1)
    })
    val dir = transform(element_at(col("_a"), 1), (_, idx) => {
      val d0 = d(1)(idx + 1); val d1 = d(2)(idx + 1)
      val deg = degrees(atan2(d1, d0))
      when(deg < 0, deg + 360).otherwise(deg)
    })
    j.select(col("col"), col("row"), array(mag, dir).as("bands"))
  }

  /** Joint (2D) histogram of two co-located layers — the continuous
    * change-detection confusion matrix / scatter-density table:
    * per (floor(a/widthA), floor(b/widthB)) bin pair, the cell count.
    * Integral cells make the binning exact Long division. Same
    * per-partition accumulation; |binsA × binsB| rows cross the
    * exchange. */
  def jointHistogram(a: RasterLayer, b: RasterLayer,
                     widthA: Long = 1L, widthB: Long = 1L): DataFrame = {
    require(widthA > 0 && widthB > 0)
    val spark = a.spark
    import spark.implicits._
    paired(a, b).as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
        it.foreach { case (as, bs) =>
          val aa = as.toArray; val ba = bs.toArray
          var i = 0
          while (i < aa.length) {
            val x = aa(i); val y = ba(i)
            if (!x.isNaN && !y.isNaN) {
              val k = (x.toLong / widthA, y.toLong / widthB)
              acc(k) = acc.getOrElse(k, 0L) + 1
            }
            i += 1
          }
        }
        acc.iterator.map { case ((ka, kb), c) => (ka, kb, c) }
      }.toDF("bin_a", "bin_b", "cnt")
      .groupBy("bin_a", "bin_b").agg(sum("cnt").as("cnt"))
  }

  /** Classification accuracy assessment — the error-matrix statistics
    * (Congalton 1991) a supervised-classification workflow reports
    * next to its confusion matrix: overall accuracy Σdiag/n and
    * Cohen's kappa, the chance-corrected agreement
    * κ = (p₀ − pₑ)/(1 − pₑ) with pₑ = Σ_k rowTot_k·colTot_k / n².
    *
    * Determinism: counts and marginal products are exact integers and
    * both closing statistics are stated as ONE division of exact
    * integers — overall = correct/n and
    * κ = (correct·n − Σ rowTot·colTot)/(n² − Σ rowTot·colTot) — then
    * round 6 (the algebra clears pₑ's inner divisions, so no
    * intermediate float exists to diverge).
    *
    * Scale shape: the [[jointHistogram]] per-partition partial (only
    * |classes|² rows cross the exchange); marginal products are a
    * |classes|²-bounded join of two tiny aggregates.
    *
    * @return one row (n, correct, overall_acc, kappa) */
  def accuracyAssessment(pred: RasterLayer, truth: RasterLayer): DataFrame = {
    val cm = jointHistogram(pred, truth).localCheckpoint() // (bin_a=pred, bin_b=truth, cnt)
    val n = cm.agg(sum("cnt").cast("long")).first().getLong(0)
    val correct = cm.where(col("bin_a") === col("bin_b"))
      .agg(coalesce(sum("cnt"), lit(0L)).cast("long")).first().getLong(0)
    val peNum = cm.groupBy("bin_a").agg(sum("cnt").as("rt"))
      .join(cm.groupBy("bin_b").agg(sum("cnt").as("ct")),
        col("bin_a") === col("bin_b"))
      .agg(coalesce(sum(col("rt") * col("ct")), lit(0L)).cast("long"))
      .first().getLong(0)
    val spark = pred.spark
    import spark.implicits._
    Seq((n, correct)).toDF("n", "correct")
      .select(col("n"), col("correct"),
        round(col("correct").cast("double") / col("n").cast("double")
          * lit(1000000.0)).cast("long").as("overall_acc_u"),
        round((col("correct") * col("n") - lit(peNum)).cast("double") /
          (col("n") * col("n") - lit(peNum)).cast("double")
          * lit(1000000.0)).cast("long").as("kappa_u"))
  }

  /** Cut/fill report (ArcGIS CutFill): per sign class of a - b
    * (1 = cut, -1 = fill, 0 = unchanged), the cell count and total
    * |volume| in cell units (multiply by cell area for map units).
    * Exact integers end to end.
    *
    * @return (cls, n_cells, volume) */
  def cutFill(a: RasterLayer, b: RasterLayer): DataFrame = {
    val spark = a.spark
    import spark.implicits._
    paired(a, b).as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
        it.foreach { case (as, bs) =>
          val aa = as.toArray; val ba = bs.toArray
          var i = 0
          while (i < aa.length) {
            val x = aa(i); val y = ba(i)
            if (!x.isNaN && !y.isNaN) {
              val d = x.toLong - y.toLong
              val cls = java.lang.Long.signum(d).toLong
              val cur = acc.getOrElse(cls, (0L, 0L))
              acc(cls) = (cur._1 + 1, cur._2 + math.abs(d))
            }
            i += 1
          }
        }
        acc.iterator.map { case (cls, (cnt, vol)) => (cls, cnt, vol) }
      }.toDF("cls", "cnt", "vol")
      .groupBy("cls")
      .agg(sum("cnt").as("n_cells"), sum("vol").as("volume"))
  }

  /** Surface volume against a horizontal reference plane (the ArcGIS
    * SurfaceVolume report): total volume and footprint area of the
    * surface ABOVE the plane and BELOW it, in cell units scaled by
    * the layout's cell area. Integral cells + an integral plane keep
    * both volume sums exact Longs; the two closing multiplies by the
    * (exact, layout-derived) cell area are single IEEE ops.
    *
    * Scale: per-partition accumulation, four scalars per partition
    * cross the exchange. */
  def surfaceVolume(a: RasterLayer, plane: Double): DataFrame = {
    // the exact-Long delta below truncates a fractional plane (30.5
    // would classify [30,30.5) as "above") — enforce the integral
    // contract instead of silently shifting every volume
    require(plane.isWhole,
      s"surfaceVolume requires an integral reference plane (got $plane); " +
        "scale the layer or plane to integer units first")
    val spark = a.spark
    import spark.implicits._
    val cellArea = a.meta.layout.cellWidth * a.meta.layout.cellHeight
    a.df.select(col("tile")).as[Seq[Double]]
      .mapPartitions { it =>
        var volAbove = 0L; var volBelow = 0L
        var nAbove = 0L; var nBelow = 0L
        it.foreach { ts =>
          val aa = ts.toArray
          var i = 0
          while (i < aa.length) {
            val v = aa(i)
            if (!v.isNaN) {
              val d = v.toLong - plane.toLong
              if (d > 0) { volAbove += d; nAbove += 1 }
              else if (d < 0) { volBelow -= d; nBelow += 1 }
            }
            i += 1
          }
        }
        Iterator.single((volAbove, volBelow, nAbove, nBelow))
      }
      .toDF("va", "vb", "na", "nb")
      .agg(sum("va").cast("long").as("va"), sum("vb").cast("long").as("vb"),
        sum("na").cast("long").as("cells_above"), sum("nb").cast("long").as("cells_below"))
      .select(
        (col("va").cast("double") * lit(cellArea)).as("vol_above"),
        (col("vb").cast("double") * lit(cellArea)).as("vol_below"),
        col("cells_above"), col("cells_below"))
  }

  /** ArcGIS Combine: the unique-combination attribute table of two
    * co-registered layers. Combo ids are dense-ranked by (v1, v2) so
    * the labeling is deterministic and engine-restatable; the per-cell
    * combo raster is one broadcast join away and never materializes
    * here. The rank runs on the AGGREGATED table (distinct value
    * pairs, not cells) through [[graft.PrefixSum]] — row_number of a
    * distinct-key table is the running count — so no single-task
    * global window survives even at a pathological pair count (r20,
    * the matchHistogram/equalize cleanup's last sibling). */
  def combine(a: RasterLayer, b: RasterLayer): DataFrame = {
    val pairs = a.toCells.withColumnRenamed("v", "v1")
      .join(b.toCells.withColumnRenamed("v", "v2"), Seq("x", "y"))
      .groupBy("v1", "v2").agg(count(lit(1)).as("cnt"))
      .withColumn("_k", struct(col("v1"), col("v2")))
      .withColumn("_one", lit(1L))
    graft.PrefixSum.withCumulative(pairs, "_k", "_one")
      .select(col("cum").as("combo"), col("v1"), col("v2"), col("cnt"))
  }
}
