package graft.raster

import org.apache.spark.sql.functions.col

import graft.core.{LayoutDefinition, TileLayout}

/** Pyramiding: zoom z -> z-1 by 2x2 block resample, tile-aligned.
  *
  * Reference: layer.py pyramid() (:1832) with ResampleMethod
  * (constants.py:123). Each child tile downsamples locally (narrow),
  * then 4 children shuffle-assemble into their parent tile — one keyed
  * shuffle per level, O(tiles) rows, the standard tile-pyramid shape.
  */
object Pyramid {
  /** NaN-skipping 2x2 block resample of one tile (tc x tr -> tc/2 x tr/2). */
  private def downsample(tile: Array[Double], tc: Int, tr: Int, method: String): Array[Double] = {
    val hc = tc / 2; val hr = tr / 2
    val out = new Array[Double](hc * hr)
    var j = 0
    while (j < hr) {
      var i = 0
      while (i < hc) {
        val a = tile((2 * j) * tc + 2 * i);     val b = tile((2 * j) * tc + 2 * i + 1)
        val c = tile((2 * j + 1) * tc + 2 * i); val d = tile((2 * j + 1) * tc + 2 * i + 1)
        var sum = 0.0; var n = 0; var mn = Double.NaN; var mx = Double.NaN
        var k = 0
        val vals = Array(a, b, c, d)
        while (k < 4) {
          val v = vals(k)
          if (!v.isNaN) {
            sum += v; n += 1
            if (mn.isNaN || v < mn) mn = v
            if (mx.isNaN || v > mx) mx = v
          }
          k += 1
        }
        out(j * hc + i) =
          if (n == 0) Double.NaN
          else method match {
            case "Average" => sum / n
            case "Sum"     => sum
            case "Min"     => mn
            case "Max"     => mx
            case "NearestNeighbor" => if (!a.isNaN) a else if (!b.isNaN) b else if (!c.isNaN) c else d
            case s => throw new IllegalArgumentException(s)
          }
        i += 1
      }
      j += 1
    }
    out
  }

  /** One pyramid level up: halves the layout, keeps tile size. */
  def levelUp(layer: RasterLayer, method: String = "Average"): RasterLayer = {
    val meta = layer.meta
    val tl = meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    require(tc % 2 == 0 && tr % 2 == 0)
    val spark = layer.df.sparkSession
    import spark.implicits._

    val (hc, hr) = (tc / 2, tr / 2)
    def assemble(group: Iterator[(Int, Int, Seq[Double])]): Seq[Double] = {
      val parent = Array.fill(tc * tr)(Double.NaN)
      group.foreach { case (qx, qy, half) =>
        // iterator in row order, not apply: the deserialized Seq is a
        // List (O(n) apply)
        val it = half.iterator
        var j = 0
        while (j < hr && it.hasNext) {
          var i = 0
          while (i < hc && it.hasNext) {
            parent((qy * hr + j) * tc + (qx * hc + i)) = it.next()
            i += 1
          }
          j += 1
        }
      }
      parent.toSeq
    }

    val newLayout = LayoutDefinition(meta.layout.extent,
      TileLayout(math.max(1, tl.layoutCols / 2), math.max(1, tl.layoutRows / 2), tc, tr))

    if (meta.temporal) {
      // temporal pyramid (reference Pyramid over TemporalTiledRaster-
      // Layer): each instant downsamples independently
      val out = layer.df.select(col("col"), col("row"), col("instant"), col("tile"))
        .as[(Int, Int, Long, Seq[Double])]
        .map { case (c, r, t, tile) =>
          (c / 2, r / 2, t, c % 2, r % 2, downsample(tile.toArray, tc, tr, method).toSeq)
        }
        .groupByKey(q => (q._1, q._2, q._3))
        .mapGroups { (key: (Int, Int, Long), group: Iterator[(Int, Int, Long, Int, Int, Seq[Double])]) =>
          TileRowOutT(key._1, key._2, key._3,
            assemble(group.map(q => (q._4, q._5, q._6))))
        }
      new RasterLayer(out.toDF(), meta.copy(layout = newLayout))
    } else {
      val out = layer.df.select(col("col"), col("row"), col("tile"))
        .as[(Int, Int, Seq[Double])]
        .map { case (c, r, tile) =>
          (c / 2, r / 2, c % 2, r % 2, downsample(tile.toArray, tc, tr, method).toSeq)
        }
        .groupByKey(q => (q._1, q._2))
        .mapGroups { (key: (Int, Int), group: Iterator[(Int, Int, Int, Int, Seq[Double])]) =>
          TileRowOut(key._1, key._2, assemble(group.map(q => (q._3, q._4, q._5))))
        }
      new RasterLayer(out.toDF(), meta.copy(layout = newLayout))
    }
  }

  /** Write every level of a pyramid to the catalog under one name —
    * reference Pyramid.write (layer.py:2654). Every level goes through
    * Catalog.write: dynamic partitionOverwriteMode replaces only that
    * zoom's partition, so a re-run is idempotent (an append here would
    * double every non-base zoom). Each level writes its OWN metadata
    * sidecar (_graft_meta_$zoom.json) — Catalog.read resolves by zoom,
    * so reading any level back pairs tiles with that level's layout. */
  def write(uri: String, name: String, levels: Seq[(Int, RasterLayer)]): Unit =
    levels.foreach { case (zoom, l) => graft.catalog.Catalog.write(uri, name, l, zoom) }

  /** Full pyramid down to a single tile: zoom -> layer map, highest
    * zoom first (reference Pyramid class layer.py:2617). */
  def build(layer: RasterLayer, method: String = "Average"): Seq[(Int, RasterLayer)] = {
    val maxZoom = math.ceil(math.log(layer.meta.layout.tileLayout.layoutCols.toDouble) / math.log(2)).toInt
    val levels = Iterator.iterate((maxZoom, layer)) { case (z, l) => (z - 1, levelUp(l, method)) }
      .takeWhile(_._1 >= 0)
      .take(maxZoom + 1)
    levels.toSeq
  }

  /** Histogram of a pyramid — reference Pyramid.get_histogram
    * (layer.py:2641): computed once on the BASE (highest-zoom) level,
    * which the reference defines as the pyramid's histogram (coarser
    * levels are derived imagery). */
  def histogram(levels: Seq[(Int, RasterLayer)], bins: Int = 10): org.apache.spark.sql.DataFrame = {
    require(levels.nonEmpty)
    HistogramOps.binCounts(levels.maxBy(_._1)._2, bins)
  }

  /** Map a local (per-cell, layout-preserving) operation over every
    * level — the reference Pyramid arithmetic surface (layer.py:2693
    * +,-,*,/ apply to each level). Narrow per level: no shuffles. */
  def mapLevels(levels: Seq[(Int, RasterLayer)],
                f: RasterLayer => RasterLayer): Seq[(Int, RasterLayer)] =
    levels.map { case (z, l) =>
      val out = f(l)
      require(out.meta.layout == l.meta.layout,
        s"pyramid op must preserve each level's layout (zoom $z changed)")
      (z, out)
    }
}
