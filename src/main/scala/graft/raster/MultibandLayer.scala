package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-class multiband tiled layer, Spark-first.
  *
  * Physical model: `col INT, row INT, bands ARRAY<ARRAY<DOUBLE>>` —
  * one row per tile key carrying ALL bands, the Dataset re-expression
  * of the reference's MultibandTile layers (geopyspark layer.py:670
  * `bands()`, :1419; backend TiledRasterLayer.scala throughout).
  *
  * Keeping the whole band stack in one row makes every cross-band
  * pixel op (NDVI, band math) a codegen'd zip_with over co-located
  * arrays — zero shuffle — while per-band ops are transforms over the
  * outer array. Band selection never touches data layout: it projects
  * `element_at(bands, i)`.
  *
  * At 100 TB: rows are (bands x tileSize) doubles; all local algebra
  * is narrow, and the only shuffles are the same single keyed
  * exchanges the single-band layer pays (assembly, aggregate, focal
  * halo).
  */
final class MultibandLayer(val df: DataFrame, val meta: LayerMetadata, val bandCount: Int) {
  private def tl = meta.layout.tileLayout
  private def tc = tl.tileCols
  private def tr = tl.tileRows

  def copy(df: DataFrame = df): MultibandLayer = new MultibandLayer(df, meta, bandCount)

  /** Select one band as a single-band layer (reference layer.py:670
    * `bands`). Pure projection. */
  def band(i: Int): RasterLayer = {
    require(i >= 0 && i < bandCount, s"band $i of $bandCount")
    new RasterLayer(
      df.select(col("col"), col("row"), element_at(col("bands"), i + 1).as("tile")), meta)
  }

  /** Subset/reorder bands (reference layer.py:1419 band slicing). */
  def bands(is: Seq[Int]): MultibandLayer = {
    is.foreach(i => require(i >= 0 && i < bandCount, s"band $i of $bandCount"))
    new MultibandLayer(
      df.select(col("col"), col("row"),
        array(is.map(i => element_at(col("bands"), i + 1)): _*).as("bands")),
      meta, is.length)
  }

  /** Cell function over every band (map_cells on a MultibandTile). */
  def mapCells(f: Column => Column): MultibandLayer =
    copy(df = df.select(col("col"), col("row"),
      transform(col("bands"), b => transform(b, f)).as("bands")))

  /** Per-pixel combine of two bands into a single-band layer — the
    * cross-band map algebra primitive (zip_with, no shuffle). */
  def combinePixels(i: Int, j: Int, f: (Column, Column) => Column): RasterLayer = {
    require(i >= 0 && i < bandCount && j >= 0 && j < bandCount)
    new RasterLayer(
      df.select(col("col"), col("row"),
        zip_with(element_at(col("bands"), i + 1), element_at(col("bands"), j + 1), f).as("tile")),
      meta)
  }

  /** Normalized difference (NDVI-style): (nir - red) / (nir + red).
    * NoData in either band propagates. */
  def normalizedDifference(nir: Int = 1, red: Int = 0): RasterLayer =
    combinePixels(red, nir, (r, n) => (n - r) / (n + r))

  /** Minimum-distance supervised classification (the ERDAS/ArcGIS
    * minimum-distance classifier): each pixel takes the class whose
    * per-band mean signature is nearest in squared euclidean band
    * space; ties break to the SMALLEST class id; NoData in ANY band
    * propagates. Signatures are (classId, per-band means).
    *
    * Shuffle-free codegen'd HOF over the co-located band stack. The
    * argmin is ONE least() over packed (dist·16 + id) doubles — the
    * winnowing pack trick — so no distance is ever re-evaluated in a
    * tie-break CASE (HOF lambdas have no CSE). Exactness contract:
    * integral-valued cells and means keep every dist·16 + id exact
    * below 2^53, so the argmin is deterministic and the oracle states
    * the identical packing. */
  def classifyMinDistance(signatures: Seq[(Int, Seq[Double])]): RasterLayer = {
    require(signatures.nonEmpty && signatures.size <= 16, "1..16 classes")
    require(signatures.forall(_._2.length == bandCount), "signature arity != bandCount")
    require(signatures.forall(s => s._1 >= 0 && s._1 < 16), "class ids 0..15")
    require(signatures.forall(_._2.forall(m => m.isWhole)),
      "minimum-distance contract: integral signature means (quantize upstream)")
    val size = tc * tr
    // r21: native fused per-tile loop (guide §4 — the old HOF lambda
    // evaluated its packed-argmin expression tree INTERPRETED per
    // cell); arithmetic, least- and pmod-semantics stated identically
    // in ClassifyMinDistExpr, results bit-for-bit
    val tile = org.apache.spark.sql.graft.ClassifyMinDistExpr.classifyMinDist(
      col("bands"),
      signatures.map(_._1).toArray,
      signatures.flatMap(_._2).toArray,
      bandCount, size)
    new RasterLayer(df.select(col("col"), col("row"), tile.as("tile")), meta)
  }

  /** Linear band transform — the tasseled-cap / PCA-projection shape
    * (Kauth & Thomas 1976; fixed coefficient rows): output band j =
    * Σ_i coeffs(j)(i) · band_i per pixel. Pure zip/transform over the
    * co-located band stack — zero shuffle, stays in codegen. The sum
    * is a FIXED left-to-right fold over the coefficient row, so both
    * engines state one op order (float rule). NoData in any input
    * band propagates (NaN arithmetic). */
  def linearTransform(coeffs: Seq[Seq[Double]]): MultibandLayer = {
    require(coeffs.nonEmpty && coeffs.forall(_.length == bandCount),
      s"each coefficient row needs $bandCount entries")
    val outBands = coeffs.map { row =>
      // Σ c_i * band_i(px) as one expression per output band; indexes
      // resolve per pixel via element_at over the transformed stack
      transform(element_at(col("bands"), 1), (_, idx) =>
        row.zipWithIndex.map { case (c, i) =>
          lit(c) * element_at(element_at(col("bands"), i + 1), idx + 1)
        }.reduce(_ + _))
    }
    new MultibandLayer(
      df.select(col("col"), col("row"), array(outBands: _*).as("bands")),
      meta, coeffs.length)
  }

  /** Brovey pansharpening (the classic ratio pansharpen; Pohl & van
    * Genderen 1998 survey): out_i = band_i · pan / intensity with
    * intensity = (Σ bands)/n per pixel — each multispectral band
    * rescaled so the stack's brightness matches the pan band. The pan
    * layer must be co-keyed (resample it to the stack's layout first
    * — `Resample`/`Reproject` supply that step). One keyed join +
    * per-pixel expression math; NoData anywhere propagates. */
  def pansharpen(pan: RasterLayer): MultibandLayer = {
    val joined = df.join(
      pan.df.select(col("col"), col("row"), col("tile").as("_pan")), Seq("col", "row"))
    val n = bandCount
    val outBands = (0 until n).map { i =>
      transform(element_at(col("bands"), 1), (_, idx) => {
        val s = (0 until n).map(j =>
          element_at(element_at(col("bands"), j + 1), idx + 1)).reduce(_ + _)
        element_at(element_at(col("bands"), i + 1), idx + 1) *
          element_at(col("_pan"), idx + 1) / (s / n)
      })
    }
    new MultibandLayer(
      joined.select(col("col"), col("row"), array(outBands: _*).as("bands")),
      meta, n)
  }

  /** Append another stack's bands (reference combine_bands across
    * multiband layers). Full-outer keyed join; missing side becomes
    * all-NoData bands. */
  def stack(other: MultibandLayer): MultibandLayer = {
    require(meta.layout == other.meta.layout, "layouts differ")
    val nodata = array_repeat(lit(Double.NaN), tl.tileSize)
    def pad(n: Int) = array_repeat(nodata, n)
    val a = df.select(col("col"), col("row"), col("bands").as("_a"))
    val b = other.df.select(col("col"), col("row"), col("bands").as("_b"))
    new MultibandLayer(
      a.join(b, Seq("col", "row"), "full_outer")
        .select(col("col"), col("row"),
          concat(coalesce(col("_a"), pad(bandCount)),
                 coalesce(col("_b"), pad(other.bandCount))).as("bands")),
      meta, bandCount + other.bandCount)
  }

  /** Concatenate layers with duplicate keys allowed (union). */
  def union(other: MultibandLayer): MultibandLayer = {
    require(bandCount == other.bandCount, "band counts differ")
    require(meta.layout == other.meta.layout, "layouts differ")
    copy(df = df.unionByName(other.df))
  }

  /** Collapse duplicate keys with a per-band cell-wise aggregation —
    * multiband aggregate_by_cell (layer.py:1500). One keyed shuffle;
    * each band reduces through the same custom Aggregators the
    * single-band path uses (tile assembly stays inside them —
    * CLAUDE.md CollapseProject rule). */
  def aggregateByCell(op: String): MultibandLayer = {
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    def mk() = op match {
      case "Mean" | "Variance" | "StandardDeviation" =>
        udaf(new TileMomentsAgg(tl.tileSize, op), enc)
      case _ => udaf(new TileReduceAgg(tl.tileSize, CellOp.of(op)), enc)
    }
    val aggs = (0 until bandCount).map(i => mk()(element_at(col("bands"), i + 1)).as(s"_b$i"))
    val reduced = df.groupBy(col("col"), col("row")).agg(aggs.head, aggs.tail: _*)
    copy(df = reduced.select(col("col"), col("row"),
      array((0 until bandCount).map(i => col(s"_b$i")): _*).as("bands")))
  }

  /** Focal op on one band (multiband focal = per-band focal). */
  def focalBand(i: Int, nb: Neighborhood, op: String): RasterLayer =
    band(i).focal(nb, op)

  /** Focal op applied to every band, recombined into a stack. */
  def focalAll(nb: Neighborhood, op: String): MultibandLayer =
    MultibandLayer.fromLayers((0 until bandCount).map(focalBand(_, nb, op)))

  /** Fused focal chain on every band: one halo exchange per band for
    * the WHOLE chain (see [[Focal.focalChain]]), recombined into a
    * stack. */
  def focalChainAll(steps: (Neighborhood, String)*): MultibandLayer =
    MultibandLayer.fromLayers(
      (0 until bandCount).map(i => Focal.focalChain(band(i), steps)))

  /** Flatten to (x, y, band, v) rows, dropping NoData cells. */
  def toCells: DataFrame =
    df.select(col("col"), col("row"), posexplode(col("bands")).as(Seq("band", "tile")))
      .select(col("col"), col("row"), col("band").cast("int").as("band"),
        posexplode(col("tile")).as(Seq("off", "v")))
      .where(!isnan(col("v")))
      .select(
        (col("col").cast("long") * tc + col("off") % tc).as("x"),
        (col("row").cast("long") * tr + floor(col("off") / tc).cast("long")).as("y"),
        col("band"), col("v"))
}

object MultibandLayer {
  /** Band-count threshold where stacking switches from the join chain
    * to the union+aggregate path (see [[fromLayers]]). */
  val JoinStackMaxBands = 4

  /** Stack single-band layers into one multiband layer. A key missing
    * from a layer gets an all-NoData band (mirrors reference
    * combine_bands, combine_bands.py:9).
    *
    * Two physical strategies, picked by band count:
    *
    * - N <= [[JoinStackMaxBands]]: a chain of full-outer joins.
    *   Layer builds already hash-partition each side on (col, row),
    *   so every join satisfies its required distribution with ZERO
    *   additional exchanges — just sorts, and after the first join
    *   the intermediate stays key-sorted so later sorts are no-ops.
    *   Measured ~2x faster than the agg path at N=2 (the NDVI case).
    * - N > [[JoinStackMaxBands]]: union with a band ordinal +
    *   BandStackAgg — one extra shuffle, but each tile moves ONCE
    *   into the stack buffer. The join chain would re-materialize the
    *   growing band array N-1 times (O(N^2) bytes through the
    *   operators), which loses for wide stacks (hyperspectral). */
  def fromLayers(layers: Seq[RasterLayer]): MultibandLayer = {
    require(layers.nonEmpty)
    require(layers.forall(_.meta.layout == layers.head.meta.layout), "layouts differ")
    val tl = layers.head.meta.layout.tileLayout
    if (layers.length <= JoinStackMaxBands) {
      layers.map { l =>
        new MultibandLayer(
          l.df.select(col("col"), col("row"), array(col("tile")).as("bands")),
          l.meta, 1)
      }.reduce(_ stack _)
    } else {
      val tagged = layers.zipWithIndex.map { case (l, i) =>
        l.df.select(col("col"), col("row"), lit(i).as("_band"), col("tile"))
      }.reduce(_ unionByName _)
      val agg = udaf(new BandStackAgg(layers.length, tl.tileSize),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Seq[Double])]())
      val stacked = tagged.groupBy(col("col"), col("row"))
        .agg(agg(col("_band"), col("tile")).as("bands"))
      new MultibandLayer(stacked, layers.head.meta, layers.length)
    }
  }
}
