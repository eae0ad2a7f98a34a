package graft.render

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Color mapping: cell value -> color index by classification breaks.
  *
  * Reference: geopyspark/geotrellis/color.py ColorMap (from_break_map /
  * from_colors / from_histogram :95) with ClassificationStrategy
  * (constants.py:175) and the named ramps (color.py get_colors_from_
  * matplotlib / COLOR_RAMPS). The map to RGBA ints is a driver-side
  * ramp lookup; the per-cell classification below is the distributed
  * part (codegen'd CASE chain, no UDF).
  */
object ColorMap {
  /** Every ColorRamp name the reference enumerates (constants.py:233)
    * plus Grayscale, as ARGB stop lists. Stops are this library's own
    * literals (perceptual approximations of the well-known public
    * palettes — matplotlib's viridis family endpoints, classic GIS
    * gradient pairs); what the reference contract fixes is the NAME
    * surface and name -> monotone gradient behavior, and colors are
    * deterministic literals on every engine. */
  val Ramps: Map[String, IndexedSeq[Int]] = Map(
    "Hot"          -> IndexedSeq(0xFF000000, 0xFFE60000, 0xFFFF8000, 0xFFFFFF00, 0xFFFFFFFF),
    "CoolWarm"     -> IndexedSeq(0xFF3B4CC0, 0xFF8DB0FE, 0xFFDDDDDD, 0xFFF49A7B, 0xFFB40426),
    "Magma"        -> IndexedSeq(0xFF000004, 0xFF711F81, 0xFFB63679, 0xFFF1605D, 0xFFFCFDBF),
    "Inferno"      -> IndexedSeq(0xFF000004, 0xFF6A176E, 0xFFBA3655, 0xFFF98C0A, 0xFFFCFFA4),
    "Plasma"       -> IndexedSeq(0xFF0D0887, 0xFF7E03A8, 0xFFCB4678, 0xFFF89441, 0xFFF0F921),
    "Viridis"      -> IndexedSeq(0xFF440154, 0xFF3B528B, 0xFF21918C, 0xFF5EC962, 0xFFFDE725),
    "BlueToOrange" -> IndexedSeq(0xFF2586AB, 0xFF67A9CF, 0xFFF6E8C3, 0xFFEF8A62, 0xFFB2182B),
    "LightYellowToOrange" -> IndexedSeq(0xFFFFFFCC, 0xFFFED976, 0xFFFD8D3C, 0xFFE31A1C),
    "BlueToRed"    -> IndexedSeq(0xFF2791C3, 0xFF5DA1CA, 0xFFCB5A5A, 0xFFA52A2A),
    "GreenToRedOrange" -> IndexedSeq(0xFF1A9850, 0xFFA6D96A, 0xFFFDAE61, 0xFFD73027),
    "LightToDarkSunset" -> IndexedSeq(0xFFFFF7EC, 0xFFFDBB84, 0xFFE34A33, 0xFF7F0000),
    "LightToDarkGreen" -> IndexedSeq(0xFFF7FCF5, 0xFFA1D99B, 0xFF41AB5D, 0xFF00441B),
    "HeatmapYellowToRed" -> IndexedSeq(0xFFFFFFB2, 0xFFFECC5C, 0xFFFD8D3C, 0xFFE31A1C),
    "HeatmapBlueToYellowToRedSpectrum" ->
      IndexedSeq(0xFF2B83BA, 0xFFABDDA4, 0xFFFFFFBF, 0xFFFDAE61, 0xFFD7191C),
    "HeatmapDarkRedToYellowWhite" ->
      IndexedSeq(0xFF7F0000, 0xFFD7301F, 0xFFFC8D59, 0xFFFDD49E, 0xFFFFFFE5),
    "HeatmapLightPurpleToDarkPurpleToWhite" ->
      IndexedSeq(0xFFDADAEB, 0xFF9E9AC8, 0xFF6A51A3, 0xFF3F007D, 0xFFFFFFFF),
    "ClassificationBoldLandUse" ->
      IndexedSeq(0xFFB2ADD3, 0xFFC9B6A4, 0xFFDBD6BD, 0xFF70A880, 0xFFE8C19A),
    "ClassificationMutedTerrain" ->
      IndexedSeq(0xFFCEE1E8, 0xFF7CBCB5, 0xFF82B36D, 0xFF94C279, 0xFFD1DE8D),
    "Grayscale"    -> IndexedSeq(0xFF000000, 0xFFFFFFFF))

  /** NLCD land-cover class colors — reference color.py:53
    * nlcd_color_map (the public MRLC palette), stored ARGB (the
    * reference lists RGBA words; 0 stays fully transparent). */
  val NlcdColorMap: Map[Double, Int] = Map[Int, Int](
    0  -> 0x00000000,
    11 -> 0xFF526095, 12 -> 0xFFFFFFFF,
    21 -> 0xFFD28170, 22 -> 0xFFEE0006, 23 -> 0xFF990009,
    31 -> 0xFFBFB8B1, 32 -> 0xFF969798, 33 -> 0xFF382959,
    41 -> 0xFF579D57, 42 -> 0xFF2A6B3D, 43 -> 0xFFA6BF7B,
    51 -> 0xFFBAA65C, 61 -> 0xFF45511F, 71 -> 0xFFD0CFAA,
    81 -> 0xFFCCC82F, 82 -> 0xFF9D5D1D, 83 -> 0xFFCD9747,
    84 -> 0xFFA7AB9F, 85 -> 0xFFE68A2A,
    91 -> 0xFFB6D8F5, 92 -> 0xFFB6D8F5
  ).map { case (k, v) => k.toDouble -> v }

  /** Exact-value color map — reference ColorMap.from_break_map
    * (color.py:133): each listed cell value maps to its color, any
    * other value to `fallback`. Compiles to a codegen'd CASE chain
    * (keys sorted for a deterministic plan); no UDF, no shuffle. */
  def fromBreakMap(v: Column, breakMap: Map[Double, Int],
                   fallback: Int = 0x00000000): Column = {
    // ONE flat CaseWhen (when().when()...otherwise()), not a foldLeft
    // of nested otherwise(acc) CASEs: a 21-deep nested CASE re-states
    // the scrutinee per level and can fall out of whole-stage codegen
    // (the r12 q_color_nlcd 3x driver-bench regression); the flat
    // chain is a single short-circuiting branch table.
    val sorted = breakMap.toSeq.sortBy(_._1)
    if (sorted.isEmpty) lit(fallback)
    else sorted.tail.foldLeft(when(v === sorted.head._1, lit(sorted.head._2))) {
      case (acc, (value, color)) => acc.when(v === value, lit(color))
    }.otherwise(lit(fallback))
  }

  /** Reference color.py:249 nlcd_colormap as a ready-made column. */
  def nlcdColor(v: Column): Column = fromBreakMap(v, NlcdColorMap)

  /** Interpolate a named ramp to exactly `n` ARGB colors (reference
    * color.py ColorRamp resampling — get_colors :44): linear per-channel
    * lerp between the ramp's stops, integer-rounded driver-side, so the
    * resulting colors are deterministic literals on every engine. */
  def rampColors(ramp: String, n: Int): IndexedSeq[Int] = {
    val stops = Ramps.getOrElse(ramp, Ramps.collectFirst {
      case (k, v) if k.equalsIgnoreCase(ramp.trim) => v
    }.getOrElse(
      throw new IllegalArgumentException(s"unknown ramp $ramp (have ${Ramps.keys.mkString(", ")})")))
    require(n >= 1)
    if (n == 1) IndexedSeq(stops.head)
    else (0 until n).map { i =>
      val t = i.toDouble * (stops.length - 1) / (n - 1)
      val lo = math.min(stops.length - 1, t.toInt)
      val hi = math.min(stops.length - 1, lo + 1)
      val f = t - lo
      def ch(c: Int, shift: Int) = (c >>> shift) & 0xFF
      def lerp(shift: Int): Int =
        math.round(ch(stops(lo), shift) * (1.0 - f) + ch(stops(hi), shift) * f).toInt
      (lerp(24) << 24) | (lerp(16) << 16) | (lerp(8) << 8) | lerp(0)
    }
  }

  /** The reference's get_colors_from_matplotlib surface (color.py:30):
    * matplotlib-spelled (lowercase) ramp names resample to `n` colors.
    * The viridis-family stops here are the PUBLISHED quartile anchor
    * colors of each matplotlib colormap with linear RGB interpolation
    * between them — not the full 256-entry lookup tables (those are
    * data files this zero-egress build cannot retrieve; the anchors
    * are the widely-cited hex values). Swapping in the full tables is
    * a drop-in [[Ramps]] change; the NAME surface and monotone
    * gradient contract — what the reference API fixes — hold today. */
  def fromMatplotlib(name: String, n: Int = 256): IndexedSeq[Int] =
    rampColors(name, n)

  /** Classify a cell-value column into break indexes (first break the
    * value is <= / < / >= / > of, by strategy; -1 = unclassified). */
  def classify(v: Column, breaks: Seq[Double], strategy: String = "LessThanOrEqualTo"): Column = {
    val cmp: (Column, Double) => Column = strategy match {
      case "LessThanOrEqualTo"    => (x, b) => x <= b
      case "LessThan"             => (x, b) => x < b
      case "GreaterThanOrEqualTo" => (x, b) => x >= b
      case "GreaterThan"          => (x, b) => x > b
      case "Exact"                => (x, b) => x === b
      case s                      => throw new IllegalArgumentException(s)
    }
    val ordered = if (strategy.startsWith("Greater")) breaks.sorted.reverse else breaks.sorted
    if (ordered.isEmpty) return lit(-1)
    // flat CaseWhen, first break checked first (same short-circuit
    // order as the previous nested build, single CASE in the plan)
    ordered.zipWithIndex.tail
      .foldLeft(when(cmp(v, ordered.head), lit(0))) { case (acc, (b, i)) =>
        acc.when(cmp(v, b), lit(i))
      }.otherwise(lit(-1))
  }

  /** Break index -> ARGB color via a ramp. */
  def colorFor(idx: Column, ramp: String): Column = colorFor(idx, Ramps(ramp))

  /** Break index -> ARGB color from an explicit color list
    * (unclassified/-1 falls through to transparent 0). */
  def colorFor(idx: Column, colors: IndexedSeq[Int]): Column =
    if (colors.isEmpty) lit(0)
    else colors.zipWithIndex.tail
      .foldLeft(when(idx === 0, lit(colors.head))) { case (acc, (argb, i)) =>
        acc.when(idx === i, lit(argb))
      }.otherwise(lit(0))

  /** Classify + colorize in one expression: value -> ARGB through
    * `breaks` with the ramp interpolated to breaks.length colors —
    * the reference's ColorMap.from_colors(breaks, ramp) applied
    * distributed. */
  def colorize(v: Column, breaks: Seq[Double], ramp: String,
               strategy: String = "LessThanOrEqualTo"): Column =
    colorFor(classify(v, breaks, strategy), rampColors(ramp, breaks.length))

  /** Build break values from a layer histogram at equal quantile
    * fractions, then colorize — the reference ColorMap.from_histogram
    * (color.py:95). Break computation is one tiny aggregate; the
    * result is a driver-side Seq for the codegen'd CASE chain. */
  def fromHistogram(layer: graft.raster.RasterLayer, ramp: String, n: Int): Column = {
    val qs = (1 to n).map(_.toDouble / n)
    val breaks = graft.raster.HistogramOps.approxQuantileBreaks(layer, qs)
    colorize(col("v"), breaks.toIndexedSeq, ramp)
  }
}
