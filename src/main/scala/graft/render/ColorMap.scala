package graft.render

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Color mapping: cell value -> color index by classification breaks.
  *
  * Reference: geopyspark/geotrellis/color.py ColorMap (from_break_map /
  * from_colors) with ClassificationStrategy (constants.py:175). The
  * map to RGBA ints is a driver-side ramp lookup; the per-cell
  * classification below is the distributed part (codegen'd CASE chain,
  * no UDF). PNG encoding is out of scope round 1 (SURVEY §5).
  */
object ColorMap {
  /** A handful of the reference's ramps (constants.py:233), as ARGB. */
  val Ramps: Map[String, IndexedSeq[Int]] = Map(
    "Hot"          -> IndexedSeq(0xFF000000, 0xFFE60000, 0xFFFF8000, 0xFFFFFF00, 0xFFFFFFFF),
    "BlueToRed"    -> IndexedSeq(0xFF2791C3, 0xFF5DA1CA, 0xFFCB5A5A, 0xFFA52A2A),
    "Viridis"      -> IndexedSeq(0xFF440154, 0xFF3B528B, 0xFF21918C, 0xFF5EC962, 0xFFFDE725))

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
    ordered.zipWithIndex.reverse.foldLeft(lit(-1)) { case (elseC, (b, i)) =>
      when(cmp(v, b), lit(i)).otherwise(elseC)
    }
  }

  /** Break index -> ARGB color via a ramp. */
  def colorFor(idx: Column, ramp: String): Column = {
    val colors = Ramps(ramp)
    colors.zipWithIndex.reverse.foldLeft(lit(0)) { case (elseC, (argb, i)) =>
      when(idx === i, lit(argb)).otherwise(elseC)
    }
  }
}
