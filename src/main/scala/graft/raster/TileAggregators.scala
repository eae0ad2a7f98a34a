package graft.raster

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** NaN-aware cell combine ops (NaN == NoData). */
sealed trait CellOp extends Serializable {
  def apply(a: Double, b: Double): Double
}
object CellOp {
  case object Sum extends CellOp { def apply(a: Double, b: Double) = if (a.isNaN) b else if (b.isNaN) a else a + b }
  case object Min extends CellOp { def apply(a: Double, b: Double) = if (a.isNaN) b else if (b.isNaN) a else math.min(a, b) }
  case object Max extends CellOp { def apply(a: Double, b: Double) = if (a.isNaN) b else if (b.isNaN) a else math.max(a, b) }
  /** keep-right: later value wins (merge semantics). */
  case object Last extends CellOp { def apply(a: Double, b: Double) = if (b.isNaN) a else b }
  def of(name: String): CellOp = name match {
    case "Sum" => Sum; case "Min" => Min; case "Max" => Max; case "Last" => Last
    case s => throw new IllegalArgumentException(s)
  }
}

/** Builds a dense tile from (offset, value) cell rows in ONE aggregation:
  * map-side partials accumulate into a local Array[Double] buffer, so the
  * shuffle ships at most one tile per (key x upstream-partition) instead
  * of raw cells — the scale-correct rasterize/tiling shape (SURVEY §4).
  *
  * Replaces a collect_list + map_from_entries + per-element lookup plan
  * that Catalyst inlines into O(cells^2) per tile (measured 70s vs 2s at
  * sf0.001 — see git history).
  */
final class TileBuildAgg(size: Int, op: CellOp)
    extends Aggregator[(Int, Double), Array[Double], Seq[Double]] {
  def zero: Array[Double] = Array.fill(size)(Double.NaN)
  def reduce(buf: Array[Double], in: (Int, Double)): Array[Double] = {
    val (off, v) = in
    buf(off) = op(buf(off), v)
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { a(i) = op(a(i), b(i)); i += 1 }
    a
  }
  def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Cell-wise moments (count, sum, sum of squares) of tiles sharing a
  * key — backs aggregate_by_cell Mean/Variance/StandardDeviation
  * (reference aggregate_cells_test.py:99-134). Buffer holds 3 slots per
  * cell; same one-shuffle partial-agg shape as TileReduceAgg. */
final class TileMomentsAgg(size: Int, stat: String)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  // layout: [cnt(size) | sum(size) | sumsq(size)]
  def zero: Array[Double] = new Array[Double](3 * size)
  def reduce(buf: Array[Double], tile: Seq[Double]): Array[Double] = {
    // iterate, never index: the encoder deserializes Seq[Double] to a
    // List, whose apply is O(n) — indexing would make this O(size^2)
    var i = 0
    val it = tile.iterator
    while (i < size && it.hasNext) {
      val v = it.next()
      if (!v.isNaN) { buf(i) += 1; buf(size + i) += v; buf(2 * size + i) += v * v }
      i += 1
    }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 3 * size) { a(i) += b(i); i += 1 }
    a
  }
  def finish(buf: Array[Double]): Seq[Double] = {
    val out = new Array[Double](size)
    var i = 0
    while (i < size) {
      val n = buf(i); val s = buf(size + i); val ss = buf(2 * size + i)
      out(i) =
        if (n == 0) Double.NaN
        else stat match {
          case "Mean"     => s / n
          case "Variance" => if (n < 2) Double.NaN else (ss - s * s / n) / (n - 1)
          case "StandardDeviation" =>
            if (n < 2) Double.NaN else math.sqrt((ss - s * s / n) / (n - 1))
          case x => throw new IllegalArgumentException(x)
        }
      i += 1
    }
    out.toSeq
  }
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Ordered first-non-NoData cell combine — the engine of merge()
  * (reference layer.py:818-830 replacement rule: a cell's value is
  * replaced only while it is NoData). Input is (ordinal, tile); per
  * cell the non-NoData value with the LOWEST ordinal wins, making the
  * fold commutative ACROSS DISTINCT ORDINALS — map-side partial
  * aggregation stays exact under any shuffle order as long as each
  * ordinal carries one tile per key. Ties (duplicate keys within one
  * ordinal) fall to fold order, mirroring the reference's unordered
  * RDD fold — self-merge over conflicting duplicates is therefore
  * non-deterministic. */
final class TileFirstAgg(size: Int)
    extends Aggregator[(Int, Seq[Double]), Array[Double], Seq[Double]] {
  // buffer layout: [value(size) | ordinal(size)]; MaxValue = empty slot
  def zero: Array[Double] = {
    val b = new Array[Double](2 * size)
    java.util.Arrays.fill(b, 0, size, Double.NaN)
    java.util.Arrays.fill(b, size, 2 * size, Double.MaxValue)
    b
  }
  def reduce(buf: Array[Double], in: (Int, Seq[Double])): Array[Double] = {
    val (ord, tile) = in
    // iterator, not apply: the deserialized Seq is a List (O(n) apply)
    var i = 0
    val it = tile.iterator
    while (i < size && it.hasNext) {
      val v = it.next()
      if (!v.isNaN && ord < buf(size + i)) { buf(i) = v; buf(size + i) = ord }
      i += 1
    }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) {
      if (!b(i).isNaN && b(size + i) < a(size + i)) { a(i) = b(i); a(size + i) = b(size + i) }
      i += 1
    }
    a
  }
  def finish(buf: Array[Double]): Seq[Double] = buf.take(size).toSeq
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Assemble an N-band stack from (band, tile) rows sharing a tile key
  * — the single-shuffle engine of MultibandLayer.fromLayers (replaces
  * an N-1 chain of full-outer joins). Each input layer contributes at
  * most one tile per key, so each band slot has one writer and the
  * element-wise coalesce merge is exact; bands never written finish as
  * all-NoData (mirrors reference combine_bands padding). */
final class BandStackAgg(bands: Int, size: Int)
    extends Aggregator[(Int, Seq[Double]), Array[Double], Seq[Seq[Double]]] {
  def zero: Array[Double] = Array.fill(bands * size)(Double.NaN)
  def reduce(buf: Array[Double], in: (Int, Seq[Double])): Array[Double] = {
    val (band, tile) = in
    val base = band * size
    // iterator, not apply: the deserialized Seq is a List (O(n) apply)
    var i = 0
    val it = tile.iterator
    while (i < size && it.hasNext) { buf(base + i) = it.next(); i += 1 }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bands * size) { if (a(i).isNaN) a(i) = b(i); i += 1 }
    a
  }
  def finish(buf: Array[Double]): Seq[Seq[Double]] =
    (0 until bands).map(b => buf.slice(b * size, (b + 1) * size).toSeq)
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Seq[Double]]] = ExpressionEncoder[Seq[Seq[Double]]]()
}

/** Cell-wise reduction of whole tiles sharing a key — the engine of
  * aggregate_by_cell / merge (reference layer.py:818,1500). Same
  * one-shuffle, partial-agg shape as TileBuildAgg. */
final class TileReduceAgg(size: Int, op: CellOp)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  def zero: Array[Double] = Array.fill(size)(Double.NaN)
  def reduce(buf: Array[Double], tile: Seq[Double]): Array[Double] = {
    // iterator, not apply: the deserialized Seq is a List (O(n) apply)
    var i = 0
    val it = tile.iterator
    while (i < size && it.hasNext) { buf(i) = op(buf(i), it.next()); i += 1 }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { a(i) = op(a(i), b(i)); i += 1 }
    a
  }
  def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Per-cell linear TREND over a temporal layer's instants — the
  * change-detection composite (NDVI trend / land-cover drift): each
  * cell fits v = a + b*t by least squares across the instants where it
  * has data, and the output tile carries the slope b. Input is
  * (instant, tile); the buffer accumulates the five per-cell moments
  * [n | St | St2 | Sv | Stv], all exact integer-valued doubles for
  * integral cells and instants, so the fold is order-free and the ONLY
  * float op is the closing division. Cells with fewer than 2 distinct
  * instants (or zero time variance) emit NoData. Same one-shuffle
  * map-side-partial shape as TileMomentsAgg. */
final class TileTrendAgg(size: Int)
    extends Aggregator[(Long, Seq[Double]), Array[Double], Seq[Double]] {
  def zero: Array[Double] = new Array[Double](5 * size)
  def reduce(buf: Array[Double], in: (Long, Seq[Double])): Array[Double] = {
    val (t, tile) = in
    val td = t.toDouble
    var i = 0
    val it = tile.iterator
    while (i < size && it.hasNext) {
      val v = it.next()
      if (!v.isNaN) {
        buf(i) += 1
        buf(size + i) += td
        buf(2 * size + i) += td * td
        buf(3 * size + i) += v
        buf(4 * size + i) += td * v
      }
      i += 1
    }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 5 * size) { a(i) += b(i); i += 1 }
    a
  }
  def finish(buf: Array[Double]): Seq[Double] = {
    val out = new Array[Double](size)
    var i = 0
    while (i < size) {
      val n = buf(i); val st = buf(size + i); val st2 = buf(2 * size + i)
      val sv = buf(3 * size + i); val stv = buf(4 * size + i)
      val den = n * st2 - st * st
      out(i) = if (n < 2 || den == 0) Double.NaN else (n * stv - st * sv) / den
      i += 1
    }
    out.toSeq
  }
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Per-cell HARMONIC (seasonal) regression sums over a temporal
  * layer — the phenology-fitting composite (Landsat/MODIS harmonic
  * models fit v ≈ m + a·cos(2πt/T) + b·sin(2πt/T) per pixel): the
  * buffer accumulates [n | Σqc·v | Σqs·v] per cell where qc/qs are the
  * MICRO-QUANTIZED weights round(cos|sin(2πt/T)·10⁶) — exact
  * integer-valued doubles for integral cells (products < 2^53), so
  * the fold is order-free and oracle-twinnable; amplitude/phase are
  * one closing atan2/sqrt away for the caller. Cells with no data
  * emit NoData on all three outputs. Same one-shuffle map-side-partial
  * shape as TileTrendAgg. */
final class TileHarmonicAgg(size: Int, period: Double)
    extends Aggregator[(Long, Seq[Double]), Array[Double], Seq[Double]] {
  def zero: Array[Double] = new Array[Double](3 * size)
  def reduce(buf: Array[Double], in: (Long, Seq[Double])): Array[Double] = {
    val (t, tile) = in
    val qc = math.rint(math.cos(2 * math.Pi * t / period) * 1e6)
    val qs = math.rint(math.sin(2 * math.Pi * t / period) * 1e6)
    var i = 0
    val it = tile.iterator
    while (i < size && it.hasNext) {
      val v = it.next()
      if (!v.isNaN) {
        buf(i) += 1
        buf(size + i) += qc * v
        buf(2 * size + i) += qs * v
      }
      i += 1
    }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 3 * size) { a(i) += b(i); i += 1 }
    a
  }
  def finish(buf: Array[Double]): Seq[Double] = {
    val out = new Array[Double](3 * size)
    var i = 0
    while (i < size) {
      if (buf(i) == 0) {
        out(i) = Double.NaN; out(size + i) = Double.NaN; out(2 * size + i) = Double.NaN
      } else {
        out(i) = buf(i); out(size + i) = buf(size + i); out(2 * size + i) = buf(2 * size + i)
      }
      i += 1
    }
    out.toSeq
  }
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Per-cell temporal MAX composite with the instant achieving it — the
  * remote-sensing "greenest pixel + day of peak" composite. Input is
  * (instant, tile); per cell the largest value wins and ties break to
  * the SMALLEST instant (order-free fold). Output packs [max | arg]
  * as a 2*size array the caller slices into two tiles; arg is NoData
  * where the cell never had data. */
final class TileArgmaxAgg(size: Int)
    extends Aggregator[(Long, Seq[Double]), Array[Double], Seq[Double]] {
  def zero: Array[Double] = Array.fill(2 * size)(Double.NaN)
  def reduce(buf: Array[Double], in: (Long, Seq[Double])): Array[Double] = {
    val (t, tile) = in
    val td = t.toDouble
    var i = 0
    val it = tile.iterator
    while (i < size && it.hasNext) {
      val v = it.next()
      if (!v.isNaN && (buf(i).isNaN || v > buf(i) ||
          (v == buf(i) && td < buf(size + i)))) {
        buf(i) = v; buf(size + i) = td
      }
      i += 1
    }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) {
      val v = b(i)
      if (!v.isNaN && (a(i).isNaN || v > a(i) ||
          (v == a(i) && b(size + i) < a(size + i)))) {
        a(i) = v; a(size + i) = b(size + i)
      }
      i += 1
    }
    a
  }
  def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
