package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Polyline simplification by Douglas-Peucker (Douglas & Peucker
  * 1973 — the geotrellis `vector.simplify` / JTS `DouglasPeucker`
  * surface, re-derived with EXACT integer predicates).
  *
  * Determinism: coordinates double to Longs (the Hull convention), so
  * the split test cross² > (2·eps)²·len² is exact integer arithmetic
  * whenever (2·eps)² is integral (eps = 4.0 -> 64); the split vertex
  * is the FIRST maximum (strict > while scanning), so recursion order
  * is pinned. No epsilons, no float distance anywhere.
  *
  * Scale shape: features simplify independently — one groupByKey on
  * the feature id, the per-feature DP runs in-executor (O(n²) worst
  * case on the feature's OWN vertex count, guarded by `maxVertices`
  * with a loud failure — the kriging-fit ceiling precedent). The
  * vertex table never joins itself.
  */
object Simplify {

  /** DP keep-mask over doubled-integer coords; eps in ORIGINAL units.
    * Endpoints always kept; interior vertices kept iff some recursion
    * level finds their deviation strictly above eps. */
  private[vector] def dpKeep(pts: IndexedSeq[(Long, Long)], eps: Double): Array[Boolean] = {
    val n = pts.length
    val keep = Array.fill(n)(false)
    if (n == 0) return keep
    keep(0) = true; keep(n - 1) = true
    val e2 = 4.0 * eps * eps // (2 eps)^2 in doubled units
    def rec(lo: Int, hi: Int): Unit = if (hi > lo + 1) {
      val (ax, ay) = pts(lo); val (bx, by) = pts(hi)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      // within one recursion level len2 is FIXED, so the argmax of
      // deviation² = argmax of the exact Long numerator — no division
      // ever happens; the split test compares exact integers
      var best = -1; var bestNum = -1L
      var i = lo + 1
      while (i < hi) {
        val (px, py) = pts(i)
        val num =
          if (len2 == 0) { val ux = px - ax; val uy = py - ay; ux * ux + uy * uy }
          else { val c = dx * (py - ay) - dy * (px - ax); c * c }
        if (num > bestNum) { bestNum = num; best = i } // strict > -> first max wins
        i += 1
      }
      val split =
        if (len2 == 0) bestNum.toDouble > e2
        else bestNum.toDouble > e2 * len2
      if (split) { keep(best) = true; rec(lo, best); rec(best, hi) }
    }
    rec(0, n - 1)
    keep
  }

  /** Simplify every feature of `lines` (fid, pid, px, py — vertices
    * ordered by pid within fid, half-integral coords): returns only
    * the KEPT vertices. */
  def simplifyLines(lines: DataFrame, eps: Double,
                    maxVertices: Int = 1 << 20): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("fid").cast("long"), col("pid").cast("long"),
        (col("px") * 2).cast("long"), (col("py") * 2).cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (fid: Long, it: Iterator[(Long, Long, Long, Long)]) =>
        val vs = it.toArray.sortBy(_._2)
        require(vs.length <= maxVertices,
          s"feature $fid has ${vs.length} vertices > maxVertices=$maxVertices; " +
            "pre-chunk the feature or raise the ceiling")
        val keep = dpKeep(vs.map(v => (v._3, v._4)).toIndexedSeq, eps)
        vs.indices.filter(keep).map(i =>
          (fid, vs(i)._2, vs(i)._3.toDouble / 2, vs(i)._4.toDouble / 2))
      }
      .toDF("fid", "pid", "px", "py")
  }

  /** Driver-side twin for oracle construction: kept pids of one
    * feature given (pid, px, py) vertices. */
  def keptPids(pts: Seq[(Long, Double, Double)], eps: Double): Seq[Long] = {
    val vs = pts.sortBy(_._1)
    val keep = dpKeep(vs.map(p => ((p._2 * 2).toLong, (p._3 * 2).toLong)).toIndexedSeq, eps)
    vs.indices.filter(keep).map(vs(_)._1)
  }

  // ------------------------------------------------ Visvalingam–Whyatt

  /** Visvalingam–Whyatt keep-mask (Visvalingam & Whyatt 1993 — the
    * area-based alternative JTS exposes as VWSimplifier): iteratively
    * drop the interior vertex whose triangle with its LIVE neighbors
    * has the smallest effective area, until every remaining interior
    * vertex's area is ≥ `minArea` (original units).
    *
    * Determinism: on doubled-integer coords the triangle cross product
    * is an exact Long and |cross_doubled| = 8·area, so the drop test
    * |cross| < 8·minArea is exact whenever 8·minArea is integral; ties
    * drop the EARLIEST vertex (strict < while scanning). Endpoints
    * always survive. */
  private[vector] def vwKeep(pts: IndexedSeq[(Long, Long)], minArea: Double): Array[Boolean] = {
    val n = pts.length
    val alive = Array.fill(n)(true)
    if (n <= 2) return alive
    val thresh = 8.0 * minArea
    def cross(i: Int, j: Int, k: Int): Double = {
      val (ax, ay) = pts(i); val (bx, by) = pts(j); val (cx, cy) = pts(k)
      math.abs(((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)).toDouble)
    }
    def prev(i: Int): Int = { var p = i - 1; while (!alive(p)) p -= 1; p }
    def next(i: Int): Int = { var q = i + 1; while (!alive(q)) q += 1; q }
    var continue = true
    while (continue) {
      var best = -1
      var bestA = Double.MaxValue
      var i = 1
      while (i < n - 1) {
        if (alive(i)) {
          val a = cross(prev(i), i, next(i))
          if (a < bestA) { bestA = a; best = i } // strict < -> first min wins
        }
        i += 1
      }
      if (best >= 0 && bestA < thresh) alive(best) = false else continue = false
    }
    alive
  }

  /** [[simplifyLines]]'s area-criterion sibling: VW-simplify every
    * feature, returning only kept vertices. The in-executor loop
    * rescans live vertices per removal (O(n²) on the feature's OWN
    * vertex count), so the ceiling is tighter than DP's — pre-chunk
    * monster features. */
  def simplifyLinesVW(lines: DataFrame, minArea: Double,
                      maxVertices: Int = 1 << 14): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("fid").cast("long"), col("pid").cast("long"),
        (col("px") * 2).cast("long"), (col("py") * 2).cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (fid: Long, it: Iterator[(Long, Long, Long, Long)]) =>
        val vs = it.toArray.sortBy(_._2)
        require(vs.length <= maxVertices,
          s"feature $fid has ${vs.length} vertices > maxVertices=$maxVertices; " +
            "pre-chunk the feature or raise the ceiling")
        val keep = vwKeep(vs.map(v => (v._3, v._4)).toIndexedSeq, minArea)
        vs.indices.filter(keep).map(i =>
          (fid, vs(i)._2, vs(i)._3.toDouble / 2, vs(i)._4.toDouble / 2))
      }
      .toDF("fid", "pid", "px", "py")
  }

  /** Driver-side VW twin for oracle construction. */
  def keptPidsVW(pts: Seq[(Long, Double, Double)], minArea: Double): Seq[Long] = {
    val vs = pts.sortBy(_._1)
    val keep = vwKeep(vs.map(p => ((p._2 * 2).toLong, (p._3 * 2).toLong)).toIndexedSeq, minArea)
    vs.indices.filter(keep).map(vs(_)._1)
  }
}
