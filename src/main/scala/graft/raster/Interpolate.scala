package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LayoutDefinition

/** Point-to-raster interpolation.
  *
  * IDW (inverse-distance-weighted) surfaces — the geotrellis
  * `InverseDistanceWeighted` operation (public; the reference exposes
  * its resample/interpolation constants via
  * geopyspark/geotrellis/__init__.py), re-expressed as a declarative
  * per-point disk enumeration: each point emits the cells inside its
  * `radius` disk (two sequence explodes, the Rasterize broadcast-
  * offset pattern), and one hash aggregation per cell combines the
  * weights. No driver-side point collect, no full-grid enumeration —
  * work scales with points x disk area and the single shuffle is the
  * per-cell groupBy.
  *
  * Determinism contract (the Similarity fixed-point trick): with
  * half-cell-aligned points, every cell-center offset is integral, so
  * d^2 is an exact integer-valued double; weights quantize ONCE to
  * w_q = round(1e9 / d^2) (BIGINT) and both aggregations are exact
  * integer sums — order-free — with a single IEEE division at the
  * end. A cell containing a point exactly (d = 0) takes that point's
  * value verbatim (the standard IDW exact-hit rule).
  */
object Interpolate {

  /** IDW over `points` (pid, px, py, `valueCol` integral) onto the
    * layout's grid, power = 2, cells further than `radius` from every
    * point left NoData (absent). Output cells (x, y, v). */
  def idw(points: DataFrame, layout: LayoutDefinition, radius: Int = 16,
          valueCol: String = "value"): DataFrame = {
    require(radius >= 1)
    val tl = layout.tileLayout
    val (gc, gr) = (tl.layoutCols.toLong * tl.tileCols, tl.layoutRows.toLong * tl.tileRows)
    val r2 = radius.toLong * radius
    val ddx = col("px") - (col("x") + lit(0.5))
    val ddy = col("py") - (col("y") + lit(0.5))
    points
      .select(col("pid"), col("px"), col("py"), col(valueCol).cast("long").as("pv"))
      .withColumn("dx", explode(sequence(lit(-radius), lit(radius))))
      .withColumn("dy", explode(sequence(lit(-radius), lit(radius))))
      .select(col("pid"), col("px"), col("py"), col("pv"),
        (floor(col("px")) + col("dx")).as("x"),
        (floor(col("py")) + col("dy")).as("y"))
      .where(col("x") >= 0 && col("x") < gc && col("y") >= 0 && col("y") < gr)
      .withColumn("d2", ddx * ddx + ddy * ddy)
      .where(col("d2") <= r2)
      .withColumn("wq",
        when(col("d2") > 0, round(lit(1e9) / col("d2")).cast("long")).otherwise(lit(0L)))
      .groupBy("x", "y")
      .agg(sum(col("wq") * col("pv")).as("swv"), sum(col("wq")).as("sw"),
        min(when(col("d2") === 0, col("pv"))).as("hit"))
      .select(col("x"), col("y"),
        when(col("hit").isNotNull, col("hit").cast("double"))
          .otherwise(col("swv").cast("double") / col("sw").cast("double")).as("v"))
  }

  /** TIN (triangulated-irregular-network) interpolation — the
    * geotrellis `geotrellis.raster.triangulation` rasterization of a
    * Delaunay TIN: triangulate the sample points, then fill every
    * cell whose center falls inside a triangle with the barycentric
    * linear interpolation of the three vertex values; cells outside
    * the hull stay NoData (absent).
    *
    * Scale shape: the triangulation is a DRIVER-side solve over the
    * operator's small sample argument (the kriging-fit precedent),
    * guarded by `maxPoints`; the rasterization is fully distributed —
    * the triangle list broadcasts and each layout tile scans only its
    * own cells against the triangles whose bbox meets the tile.
    *
    * Determinism: half-cell-aligned points double to exact integers;
    * the point-in-triangle tests and barycentric numerators are exact
    * Long cross products; the ONLY float op is the final
    * `(wa*za + wb*zb + wc*cz) / det` division. A cell on a shared
    * edge or vertex is claimed by the first triangle in canonical
    * order, but linear interpolation AGREES across shared boundaries,
    * so the value is choice-independent.
    *
    * @param points (pid, px, py, `valueCol` integral), half-aligned
    * @return cells (x, y, v) inside the hull */
  def tin(spark: org.apache.spark.sql.SparkSession, points: DataFrame,
          layout: LayoutDefinition, valueCol: String = "value",
          maxPoints: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val tl = layout.tileLayout
    val (tc, tr, lc, lr) = (tl.tileCols, tl.tileRows, tl.layoutCols, tl.layoutRows)
    val pts = points.select(col("pid").cast("long"), col("px").cast("double"),
        col("py").cast("double"), col(valueCol).cast("long"))
      .orderBy("pid").limit(maxPoints + 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    require(pts.length <= maxPoints,
      s"tin: more than $maxPoints sample points — the triangulation is a " +
        "driver-side solve; rasterize + resample for data-scale inputs")
    val tris = graft.vector.Delaunay.triangulate(pts.map(p => (p._2, p._3)))
    // (ax, ay, az, bx, by, bz, cx, cy, cz) in doubled coords, canonical order
    val triArr = tris.map { case (i, j, k) =>
      ((pts(i)._2 * 2).toLong, (pts(i)._3 * 2).toLong, pts(i)._4,
       (pts(j)._2 * 2).toLong, (pts(j)._3 * 2).toLong, pts(j)._4,
       (pts(k)._2 * 2).toLong, (pts(k)._3 * 2).toLong, pts(k)._4)
    }
    val bc = spark.sparkContext.broadcast(triArr)
    val nTiles = lc.toLong * lr
    spark.range(0, nTiles, 1, math.min(nTiles, spark.sparkContext.defaultParallelism).toInt)
      .as[Long]
      .flatMap { t =>
        val all = bc.value
        val tx = (t % lc).toInt; val ty = (t / lc).toInt
        val x0 = tx.toLong * tc; val y0 = ty.toLong * tr
        // doubled-coordinate tile bounds for the bbox prune
        val bx0 = 2 * x0; val bx1 = 2 * (x0 + tc); val by0 = 2 * y0; val by1 = 2 * (y0 + tr)
        val cand = all.filter { case (ax, ay, _, bx, by, _, cx, cy, _) =>
          math.max(ax, math.max(bx, cx)) >= bx0 && math.min(ax, math.min(bx, cx)) <= bx1 &&
          math.max(ay, math.max(by, cy)) >= by0 && math.min(ay, math.min(by, cy)) <= by1
        }
        if (cand.isEmpty) Iterator.empty
        else Iterator.tabulate(tc * tr) { o =>
          val x = x0 + o % tc; val y = y0 + o / tc
          val qx = 2 * x + 1; val qy = 2 * y + 1
          var v = Double.NaN
          var j = 0
          while (j < cand.length && v.isNaN) {
            val (ax, ay, az, bx, by, bz, cx, cy, cz) = cand(j)
            val det = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            val wa = (bx - qx) * (cy - qy) - (by - qy) * (cx - qx)
            val wb = (cx - qx) * (ay - qy) - (cy - qy) * (ax - qx)
            val wc = (ax - qx) * (by - qy) - (ay - qy) * (bx - qx)
            val inside = if (det > 0) wa >= 0 && wb >= 0 && wc >= 0
                         else wa <= 0 && wb <= 0 && wc <= 0
            if (inside) v = (wa * az + wb * bz + wc * cz).toDouble / det
            j += 1
          }
          (x, y, v)
        }.filter(!_._3.isNaN)
      }
      .toDF("x", "y", "v")
  }

  /** Kernel density — the geotrellis `KernelDensity` operation
    * (public): every point stamps a kernel onto the cells around it
    * and stamps sum per cell. The kernel is the Epanechnikov-family
    * parabola w = R^2 - d^2 (support d^2 < R^2): with half-cell-
    * aligned points d^2 is an exact integer, so each cell's density
    * is an exact integer sum of w * value — order-free, no rounding
    * anywhere. Same per-point disk enumeration and single groupBy as
    * [[idw]]; cells outside every kernel are absent (NoData). */
  def kernelDensity(points: DataFrame, layout: LayoutDefinition, radius: Int = 8,
                    valueCol: String = "value"): DataFrame = {
    require(radius >= 1)
    val tl = layout.tileLayout
    val (gc, gr) = (tl.layoutCols.toLong * tl.tileCols, tl.layoutRows.toLong * tl.tileRows)
    val r2 = radius.toLong * radius
    val ddx = col("px") - (col("x") + lit(0.5))
    val ddy = col("py") - (col("y") + lit(0.5))
    points
      .select(col("px"), col("py"), col(valueCol).cast("long").as("pv"))
      .withColumn("dx", explode(sequence(lit(-radius), lit(radius))))
      .withColumn("dy", explode(sequence(lit(-radius), lit(radius))))
      .select(col("px"), col("py"), col("pv"),
        (floor(col("px")) + col("dx")).as("x"),
        (floor(col("py")) + col("dy")).as("y"))
      .where(col("x") >= 0 && col("x") < gc && col("y") >= 0 && col("y") < gr)
      .withColumn("d2", (ddx * ddx + ddy * ddy).cast("long"))
      .where(col("d2") < r2)
      .groupBy("x", "y")
      .agg(sum((lit(r2) - col("d2")) * col("pv")).as("den"))
      .select(col("x"), col("y"), col("den").cast("double").as("v"))
  }

  // ------------------------------------------------------------------
  // Simple kriging (geotrellis.raster.interpolation Kriging family).
  //
  // Fit: solve (C + nugget I) b = z once, driver-side, over the N
  // sample points (N is small — the fit is O(N^3) on N scalars, the
  // standard kriging shape); predict: v(x) = sum_j b_j cov(h_xj), a
  // pure per-cell expression with the b_j folded in as literals —
  // shuffle-free, scales with cells, not cells x solves.
  //
  // Determinism contract: spherical covariance uses only IEEE-pinned
  // ops (+,-,*,/ and correctly-rounded sqrt), the Gaussian elimination
  // runs WITHOUT pivoting in a fixed op order (the matrix is positive
  // definite: spherical model + positive nugget), and [[krigingSql]]
  // states the IDENTICAL elimination unrolled step-by-step, so engine
  // and oracle produce bit-identical weights from the same z values.
  // Both sides close micro-quantized: round(v*1e6) as BIGINT (the
  // portable integer form; no decimal rounding anywhere).
  // ------------------------------------------------------------------

  /** Spherical covariance, sill 1: 1 - (1.5 h/a - 0.5 (h/a)^3), 0 at
    * h >= a. Stated with the exact op order [[krigingSql]] emits. */
  def sphericalCov(h: Double, range: Double): Double =
    if (h >= range) 0.0
    else 1.0 - 1.5 * (h / range) + 0.5 * (h / range) * (h / range) * (h / range)

  private def covExprSql(h: String, range: Double): String =
    s"CASE WHEN $h >= $range THEN 0.0 ELSE 1.0 - 1.5 * ($h / $range) + 0.5 * ($h / $range) * ($h / $range) * ($h / $range) END"

  /** Solve (C + nugget I) b = z for the kriging weights; `pts` are
    * (px, py, z). Unpivoted forward elimination then back-
    * substitution, op order mirrored verbatim by [[krigingSql]]. */
  def krigingWeights(pts: Array[(Double, Double, Double)],
                     range: Double, nugget: Double): Array[Double] = {
    val n = pts.length
    val c = Array.tabulate(n, n) { (i, j) =>
      val dx = pts(i)._1 - pts(j)._1
      val dy = pts(i)._2 - pts(j)._2
      val v = sphericalCov(math.sqrt(dx * dx + dy * dy), range)
      if (i == j) v + nugget else v
    }
    val z = pts.map(_._3)
    var k = 0
    while (k < n) {
      var i = k + 1
      while (i < n) {
        val f = c(i)(k) / c(k)(k)
        var j = k
        while (j < n) { c(i)(j) = c(i)(j) - f * c(k)(j); j += 1 }
        z(i) = z(i) - f * z(k)
        i += 1
      }
      k += 1
    }
    val b = new Array[Double](n)
    var i2 = n - 1
    while (i2 >= 0) {
      var s = z(i2)
      var j = i2 + 1
      while (j < n) { s = s - c(i2)(j) * b(j); j += 1 }
      b(i2) = s / c(i2)(i2)
      i2 -= 1
    }
    b
  }

  /** Simple-kriging surface over a dense gridSize x gridSize raster
    * from N points (px, py, z) with px/py integral. Returns
    * (x, y, v). The per-cell prediction is one fused expression; at
    * scale the grid enumeration would come from the tile layout, the
    * math is unchanged. */
  def simpleKriging(spark: org.apache.spark.sql.SparkSession,
                    pts: Array[(Double, Double, Double)], gridSize: Int,
                    range: Double, nugget: Double): DataFrame = {
    val b = krigingWeights(pts, range, nugget)
    val xs = spark.range(0, gridSize).select(col("id").as("x"))
    val ys = spark.range(0, gridSize).select(col("id").as("y"))
    val pred = pts.indices.map { j =>
      val dx = col("x").cast("double") - lit(pts(j)._1)
      val dy = col("y").cast("double") - lit(pts(j)._2)
      val h = sqrt(dx * dx + dy * dy)
      lit(b(j)) * when(h >= range, 0.0).otherwise(
        lit(1.0) - lit(1.5) * (h / range) + lit(0.5) * (h / range) * (h / range) * (h / range))
    }.reduceLeft(_ + _)
    xs.crossJoin(ys).select(col("x"), col("y"),
      round(pred * lit(1000000.0)).cast("long").as("v_u"))
  }

  // ------------------------------------------------------------------
  // Ordinary kriging (geotrellis.raster.interpolation OrdinaryKriging):
  // simple kriging assumes a KNOWN mean; ordinary kriging estimates it
  // under the unbiasedness constraint sum(lambda) = 1. Dual form: solve
  // the augmented symmetric system
  //     [ C  1 ] [b]   [z]
  //     [ 1' 0 ] [a] = [0]
  // once (driver-side, same unpivoted elimination — the first n leading
  // minors are positive because C is PD, and the final pivot is the
  // Schur complement -1'C^-1 1 < 0, so no pivoting is ever needed),
  // then predict v(x) = sum_j b_j cov(h_xj) + a: still one fused
  // per-cell expression, shuffle-free. Oracle = the augmented
  // elimination unrolled CTE-by-CTE, identical op order.
  // ------------------------------------------------------------------

  /** Solve the augmented ordinary-kriging system; returns n weights
    * followed by the dual constant a. */
  def ordinaryKrigingWeights(pts: Array[(Double, Double, Double)],
                             range: Double, nugget: Double): Array[Double] = {
    val n = pts.length
    val m = n + 1
    val c = Array.tabulate(m, m) { (i, j) =>
      if (i == n && j == n) 0.0
      else if (i == n || j == n) 1.0
      else {
        val dx = pts(i)._1 - pts(j)._1
        val dy = pts(i)._2 - pts(j)._2
        val v = sphericalCov(math.sqrt(dx * dx + dy * dy), range)
        if (i == j) v + nugget else v
      }
    }
    val z = Array.tabulate(m)(i => if (i < n) pts(i)._3 else 0.0)
    var k = 0
    while (k < m) {
      var i = k + 1
      while (i < m) {
        val f = c(i)(k) / c(k)(k)
        var j = k
        while (j < m) { c(i)(j) = c(i)(j) - f * c(k)(j); j += 1 }
        z(i) = z(i) - f * z(k)
        i += 1
      }
      k += 1
    }
    val b = new Array[Double](m)
    var i2 = m - 1
    while (i2 >= 0) {
      var s = z(i2)
      var j = i2 + 1
      while (j < m) { s = s - c(i2)(j) * b(j); j += 1 }
      b(i2) = s / c(i2)(i2)
      i2 -= 1
    }
    b
  }

  /** Ordinary-kriging surface — same grid/points contract as
    * [[simpleKriging]]; the estimated-mean constant `a` folds into the
    * per-cell expression as one trailing literal. */
  def ordinaryKriging(spark: org.apache.spark.sql.SparkSession,
                      pts: Array[(Double, Double, Double)], gridSize: Int,
                      range: Double, nugget: Double): DataFrame = {
    val b = ordinaryKrigingWeights(pts, range, nugget)
    val xs = spark.range(0, gridSize).select(col("id").as("x"))
    val ys = spark.range(0, gridSize).select(col("id").as("y"))
    val pred = pts.indices.map { j =>
      val dx = col("x").cast("double") - lit(pts(j)._1)
      val dy = col("y").cast("double") - lit(pts(j)._2)
      val h = sqrt(dx * dx + dy * dy)
      lit(b(j)) * when(h >= range, 0.0).otherwise(
        lit(1.0) - lit(1.5) * (h / range) + lit(0.5) * (h / range) * (h / range) * (h / range))
    }.reduceLeft(_ + _) + lit(b(pts.length))
    xs.crossJoin(ys).select(col("x"), col("y"),
      round(pred * lit(1000000.0)).cast("long").as("v_u"))
  }

  /** DuckDB twin of [[ordinaryKriging]]: [[krigingSql]] over the
    * augmented (n+1)-system — constraint row/column stated as literal
    * 1.0/0.0 entries, elimination and back-substitution unrolled over
    * n+1 unknowns, prediction adds the dual constant b_n. */
  def ordinaryKrigingSql(coords: Array[(Double, Double)], zSql: Int => String,
                         gridSize: Int, range: Double, nugget: Double): String = {
    val n = coords.length
    val m = n + 1
    def d2(i: Int, j: Int): Double = {
      val dx = coords(i)._1 - coords(j)._1
      val dy = coords(i)._2 - coords(j)._2
      dx * dx + dy * dy
    }
    val m0Cols = (for (i <- 0 until m; j <- 0 until m) yield {
      val e =
        if (i == n && j == n) "0.0"
        else if (i == n || j == n) "1.0"
        else {
          val base = covExprSql(s"sqrt(${d2(i, j)})", range)
          if (i == j) s"$base + $nugget" else base
        }
      s"($e) AS c_${i}_$j"
    }) ++ (0 until m).map(i =>
      if (i < n) s"(${zSql(i)}) AS z_$i" else s"(0.0) AS z_$i")
    val m0 = s"m0 AS (SELECT ${m0Cols.mkString(", ")})"
    val steps = (0 until m - 1).map { k =>
      val cols = (for (i <- 0 until m; j <- 0 until m) yield {
        if (i > k) s"c_${i}_$j - (c_${i}_$k / c_${k}_$k) * c_${k}_$j AS c_${i}_$j"
        else s"c_${i}_$j"
      }) ++ (0 until m).map { i =>
        if (i > k) s"z_$i - (c_${i}_$k / c_${k}_$k) * z_$k AS z_$i" else s"z_$i"
      }
      s"m${k + 1} AS (SELECT ${cols.mkString(", ")} FROM m$k)"
    }
    val backs = (m - 1 to 0 by -1).map { i =>
      val sub = (i + 1 until m).map(j => s" - c_${i}_$j * b_$j").mkString
      val from = if (i == m - 1) s"m${m - 1}" else s"s${i + 1}"
      s"s$i AS (SELECT *, (z_$i$sub) / c_${i}_$i AS b_$i FROM $from)"
    }
    val pred = (0 until n).map { j =>
      val h = s"sqrt((CAST(x AS DOUBLE) - ${coords(j)._1}) * (CAST(x AS DOUBLE) - ${coords(j)._1}) + (CAST(y AS DOUBLE) - ${coords(j)._2}) * (CAST(y AS DOUBLE) - ${coords(j)._2}))"
      s"b_$j * (${covExprSql(h, range)})"
    }.mkString(" + ") + s" + b_$n"
    s"""WITH $m0,
       |${steps.mkString(",\n")},
       |${backs.mkString(",\n")},
       |grid AS (SELECT tx.x AS x, ty.y AS y FROM range(0, $gridSize) tx(x), range(0, $gridSize) ty(y))
       |SELECT x, y, CAST(round(($pred) * 1000000.0) AS BIGINT) AS v_u FROM grid CROSS JOIN s0""".stripMargin
  }

  /** DuckDB twin of [[simpleKriging]] for N points whose z values come
    * from `zSql(i)` (a scalar subquery per point): the same matrix
    * entries stated symbolically, the same elimination unrolled one
    * CTE per step, back-substitution chained, prediction over the same
    * grid in the same summation order. */
  def krigingSql(coords: Array[(Double, Double)], zSql: Int => String,
                 gridSize: Int, range: Double, nugget: Double): String = {
    val n = coords.length
    def d2(i: Int, j: Int): Double = {
      val dx = coords(i)._1 - coords(j)._1
      val dy = coords(i)._2 - coords(j)._2
      dx * dx + dy * dy
    }
    // initial matrix + rhs: one single-row CTE. d2 is an exact
    // integral double (integral coords), so the literal is exact.
    val m0Cols = (for (i <- 0 until n; j <- 0 until n) yield {
      val base = covExprSql(s"sqrt(${d2(i, j)})", range)
      val e = if (i == j) s"$base + $nugget" else base
      s"($e) AS c_${i}_$j"
    }) ++ (0 until n).map(i => s"(${zSql(i)}) AS z_$i")
    val m0 = s"m0 AS (SELECT ${m0Cols.mkString(", ")})"
    // forward elimination: step k rewrites rows i > k
    val steps = (0 until n - 1).map { k =>
      val cols = (for (i <- 0 until n; j <- 0 until n) yield {
        if (i > k) s"c_${i}_$j - (c_${i}_$k / c_${k}_$k) * c_${k}_$j AS c_${i}_$j"
        else s"c_${i}_$j"
      }) ++ (0 until n).map { i =>
        if (i > k) s"z_$i - (c_${i}_$k / c_${k}_$k) * z_$k AS z_$i" else s"z_$i"
      }
      s"m${k + 1} AS (SELECT ${cols.mkString(", ")} FROM m$k)"
    }
    // back-substitution: one chained CTE per unknown
    val backs = (n - 1 to 0 by -1).map { i =>
      val sub = (i + 1 until n).map(j => s" - c_${i}_$j * b_$j").mkString
      val from = if (i == n - 1) s"m${n - 1}" else s"s${i + 1}"
      s"s$i AS (SELECT *, (z_$i$sub) / c_${i}_$i AS b_$i FROM $from)"
    }
    val pred = (0 until n).map { j =>
      val h = s"sqrt((CAST(x AS DOUBLE) - ${coords(j)._1}) * (CAST(x AS DOUBLE) - ${coords(j)._1}) + (CAST(y AS DOUBLE) - ${coords(j)._2}) * (CAST(y AS DOUBLE) - ${coords(j)._2}))"
      s"b_$j * (${covExprSql(h, range)})"
    }.mkString(" + ")
    s"""WITH $m0,
       |${steps.mkString(",\n")},
       |${backs.mkString(",\n")},
       |grid AS (SELECT tx.x AS x, ty.y AS y FROM range(0, $gridSize) tx(x), range(0, $gridSize) ty(y))
       |SELECT x, y, CAST(round(($pred) * 1000000.0) AS BIGINT) AS v_u FROM grid CROSS JOIN s0""".stripMargin
  }
}
