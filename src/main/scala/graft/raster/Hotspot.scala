package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local spatial-autocorrelation statistics (the ArcGIS Hot Spot
  * Analysis / Cluster-Outlier toolset): Getis-Ord Gi* (Getis & Ord
  * 1992) and local Moran's I (Anselin 1995) with binary 3x3 weights.
  *
  * Both decompose into (a) three exact GLOBAL moments (n, Σx, Σx² —
  * integral cells keep the double sums exact), broadcast as one row,
  * and (b) per-cell focal sums Sw = Σ_{3x3} x and k = #present
  * neighbors from the standard halo exchange — then one fixed-order
  * closing float expression per cell, restated as a single
  * exact-integer ratio: every multiply/subtract operand is an exact
  * integer-valued double, so each IEEE op (mul/sub/div/sqrt — no
  * libm) is correctly rounded on bit-identical inputs and the raw
  * double output matches the SQL oracle stating the same DAG exactly.
  * (The r13 lesson: the algebraically-equivalent x̄/m2 form put a
  * round(,5) on a 1e4-magnitude value — 9 significant digits — where
  * Spark's BigDecimal HALF_UP and DuckDB's float-path round diverge;
  * the query twins now micro-quantize the raw value instead.)
  *
  * Scale: two halo exchanges (values + presence mask), one broadcast
  * of a 1-row global, co-keyed cell join — no global shuffle beyond
  * the focal machinery's.
  */
object Hotspot {
  /** Pin the layer's tiles before fan-out (r20 optimization round):
    * every statistic here consumes the layer from 3-4 plan branches
    * (value focal, presence focal, raw cells, global moments), and
    * the per-call TileBuildAgg instances defeat ReuseExchange — each
    * branch re-ran the whole upstream scan+shuffle (q_lisa_quadrant's
    * plan held FOUR separate parquet scans). One materialization,
    * identical values. */
  private def pin(l: RasterLayer): RasterLayer =
    l.copy(df = l.df.localCheckpoint())

  /** Per-cell (x, y, v, sw, k): value, 3x3 sum incl center, 3x3
    * present-cell count incl center. */
  private def focalPieces(l: RasterLayer): DataFrame = {
    val sw = l.focal(Neighborhood.Square(1), "Sum").toCells
      .withColumnRenamed("v", "sw")
    val ones = l.localMap(c => when(isnan(c), c).otherwise(lit(1.0)))
    val k = ones.focal(Neighborhood.Square(1), "Sum").toCells
      .withColumnRenamed("v", "k")
    l.toCells.join(sw, Seq("x", "y")).join(k, Seq("x", "y"))
  }

  private def withGlobal(l: RasterLayer, pieces: DataFrame): DataFrame = {
    val g = l.toCells.agg(
      count(lit(1)).cast("long").as("n"),
      sum("v").as("s"),
      sum(col("v") * col("v")).as("ss"))
    pieces.crossJoin(broadcast(g))
  }

  /** Getis-Ord Gi* z-score, self-inclusive binary 3x3 weights.
    * Algebraically (Sw − x̄·k)/(sqrt(SS/n − x̄²)·sqrt((k·n−k²)/(n−1))),
    * restated exact-integer:
    * Gi* = (Sw·n − S·k) / sqrt((SS·n − S²)·(k·n − k²)/(n−1)).
    * Both factors under the sqrt and the numerator are exact
    * integer-valued doubles; the quotient is raw (unrounded). */
  def getisOrdGi(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val df = withGlobal(l, focalPieces(l))
    val num = col("sw") * col("n") - col("s") * col("k")
    val den2 = (col("ss") * col("n") - col("s") * col("s")) *
      (col("k") * col("n") - col("k") * col("k"))
    // k == n (window covers the whole raster) zeroes the variance
    // term — the statistic is undefined there; emit NULL (and skip
    // the division, which ANSI mode rejects at zero)
    df.select(col("x"), col("y"),
      when(col("k") < col("n"),
        num / sqrt(den2 / (col("n") - lit(1.0)))).as("gi"))
  }

  /** Local Moran's I with self-exclusive binary 3x3 weights and the
    * Σz²/n normalizer. Algebraically ((x − x̄)/m2)·((Sw−x) − (k−1)·x̄),
    * restated exact-integer:
    * I = (x·n − S) · ((Sw−x)·n − (k−1)·S) / (SS·n − S²).
    * Both numerator factors are exact integer-valued doubles, so the
    * single multiply + single divide are bit-identical across engines;
    * the quotient is raw (unrounded). */
  def localMoran(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val df = withGlobal(l, focalPieces(l))
    val num1 = col("v") * col("n") - col("s")
    val num2 = (col("sw") - col("v")) * col("n") -
      (col("k") - lit(1.0)) * col("s")
    val den = col("ss") * col("n") - col("s") * col("s")
    // constant raster => den = n²·m2 = 0: undefined, emit NULL
    df.select(col("x"), col("y"),
      when(den > 0.0, num1 * num2 / den).as("moran_i"))
  }

  private val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)

  /** n·SS − S² as one double, the shared m2·n² normalizer of the
    * global statistics. Computed in DECIMAL(18,0) (the factors exceed
    * 2^53 at sf0.1) and cast to double ONCE — a single correctly-
    * rounded integer→double conversion both engines agree on. */
  private def m2n2(n: org.apache.spark.sql.Column,
                   s: org.apache.spark.sql.Column,
                   ss: org.apache.spark.sql.Column) =
    (n.cast(dec18) * ss.cast(dec18) - s.cast(dec18) * s.cast(dec18))
      .cast("double")

  /** GLOBAL Moran's I (Moran 1950; the ArcGIS Spatial Autocorrelation
    * tool), binary 3x3 self-exclusive (queen) weights:
    * I = n·Σᵢⱼ wᵢⱼ zᵢ zⱼ / (W·Σ zᵢ²). Multiplying z through by n gives
    * the exact-integer form
    * I = Σᵢ (vᵢ·n − S)·((Swᵢ−vᵢ)·n − (kᵢ−1)·S) / (W·(SS·n − S²)):
    * each per-cell factor is an exact integer-valued double, their
    * product exceeds 2^53 so the Σ runs in DECIMAL(18,0)² → exact
    * DECIMAL(38,0), and the closing is one integer→double cast per
    * side plus a single IEEE multiply+divide — bit-identical across
    * engines. One row: (n, w, moran_i raw).
    *
    * Scale: the focal machinery's halo exchange + one all-partial
    * aggregate; nothing grows with cell count beyond the scan. */
  def globalMoran(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val df = withGlobal(l, focalPieces(l))
    val prod = (col("v") * col("n") - col("s")).cast(dec18) *
      ((col("sw") - col("v")) * col("n") - (col("k") - lit(1.0)) * col("s"))
        .cast(dec18)
    val agg = df.agg(
      sum(prod).as("num"),
      sum(col("k").cast("long") - lit(1L)).as("w"),
      max("n").as("n"), max("s").as("s"), max("ss").as("ss"))
    agg.select(col("n"), col("w"),
      (col("num").cast("double") /
        (col("w").cast("double") * m2n2(col("n"), col("s"), col("ss"))))
        .as("moran_i"))
  }

  /** Geary's C (Geary 1954), binary 3x3 self-exclusive weights:
    * C = (n−1)·Σᵢⱼ wᵢⱼ (vᵢ−vⱼ)² / (2W·Σ zᵢ²). The pair sum needs no
    * mean at all: Σᵢⱼ wᵢⱼ(vᵢ−vⱼ)² = Σᵢ [(kᵢ−1)·vᵢ² − 2·vᵢ·(Swᵢ−vᵢ) +
    * (Sqᵢ−vᵢ²)] with Sq the 3x3 focal sum of v² — every term an exact
    * integer-valued double (per-cell magnitude ~8·v² < 10^18), and the
    * Σ runs in DECIMAL(18,0) like globalMoran/generalG (r15: a plain
    * double Σ was exact only while max|e|·n stayed under 2^53 — a
    * data-dependent claim; DECIMAL removes the partition-order
    * hazard). Closing: (n·(n−1))·E / ((2W)·(SS·n−S²)) — the long
    * products n·(n−1) and 2W are exact, E and SS·n−S² are one
    * decimal→double cast each, then two IEEE multiplies + one divide.
    * One row: (n, w, geary_c raw). */
  def gearyC(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val sq = l.localMap(c => c * c).focal(Neighborhood.Square(1), "Sum")
      .toCells.withColumnRenamed("v", "sq")
    val df = withGlobal(l, focalPieces(l).join(sq, Seq("x", "y")))
    val v2 = col("v") * col("v")
    val e = (col("k") - lit(1.0)) * v2 -
      lit(2.0) * col("v") * (col("sw") - col("v")) + (col("sq") - v2)
    val agg = df.agg(
      sum(e.cast(dec18)).as("e"),
      sum(col("k").cast("long") - lit(1L)).as("w"),
      max("n").as("n"), max("s").as("s"), max("ss").as("ss"))
    agg.select(col("n"), col("w"),
      ((col("n") * (col("n") - lit(1L))).cast("double") * col("e").cast("double") /
        ((col("w") * lit(2L)).cast("double") *
          m2n2(col("n"), col("s"), col("ss")))).as("geary_c"))
  }

  /** LOCAL Geary's c (Anselin 1995 LISA family; PySAL
    * esda.Geary_Local), binary 3x3 self-exclusive weights:
    * cᵢ = Σⱼ wᵢⱼ(vᵢ−vⱼ)² / m2. The pair sum is the mean-free exact
    * per-cell term Eᵢ = (kᵢ−1)·vᵢ² − 2·vᵢ·(Swᵢ−vᵢ) + (Sqᵢ−vᵢ²), and
    * m2 = (SS·n − S²)/n², so cᵢ = Eᵢ·n·n / (SS·n − S²) — a fixed-order
    * IEEE DAG on exact integer inputs (intermediates may round, but
    * identically in both engines; the Gi* precedent). Raw doubles. */
  def localGeary(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val sq = l.localMap(c => c * c).focal(Neighborhood.Square(1), "Sum")
      .toCells.withColumnRenamed("v", "sq")
    val df = withGlobal(l, focalPieces(l).join(sq, Seq("x", "y")))
    val v2 = col("v") * col("v")
    val e = (col("k") - lit(1.0)) * v2 -
      lit(2.0) * col("v") * (col("sw") - col("v")) + (col("sq") - v2)
    val den = col("ss") * col("n") - col("s") * col("s")
    df.select(col("x"), col("y"),
      when(den > 0.0, e * col("n") * col("n") / den).as("geary_i"))
  }

  /** Moran-scatterplot quadrant labels (the LISA cluster map legend:
    * 1 = HH, 2 = LH, 3 = LL, 4 = HL; 0 when either deviation is
    * exactly zero). Signs come from the exact integers v·n − S
    * (own deviation ×n) and (Sw−v)·n − (k−1)·S (neighbor-sum
    * deviation ×n) — no division, no float, no quantization. */
  def lisaQuadrants(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val df = withGlobal(l, focalPieces(l))
    val own = col("v") * col("n") - col("s")
    val nbr = (col("sw") - col("v")) * col("n") -
      (col("k") - lit(1.0)) * col("s")
    df.select(col("x"), col("y"),
      when(own > 0 && nbr > 0, 1L)
        .when(own < 0 && nbr > 0, 2L)
        .when(own < 0 && nbr < 0, 3L)
        .when(own > 0 && nbr < 0, 4L)
        .otherwise(0L).as("quadrant"))
  }

  private val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Moran CORRELOGRAM: global Moran's I at Chebyshev ring lags
    * 1..maxLag (binary weights on the ring at exactly distance d —
    * the PySAL correlogram shape that shows spatial structure decay).
    *
    * ONE halo gather at radius maxLag computes every ring sum per
    * cell INSIDE the padded tile; only bounded per-tile Long partials
    * cross any exchange (the r13 gatherPartials discipline — the old
    * shape ran 2·maxLag separate focal exchanges and reassembled them
    * with a (2·maxLag+1)-way per-cell equi-join, seven full per-cell
    * shuffles at scale). Expanding the globalMoran numerator over the
    * global moments,
    *   Σᵢ (vᵢ·n − S)·(Swᵢ·n − kᵢ·S)
    *     = n²·Σ(v·Sw) − n·S·Σ(v·k) − n·S·Σ(Sw) + S²·Σ(k),
    * so per tile the kernel folds four exact Long partials per lag
    * (A=Σ v·Sw, B=Σ v·k, C=Σ Sw, W=Σ k) plus the global moments
    * (cnt, Σv, Σv²), and the closing assembles the SAME exact integer
    * numerator the per-cell decimal sum produced — bit-identical
    * moran_i, unchanged oracle. Requires integral-valued cells (the
    * Hotspot family contract). One row per lag: (lag, n, w, moran_i
    * raw). */
  def moranCorrelogram(l: RasterLayer, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val spark = l.df.sparkSession
    import spark.implicits._
    val tl = l.meta.layout.tileLayout
    val (tc, tr) = (tl.tileCols, tl.tileRows)
    val mL = maxLag
    // per-tile Long-fold overflow bound: tc·tr adds of vl·sv with
    // |sv| ≤ 8·mL·|v|max must stay under 2^63 — fail LOUDLY past it
    // (silent wrap would corrupt moran_i; cross-tile totals are
    // already DECIMAL). |v|max < ~9.7e6 at 64² tiles, maxLag 3.
    val vMax = math.sqrt((Long.MaxValue / (tc.toLong * tr * 8L * mL)).toDouble).toLong
    // row scheme: lag 0 carries (cnt, Σv, Σv², 0); lag d carries
    // (A_d, B_d, C_d, W_d) — fixed-width tuples keep the Encoder flat
    val partials = Focal.gatherPartials[(Int, Long, Long, Long, Long)](l, mL) {
      (_, _, padded, w) =>
        val a = new Array[Long](mL + 1); val b = new Array[Long](mL + 1)
        val c = new Array[Long](mL + 1); val kw = new Array[Long](mL + 1)
        var cnt = 0L; var s = 0L; var ss = 0L
        var j = 0
        while (j < tr) {
          var i = 0
          while (i < tc) {
            val v = padded((j + mL) * w + (i + mL))
            if (!v.isNaN) {
              val vl = v.toLong
              require(math.abs(vl) < vMax,
                s"cell magnitude $vl exceeds the exact Long fold bound $vMax — " +
                  "rescale the layer before moranCorrelogram")
              cnt += 1L; s += vl; ss += vl * vl
              var d = 1
              while (d <= mL) {
                // ring at Chebyshev distance exactly d: two full rows
                // (dy = ±d) plus the two side columns between them
                var sv = 0L; var kc = 0L
                var dy = -d
                while (dy <= d) {
                  val base = (j + mL + dy) * w + (i + mL)
                  if (dy == -d || dy == d) {
                    var dx = -d
                    while (dx <= d) {
                      val nv = padded(base + dx)
                      if (!nv.isNaN) { sv += nv.toLong; kc += 1L }
                      dx += 1
                    }
                  } else {
                    val nv1 = padded(base - d)
                    if (!nv1.isNaN) { sv += nv1.toLong; kc += 1L }
                    val nv2 = padded(base + d)
                    if (!nv2.isNaN) { sv += nv2.toLong; kc += 1L }
                  }
                  dy += 1
                }
                a(d) += vl * sv; b(d) += vl * kc; c(d) += sv; kw(d) += kc
                d += 1
              }
            }
            i += 1
          }
          j += 1
        }
        Iterator.single((0, cnt, s, ss, 0L)) ++
          (1 to mL).iterator.map(d => (d, a(d), b(d), c(d), kw(d)))
    }
    // tile partials → exact DECIMAL sums (Long products stay exact in
    // the kernel; the cross-tile totals may pass 2^53 at scale)
    val agg = partials.toDF("lag", "p1", "p2", "p3", "p4")
      .groupBy("lag")
      .agg(sum(col("p1").cast(dec38)).as("p1"),
        sum(col("p2").cast(dec38)).as("p2"),
        sum(col("p3").cast(dec38)).as("p3"),
        sum(col("p4").cast(dec38)).as("p4"))
      .localCheckpoint() // one tiny row set, two consumers below
    val g = agg.filter(col("lag") === 0).select(
      col("p1").cast("long").as("n"),
      col("p2").cast("long").as("s"),
      col("p3").cast("long").as("ss"))
    val lags = agg.filter(col("lag") > 0).select(
      col("lag"), col("p1").as("a"), col("p2").as("b"), col("p3").as("c"),
      col("p4").cast("long").as("w"))
    val nD = col("n").cast(dec18); val sD = col("s").cast(dec18)
    val num = (nD * nD) * col("a") - (nD * sD) * col("b") -
      (nD * sD) * col("c") + (sD * sD) * col("w").cast(dec18)
    lags.crossJoin(broadcast(g))
      .select(col("lag"), col("n"), col("w"),
        (num.cast("double") /
          (col("w").cast("double") * m2n2(col("n"), col("s"), col("ss"))))
          .as("moran_i"))
  }

  /** Getis-Ord GENERAL G (the ArcGIS High/Low Clustering tool; Getis
    * & Ord 1992 global form), binary 3x3 self-exclusive weights:
    * G = Σᵢⱼ wᵢⱼ xᵢxⱼ / Σ_{i≠j} xᵢxⱼ. Numerator = Σᵢ vᵢ·(Swᵢ−vᵢ)
    * (exact integer-valued doubles, running sum < 2^53 at the tile
    * grid's magnitudes is NOT guaranteed — so it runs in DECIMAL like
    * the Moran numerator); denominator = S² − SS, exact in
    * DECIMAL(18,0)². One row: (n, w, general_g raw). */
  def generalG(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val df = withGlobal(l, focalPieces(l))
    val prod = col("v").cast(dec18) *
      (col("sw") - col("v")).cast(dec18)
    val agg = df.agg(
      sum(prod).as("num"),
      sum(col("k").cast("long") - lit(1L)).as("w"),
      max("n").as("n"), max("s").as("s"), max("ss").as("ss"))
    agg.select(col("n"), col("w"),
      (col("num").cast("double") /
        (col("s").cast(dec18) * col("s").cast(dec18) -
          col("ss").cast(dec18)).cast("double")).as("general_g"))
  }

  /** BIVARIATE global Moran's I (PySAL esda.Moran_BV shape): the
    * cross-correlation of v1 with the spatial LAG of v2 over the
    * cells where BOTH layers are present,
    * I = n·Σᵢ z1ᵢ·(Σⱼ wᵢⱼ z2ⱼ) / (W·sqrt(Σz1²·Σz2²)).
    * The numerator Σ runs exact in DECIMAL(18,0)² (the globalMoran
    * restating with v2's lag); the normalizer is one IEEE sqrt of the
    * product of the two decimal→double m2·n² casts. The joined
    * support's k differs from either layer's own halo, so focal sums
    * come from a 9-offset shifted self-join on the joined cells — one
    * co-keyed shuffle (the GLCM shape). One row: (n, w, moran_bv). */
  def bivariateMoran(a: RasterLayer, b: RasterLayer): DataFrame = {
    val cells = a.toCells.withColumnRenamed("v", "v1")
      .join(b.toCells.withColumnRenamed("v", "v2"), Seq("x", "y"))
      .localCheckpoint() // feeds the global agg, the shifted union AND the probe join
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val nbrs = offs.map { case (dx, dy) =>
      cells.select((col("x") + dx).as("x"), (col("y") + dy).as("y"),
        col("v2").as("nv2"))
    }.reduce(_ unionAll _)
    val f = cells.join(nbrs, Seq("x", "y"))
      .groupBy("x", "y")
      .agg(max("v1").as("v1"), max("v2").as("v2"),
        sum("nv2").as("sw2"), count(lit(1)).as("k"))
    val g = cells.agg(count(lit(1)).cast("long").as("n"),
      sum("v1").as("s1"), sum(col("v1") * col("v1")).as("ss1"),
      sum("v2").as("s2"), sum(col("v2") * col("v2")).as("ss2"))
    val prod = (col("v1") * col("n") - col("s1")).cast(dec18) *
      ((col("sw2") - col("v2")) * col("n") - (col("k") - lit(1L)) * col("s2"))
        .cast(dec18)
    f.crossJoin(broadcast(g))
      .agg(sum(prod).as("num"),
        sum(col("k") - lit(1L)).as("w"),
        max("n").as("n"), max("s1").as("s1"), max("ss1").as("ss1"),
        max("s2").as("s2"), max("ss2").as("ss2"))
      .select(col("n"), col("w"),
        (col("num").cast("double") /
          (col("w").cast("double") *
            sqrt(m2n2(col("n"), col("s1"), col("ss1")) *
              m2n2(col("n"), col("s2"), col("ss2"))))).as("moran_bv"))
  }

  /** Binary join-count statistics (Cliff & Ord 1981) under 3x3 queen
    * adjacency: cells are Black when the integral value is odd. Counts
    * BB / WW / BW adjacencies — each BB edge contributes 1 at both
    * black ends (halved), each BW edge exactly once from its black
    * end. Pure integer outputs, zero float anywhere. One row:
    * (n_black, n_white, bb, ww, bw, joins). */
  def joinCounts(l0: RasterLayer): DataFrame = {
    val l = pin(l0)
    val swb = l.localMap(c => pmod(c, lit(2.0)))
      .focal(Neighborhood.Square(1), "Sum").toCells
      .withColumnRenamed("v", "swb")
    val ones = l.localMap(c => when(isnan(c), c).otherwise(lit(1.0)))
    val k = ones.focal(Neighborhood.Square(1), "Sum").toCells
      .withColumnRenamed("v", "k")
    val cells = l.toCells
      .join(swb, Seq("x", "y")).join(k, Seq("x", "y"))
      .select(pmod(col("v"), lit(2.0)).cast("long").as("b"),
        col("swb").cast("long").as("swb"), col("k").cast("long").as("k"))
    cells.agg(
      sum(col("b")).as("n_black"),
      sum(lit(1L) - col("b")).as("n_white"),
      (sum(col("b") * (col("swb") - col("b"))) / lit(2L)).cast("long").as("bb"),
      (sum((lit(1L) - col("b")) *
        (col("k") - col("swb") - (lit(1L) - col("b")))) / lit(2L))
        .cast("long").as("ww"),
      sum(col("b") * (col("k") - col("swb"))).as("bw"),
      (sum(col("k") - lit(1L)) / lit(2L)).cast("long").as("joins"))
  }
}
