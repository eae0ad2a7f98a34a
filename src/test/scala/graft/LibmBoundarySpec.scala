package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Executable gate for the libm-boundary determinism contract (the
  * graft-oracle-determinism rule, promoted from prose to a test): every
  * oracle that closes with a quantized transcendental —
  * `round(ln(x) * 1e6)` micro-nats, or a micro-quantized score term —
  * only hash-matches DuckDB if the REAL value `ln(x)·1e6` sits far
  * enough from its nearest round-half boundary that a 1-ulp libm
  * disagreement (JVM StrictMath-backed Math.log vs DuckDB's libm)
  * cannot flip the rounded integer. This spec computes the actual
  * quantization arguments on the driver testdata (sf0.01, the
  * correctness-gate scale) and asserts each family's minimum
  * boundary distance is ≥ [[MinMicroDist]] micro-units — ≥ ~4·10⁵
  * ulps of slack at the 1e6–1e7 magnitudes involved (ulp(1e6) ≈
  * 2.3e-10). The r12 hash-fails (q_focal_entropy, q_pmi) were exactly
  * this class with an UNquantized closing ln; the closings are now
  * exact-integer quotients, and this gate keeps the remaining
  * quantized terms honest if the testdata ever drifts.
  *
  * Families covered (arguments re-derived with the oracles' formulas):
  *  - focal/char/zonal entropy micro-terms c·ln(c)·1e6 and closing
  *    ln(n)·1e6 (Focal.scala Entropy, TextAnalysis.charEntropy,
  *    ZonalOps.zonalDiversity)
  *  - PMI ratios ln(p(ab)/(p(a)p(b)))·1e6 (TextAnalysis
  *    .pmiCollocations, quantize = false exposes the raw column)
  *  - unigram/bigram LM log-probs ln((c+1)/(total+V))·1e6
  *    (TextAnalysis.unigramLmScore / bigramLmScore)
  *  - BM25 idf terms ln((N−df+0.5)/(df+0.5)+1)·1e6 (TextAnalysis.bm25)
  *
  * r14 brought the round(,k) DOUBLE families IN scope: the r13
  * q_local_moran fail proved "both engines round bit-identical
  * inputs" is not enough once the rounded magnitude reaches ~9
  * significant digits (Spark's decimal HALF_UP vs DuckDB's
  * float-path round diverge), and libm INSIDE the pre-round DAG
  * (the point-CRS transforms) can shift the input itself by ulps.
  * The sweep below measures slack in VALUE-ulps for every rounded
  * family whose non-integral outputs exceed 1e4 in magnitude — the
  * audit over the full verify dump found exactly these: the
  * point-CRS forwards (mercator/UTM/polar/Albers/sinusoidal, ≤2e7),
  * geodesic distance/bearing, and the hotspot pair (now closed
  * exact-integer + micro-quantized). The sinusoidal family closes at
  * 3 dp because sf0.01 puts one point EXACTLY on a 4-dp boundary. */
class LibmBoundarySpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.01"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Distance of a micro-unit argument from its nearest rounding
    * boundary k + 0.5 (both engines round half away from zero, so
    * measure on |x|). */
  private def boundaryDist(x: Double): Double = {
    val a = math.abs(x)
    math.abs(a - math.floor(a) - 0.5)
  }

  /** Minimum acceptable distance, in micro-units. 1e-4 micro-units =
    * 1e-10 nats — hundreds of thousands of ulps at these magnitudes,
    * while a genuinely boundary-straddling value sits within ~1e-9
    * micro-units. */
  val MinMicroDist = 1e-4

  private def assertFar(family: String, args: Seq[Double],
                        minDist: Double = MinMicroDist): Unit = {
    assert(args.nonEmpty, s"$family: no quantization arguments derived")
    val worst = args.minBy(boundaryDist)
    val d = boundaryDist(worst)
    info(f"$family: ${args.size} args, min boundary distance $d%.6g micro-units (at $worst%.6f)")
    assert(d >= minDist,
      f"$family: argument $worst%.9f sits $d%.3g micro-units from a rounding boundary " +
        "— a libm ulp can flip the quantized value; requantize per graft-oracle-determinism")
  }

  test("entropy micro-terms c*ln(c) and closing ln(n) (focal window sizes)") {
    // Square(1) windows have n in {4, 6, 9}; class counts c ≤ 9. Cover
    // 1..9 for both (superset of reachable values; ln(1) = 0 exact).
    val cs = (2 to 9).map(c => c * math.log(c.toDouble) * 1e6)
    val ns = (2 to 9).map(n => math.log(n.toDouble) * 1e6)
    assertFar("focal-entropy c*ln(c)", cs)
    assertFar("focal-entropy ln(n)", ns)
  }

  test("char-entropy terms and closings on the documents table") {
    // same derivation as the oracle: per-(doc, char) counts
    val g = docs.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]"), lit(0))).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val cs = g.select(col("c")).distinct().as[Long].collect()
      .filter(_ > 1).map(c => c * math.log(c.toDouble) * 1e6).toSeq
    val ns = g.groupBy("doc_id").agg(sum("c").as("n")).select("n").distinct()
      .as[Long].collect().map(n => math.log(n.toDouble) * 1e6).toSeq
    assertFar("char-entropy c*ln(c)", cs)
    assertFar("char-entropy ln(n_chars)", ns)
  }

  test("zonal diversity closing ln(variety)") {
    // variety ≤ 8 classes (v mod 8); n_cells closings share the
    // char-entropy family shape and magnitudes
    assertFar("zonal-diversity ln(variety)", (2 to 8).map(v => math.log(v.toDouble) * 1e6))
  }

  test("js-divergence micro-nat terms on the documents table (r15)") {
    // term magnitudes are ~1e0-1e4 (not the 1e5-1e7 the absolute
    // micro-unit gate was calibrated for), so measure slack in
    // VALUE-ulps directly: scale=1 puts the round boundary at the
    // half-integers of the raw term itself. 6080 near-uniform args
    // land ~1e8 ulps from the nearest boundary at these magnitudes.
    val raw = TextAnalysis.jsDivergence(docs, quantize = false)
      .select("term_raw").as[Double].collect().toSeq
      .filter(_ != 0.0) // exact-zero terms (identical p=q) sit ON .0, fine
    assertUlpSlack("js 1e6*(p ln(p/m) + q ln(q/m))", raw, scale = 1.0)
  }

  test("pmi ratio arguments on the documents table") {
    val raw = TextAnalysis.pmiCollocations(docs, minCount = 5, quantize = false)
      .select("pmi_raw").as[Double].collect().toSeq
    assertFar("pmi ln(ratio)", raw)
  }

  test("skip-gram SPPMI ratio arguments on the documents table") {
    val raw = TextAnalysis.skipgramPmi(docs, quantize = false)
      .select("pmi_raw").as[Double].collect().toSeq
    assertFar("skipgram ln(ratio)", raw)
    // the ln(k) shift constant itself (k = 5)
    assertFar("skipgram ln(shift)", Seq(math.log(5.0) * 1e6))
  }

  test("unigram + bigram LM log-prob arguments on the documents table") {
    val words = docs.select(
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
    val vocab = words.groupBy("w").agg(count(lit(1)).as("cnt"))
    val Row2 = vocab.agg(sum("cnt").cast("long"), count(lit(1))).first()
    val (total, nv) = (Row2.getLong(0), Row2.getLong(1))
    val uniArgs = vocab.select("cnt").as[Long].collect()
      .map(c => math.log((c + 1.0) / (total + nv)) * 1e6).toSeq
    assertFar("unigram-lm ln((c+1)/(N+V))", uniArgs)

    val ws = docs.select(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("w"))
    val pairs = ws.where(size(col("w")) >= 1)
      .select(explode(transform(sequence(lit(1), size(col("w"))), i =>
        struct(when(i === 1, lit("<s>")).otherwise(element_at(col("w"), i - 1)).as("p"),
          element_at(col("w"), i).as("t")))).as("pr"))
      .select(col("pr.p").as("p"), col("pr.t").as("t"))
    val pairCnt = pairs.groupBy("p", "t").agg(count(lit(1)).as("cnt"))
    val ctxCnt = pairCnt.groupBy("p").agg(sum("cnt").as("cp"))
    val nvB = pairCnt.agg(countDistinct("t")).as[Long].first()
    val biArgs = pairCnt.join(ctxCnt, "p")
      .select(col("cnt").cast("long"), col("cp").cast("long"))
      .as[(Long, Long)].collect()
      .map { case (c, cp) => math.log((c + 1.0) / (cp + nvB)) * 1e6 }.toSeq
    assertFar("bigram-lm ln((c+1)/(cp+V))", biArgs)
  }

  test("jm-interpolated LM log-prob arguments on the documents table") {
    val ws = docs.select(col("doc_id"),
      regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("w"))
    val pairs = ws.where(size(col("w")) >= 1)
      .select(explode(transform(sequence(lit(1), size(col("w"))), i =>
        struct(when(i === 1, lit("<s>")).otherwise(element_at(col("w"), i - 1)).as("p"),
          element_at(col("w"), i).as("t")))).as("pr"))
      .select(col("pr.p").as("p"), col("pr.t").as("t"))
    val pc = pairs.groupBy("p", "t").agg(count(lit(1)).as("cab"))
    val cc = pc.groupBy("p").agg(sum("cab").as("cp"))
    val un = pairs.groupBy("t").agg(count(lit(1)).as("ca"))
    val Row2 = un.agg(sum("ca").cast("long"), count(lit(1))).first()
    val (n, nv) = (Row2.getLong(0), Row2.getLong(1))
    val args = pc.join(cc, "p").join(un, "t")
      .select(col("cab").cast("long"), col("cp").cast("long"), col("ca").cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (cab, cp, ca) =>
        math.log(0.75 * (cab.toDouble / cp) + 0.25 * ((ca + 1.0) / (n + nv))) * 1e6
      }.toSeq
    assertFar("jm-lm ln(interp)", args)
  }

  test("zipf ln(rank)/ln(cnt) arguments on the documents table") {
    val cnts = docs.select(
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t").asc).limit(30)
      .select("cnt").as[Long].collect()
    assertFar("zipf ln(rank)", (1 to 30).map(r => math.log(r.toDouble) * 1e6))
    assertFar("zipf ln(cnt)", cnts.map(c => math.log(c.toDouble) * 1e6).toSeq)
  }

  /** Gate for the round(,4) point-CRS / geodesic family (the r14
    * sweep): values reach 2e7 (11+ significant digits at 4 dp) and
    * the pre-round DAG contains libm (ln/tan/asin/atan2), so a k-ulp
    * JVM-vs-libm disagreement flips the rounded output iff the TRUE
    * value sits within k ulps of a x.xxxx5 boundary. Measure slack in
    * VALUE-ulps: dist(|v|·1e4, nearest half-integer) / (ulp(v)·1e4),
    * and require every point's slack ≥ `minUlps` — libm divergence on
    * these chains is observed ≤ ~2 ulps, so 8 is 4x headroom. */
  private def assertUlpSlack(family: String, vals: Seq[Double],
                             minUlps: Double = 8.0, scale: Double = 1e4): Unit = {
    assert(vals.nonEmpty, s"$family: no values derived")
    def slack(v: Double): Double = {
      val s = math.abs(v) * scale
      boundaryDist(s) / (math.ulp(math.abs(v)) * scale)
    }
    val worst = vals.minBy(slack)
    info(f"$family: ${vals.size} values, min boundary slack ${slack(worst)}%.3g " +
      f"value-ulps (at $worst%.6f)")
    assert(slack(worst) >= minUlps,
      f"$family: value $worst%.9f sits ${slack(worst)}%.3g ulps from a round(,4) " +
        "boundary — a libm ulp can flip the rounded output; requantize per " +
        "graft-oracle-determinism")
  }

  test("point-CRS forward transforms: round(,4) boundary slack in value-ulps") {
    import graft.core.CRS
    val pts = GridSource.customerLonLat(spark, dir)
    def collectRaw(df: org.apache.spark.sql.DataFrame,
                   steps: Seq[(String, String)], eE: String, nE: String): Seq[Double] = {
      val full = steps.foldLeft(df) { case (d, (name, f)) => d.withColumn(name, expr(f)) }
      full.select(expr(eE).as("e"), expr(nE).as("n"))
        .as[(Double, Double)].collect().toSeq.flatMap(t => Seq(t._1, t._2))
    }
    // web mercator (the q_reproject twins, ln∘tan inside)
    val merc = pts.select(CRS.lngToMercXCol(col("lon")).as("e"),
        CRS.latToMercYCol(col("lat")).as("n"))
      .as[(Double, Double)].collect().toSeq.flatMap(t => Seq(t._1, t._2))
    assertUlpSlack("mercator e/n", merc)
    val (uSteps, uE, uN) = CRS.TransverseMercator.forwardSqlSteps(33, south = false)
    assertUlpSlack("utm33 e/n",
      collectRaw(pts.where(col("lon") >= 0 && col("lon") <= 30), uSteps, uE, uN))
    val (oSteps, oE, oN) = CRS.Osgb36.forwardSqlSteps
    assertUlpSlack("osgb e/n",
      collectRaw(pts.where(col("lon") >= -20 && col("lon") <= 16 &&
        col("lat") >= 35 && col("lat") <= 75), oSteps, oE, oN))
    val ps = CRS.fromName("EPSG:3413").asInstanceOf[CRS.PolarStereographic]
    val (pSteps, pE, pN) = ps.forwardSqlSteps
    assertUlpSlack("polar-stereo e/n",
      collectRaw(pts.where(col("lat") >= 60), pSteps, pE, pN))
    val aea = CRS.fromName("EPSG:5070").asInstanceOf[CRS.AlbersEqualArea]
    val (aSteps, aE, aN) = aea.forwardSqlSteps
    assertUlpSlack("albers e/n",
      collectRaw(pts.where(col("lon") >= -130 && col("lon") <= -60 &&
        col("lat") >= 20 && col("lat") <= 55), aSteps, aE, aN))
    // sinu closes at 3 dp, not 4: the sf0.01 data has a point EXACTLY
    // on a 4-dp half boundary (slack 0 — the reason this sweep exists);
    // at 3 dp the measured minimum is ~95 ulps
    val sinu = CRS.fromName("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181")
      .asInstanceOf[CRS.Sinusoidal]
    val (sSteps, sE, sN) = sinu.forwardSqlSteps
    assertUlpSlack("sinusoidal e/n", collectRaw(pts, sSteps, sE, sN), scale = 1e3)
    // r16 registry additions, each inside its query's window
    val l93 = CRS.fromName("EPSG:2154").asInstanceOf[CRS.LambertConformalConic]
    val (lSteps, lE, lN) = l93.forwardSqlSteps
    assertUlpSlack("lambert93 e/n",
      collectRaw(pts.where(col("lon") >= -10 && col("lon") <= 15 &&
        col("lat") >= 38 && col("lat") <= 55), lSteps, lE, lN))
    val nztm = CRS.fromName("EPSG:2193").asInstanceOf[CRS.Tmerc]
    val (zSteps, zE, zN) = nztm.forwardSqlSteps
    assertUlpSlack("nztm e/n",
      collectRaw(pts.where(col("lon") >= 165 && col("lon") <= 180 &&
        col("lat") >= -48 && col("lat") <= -34), zSteps, zE, zN))
    val laea = CRS.fromName("EPSG:3035").asInstanceOf[CRS.LambertAzimuthalEqualArea]
    val (aeSteps, aeE, aeN) = laea.forwardSqlSteps
    assertUlpSlack("laea e/n",
      collectRaw(pts.where(col("lon") >= -15 && col("lon") <= 35 &&
        col("lat") >= 30 && col("lat") <= 72), aeSteps, aeE, aeN))
    val cea = CRS.fromName("EPSG:6933").asInstanceOf[CRS.CylindricalEqualArea]
    val (cSteps, cE, cN) = cea.forwardSqlSteps
    assertUlpSlack("cea e/n", collectRaw(pts, cSteps, cE, cN))
  }

  test("warp resample boundaries: projected edges far from source cell centers") {
    // The r15 warp family compares libm-carrying projected coordinates
    // against exact source-grid landmarks: footprint joins test
    // `center k+0.5 vs gyLo/gyHi edge`, bilinear/cubic floor
    // `gy - 0.5 vs integer`. The x direction is rational-safe by the
    // 32/25 resolution-ratio argument; the y direction runs through
    // atan∘exp, so a JVM-vs-DuckDB libm ulp flips a cell iff the TRUE
    // distance is ~1e-13 grid units. Gate every edge/sample at 1e-6
    // grid units (~10^7 ulps of headroom at these magnitudes).
    import graft.core.CRS
    val R = 6378137.0
    def latOf(my: Double) = math.toDegrees(math.atan(math.exp(my / R)) * 2 - math.Pi / 2)
    def distHalf(e: Double) = math.abs(e - math.floor(e) - 0.5) // vs k+0.5
    def distInt(e: Double)  = math.abs(e - math.rint(e))        // vs k
    def gate(family: String, ds: Seq[Double]): Unit = {
      val worst = ds.min
      info(f"$family: ${ds.size} boundaries, min distance $worst%.3g grid units")
      assert(worst >= 1e-6, s"$family: a projected warp boundary sits $worst grid " +
        "units from a source landmark — libm divergence can flip the cell")
    }
    // footprint family (q_reproject_average/mode/median/max): n=256 dn=200
    {
      val n = 256; val d = 0.1; val dn = 200
      val myMax = CRS.latToMercY(n * d); val myMin = CRS.latToMercY(0)
      val ch = (myMax - myMin) / dn
      val yEdges = (0 to dn).map(ty => (n * d - latOf(myMax - ty * ch)) / d)
      gate("footprint gy edges vs centers", yEdges.map(distHalf))
    }
    // bilinear (n=256 dn=200) and cubic (n=128 dn=100) floor boundaries
    for ((n, dn) <- Seq((256, 200), (128, 100))) {
      val d = 0.1
      val myMax = CRS.latToMercY(n * d); val myMin = CRS.latToMercY(0)
      val ch = (myMax - myMin) / dn
      val gys = (0 until dn).map(ty => (n * d - latOf(myMax - (ty + 0.5) * ch)) / d)
      gate(s"warp gy-0.5 floor boundaries ($n->$dn)", gys.map(g => distInt(g - 0.5)))
      // NN floor boundary (q_reproject_raster discipline): gy vs integer
      gate(s"warp gy NN floor boundaries ($n->$dn)", gys.map(distInt))
    }
  }

  test("geodesic distance/bearing: round(,4) boundary slack in value-ulps") {
    // the exact Measures.geodesic DAG minus the closing round
    val (anchorLon, anchorLat) = (2.25, 48.85)
    val pts = GridSource.customerLonLat(spark, dir)
    val f1 = radians(col("lat")); val f2 = radians(lit(anchorLat))
    val dphi = radians(lit(anchorLat) - col("lat"))
    val dlam = radians(lit(anchorLon) - col("lon"))
    val sp = sin(dphi / 2); val sl = sin(dlam / 2)
    val a = sp * sp + cos(f1) * cos(f2) * (sl * sl)
    val d = lit(2 * 6371.0) * asin(least(lit(1.0), sqrt(a)))
    val deg = degrees(atan2(sin(dlam) * cos(f2),
      cos(f1) * sin(f2) - sin(f1) * cos(f2) * cos(dlam)))
    val raw = pts.select(d.as("d"),
        when(deg < 0, deg + 360).otherwise(deg).as("b"))
      .as[(Double, Double)].collect().toSeq
    assertUlpSlack("geodesic dist_km", raw.map(_._1))
    assertUlpSlack("geodesic bearing_deg", raw.map(_._2))
  }

  test("hotspot Gi*/Moran micro-quantization arguments (r13 fail class)") {
    // The q_hotspot_gi / q_local_moran twins quantize the raw
    // exact-integer-ratio closing as round(x·1e5) → BIGINT. The DAG is
    // fully IEEE-pinned (every op a single correctly-rounded mul/sub/
    // div/sqrt on bit-identical inputs), so the only residual hazard is
    // an engine disagreeing by ~1 ulp of x·1e5 — ulp(1e9) ≈ 1.2e-7
    // quantization units. Gate at 4 ulps of that magnitude; with ~39k
    // near-uniform fractional parts the expected min distance is
    // ~1.3e-5, so this holds with two orders of headroom unless the
    // testdata drifts onto a boundary.
    val layer = GridSource.lineitemLayer(spark, dir)
    val giArgs = graft.raster.Hotspot.getisOrdGi(layer)
      .where(col("gi").isNotNull)
      .select((col("gi") * 100000.0).as("a")).as[Double].collect().toSeq
    val moArgs = graft.raster.Hotspot.localMoran(layer)
      .where(col("moran_i").isNotNull)
      .select((col("moran_i") * 100000.0).as("a")).as[Double].collect().toSeq
    val fourUlps = 4 * math.ulp(1e9)
    assertFar("hotspot gi*1e5", giArgs, fourUlps)
    assertFar("hotspot moran*1e5", moArgs, fourUlps)
    val lgArgs = graft.raster.Hotspot.localGeary(layer)
      .where(col("geary_i").isNotNull)
      .select((col("geary_i") * 100000.0).as("a")).as[Double].collect().toSeq
    assertFar("local geary*1e5", lgArgs, fourUlps)
  }

  test("Ripley K / quadrat VMR micro-quantization arguments") {
    val pts = GridSource.supplierPoints(spark, dir)
    val kh = graft.vector.PointStats.ripleyK(pts)
      .select(array(Seq(4, 8, 16, 32).map(r => col(s"kh$r") * 10000.0): _*))
      .as[Seq[Double]].head()
    assertFar("ripley khat*1e4", kh)
    // quadrat closing BEFORE its round: (q·Σc² − n²)·1e6 / ((q−1)·n)
    val vm = graft.vector.PointStats.quadratVmr(pts)
      .select((((col("sum_c2") * col("q") - col("n") * col("n")) * 1000000.0) /
        ((col("q") - 1) * col("n"))).as("a")).as[Double].collect().toSeq
    assertFar("quadrat vmr*1e6", vm)
  }

  test("global Moran/Geary micro-quantization arguments (×1e6 scalars)") {
    // Single-row closings; |value| ≲ 1 so the ×1e6 argument is ~1e5-
    // magnitude and the default micro-unit gate applies directly.
    val layer = GridSource.lineitemLayer(spark, dir)
    val gm = graft.raster.Hotspot.globalMoran(layer)
      .select((col("moran_i") * 1000000.0).as("a")).as[Double].collect().toSeq
    val gc = graft.raster.Hotspot.gearyC(layer)
      .select((col("geary_c") * 1000000.0).as("a")).as[Double].collect().toSeq
    assertFar("global moran*1e6", gm)
    assertFar("geary c*1e6", gc)
    val gg = graft.raster.Hotspot.generalG(layer)
      .select((col("general_g") * 1000000000.0).as("a")).as[Double].collect().toSeq
    assertFar("general g*1e9", gg)
    val cg = graft.raster.Hotspot.moranCorrelogram(layer)
      .select((col("moran_i") * 1000000.0).as("a")).as[Double].collect().toSeq
    assertFar("correlogram moran*1e6", cg)
    val bv = graft.raster.Hotspot.bivariateMoran(layer,
      GridSource.ordersLayer(spark, dir))
      .select((col("moran_bv") * 1000000.0).as("a")).as[Double].collect().toSeq
    assertFar("bivariate moran*1e6", bv)
  }

  test("r18 micro-quantized libm chains: twi, hll estimate, geodesic area") {
    // families migrated off round(x,k) DOUBLE in r18 — same boundary
    // question at their new integer quanta (1e5 / 1e5 / 1e4)
    // twi = ln((acc+1) / max(tan(radians(slope)), 0.001)), 1e5 quantum
    val acc = graft.raster.Hydrology.flowAccumulation(
      GridSource.lineitemCells(spark, dir), 256, 256)
    val slope = GridSource.lineitemLayer(spark, dir).slope().toCells
      .select(col("x"), col("y"), col("v").as("sdeg"))
    val twiRaw = acc.join(slope, Seq("x", "y"))
      .select(log((col("acc") + lit(1L)).cast("double") /
        greatest(tan(radians(col("sdeg"))), lit(0.001))).as("t"))
      .as[Double].collect().toSeq
    assertUlpSlack("twi ln-chain", twiRaw, scale = 1e5)
    // hll estimate: ln inside both branches, 1e5 quantum
    val regs = graft.pipeline.Sketch.hllSketch(docs)
      .as[(Long, Long)].collect()
    val z = regs.map { case (_, rho) => math.pow(2.0, 55 - rho) }.sum
    val zeros = regs.count(_._2 == 0L)
    val raw = 0.709 * 64 * 64 * 36028797018963968.0 / z
    val est = if (raw <= 160.0 && zeros > 0) 64.0 * math.log(64.0 / zeros) else raw
    assertUlpSlack("hll estimate", Seq(est), scale = 1e5)
    // geodesic diamond area (spherical-excess trig chain), 1e4 quantum
    val areas = GridSource.customerLonLat(spark, dir)
      .select(expr(graft.vector.Measures.diamondAreaSql(0.5)).as("a"))
      .as[Double].collect().toSeq
    assertUlpSlack("geodesic diamond area", areas, scale = 1e4)
  }

  test("bm25 idf arguments for the fixed query-term set") {
    val ws = docs.select(col("doc_id"),
      regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("w"))
    val nd = ws.count().toDouble
    val dfs = ws.select(col("doc_id"), explode(col("w")).as("term"))
      .where(col("term").isin(SparkEntry.Bm25Terms: _*))
      .groupBy("term").agg(countDistinct("doc_id").as("df"))
      .select("df").as[Long].collect()
    val args = dfs.map(df => math.log((nd - df + 0.5) / (df + 0.5) + 1.0) * 1e6).toSeq
    assertFar("bm25 ln-idf", args)
  }
}
