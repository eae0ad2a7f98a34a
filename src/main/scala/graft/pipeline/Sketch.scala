package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus statistics (Cormode &
  * Muthukrishnan, "An improved data stream summary: the count-min
  * sketch and its applications", J. Algorithms 2005 — public).
  *
  * Determinism contract: the d hash rows use the portable md5-prefix
  * hash (the Curation.idHash convention) salted with the row index, so
  * the DuckDB oracle states the identical cell layout. Counts are
  * exact integer sums.
  *
  * Scale shape: the token count aggregate is bounded by vocabulary
  * (map-side combine), the sketch by depth x width — constant-size
  * output no matter the corpus, which is the point of a sketch: at
  * 100 TB the (j, b) cells partial-aggregate on every executor and one
  * tiny exchange merges them. Sketches from disjoint corpus shards
  * add cell-wise (the spec proves mergeability).
  */
object Sketch {

  /** 60-bit portable hash of `s` salted by row `j`. */
  def rowHash(j: Int, s: Column): Column =
    org.apache.spark.sql.graft.Md5Prefix60Expr.md5Prefix60(concat(lit(s"$j:"), s))

  /** Count-min sketch of corpus token frequencies: (j, b, cnt) cells,
    * j < depth, b = hash_j(token) % width. Point estimates take the
    * min over rows ([[cmsEstimate]]); overestimates only, by the
    * standard CMS guarantee. */
  def countMinSketch(docs: DataFrame, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1)
    val counts = docs
      .select(explode(org.apache.spark.sql.graft.TokenizeExpr.tokenizeLower(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    counts
      .select(explode(array((0 until depth).map(j =>
          struct(lit(j.toLong).as("j"), (rowHash(j, col("w")) % width).as("b"))): _*)).as("h"),
        col("cnt"))
      .groupBy(col("h.j").as("j"), col("h.b").as("b"))
      .agg(sum("cnt").as("cnt"))
  }

  /** CMS point estimates for a fixed token list as a DATAFRAME
    * endpoint (the serving twin of [[cmsEstimate]], distributed):
    * each probe token hashes to its depth cells and takes the MIN
    * count — overestimate-only by the CMS guarantee, exact integers
    * end to end. The probe list is a tiny literal frame; the join
    * against the depth×width cell table broadcasts. */
  def cmsEstimates(docs: DataFrame, tokens: Seq[String],
                   depth: Int = 4, width: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cells = countMinSketch(docs, depth, width)
    val probes = tokens.toDF("token")
      .select(col("token"), explode(array((0 until depth).map(j =>
        struct(lit(j.toLong).as("j"), (rowHash(j, col("token")) % width).as("b"))): _*)).as("h"))
      .select(col("token"), col("h.j").as("j"), col("h.b").as("b"))
    probes.join(cells, Seq("j", "b"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
  }

  /** Heavy hitters (frequent tokens) by CMS prefilter + exact
    * verification — the standard two-pass pattern for "exact counts of
    * everything frequent" at corpus scale (Cormode & Muthukrishnan §4
    * point queries, applied as a filter): pass 1 builds the constant-
    * size sketch; pass 2 re-scans the token stream, keeps only tokens
    * whose sketch estimate clears `minCount`, and exact-counts the
    * survivors. CMS OVERESTIMATES only, so no true heavy hitter is
    * ever dropped — the result is exactly `HAVING count(*) >=
    * minCount`, which is what the oracle states.
    *
    * Why not just groupBy the stream: at 100 TB the token stream's
    * distinct-key hash aggregate holds the full vocabulary per
    * executor; the prefilter keeps the Zipf long tail (the
    * overwhelming majority of distinct keys) out of the aggregate
    * entirely. The sketch itself is a 1024-long literal array folded
    * into the filter expression — no join, stays in codegen. */
  def heavyHitters(docs: DataFrame, minCount: Long = 100,
                   depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1 && depth * width <= (1 << 20),
      "sketch must stay literal-array small")
    val ws = docs
      .select(explode(org.apache.spark.sql.graft.TokenizeExpr.tokenizeLower(col("text"))).as("w"))
      .localCheckpoint() // both passes consume the token stream
    val cells = ws.groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(explode(array((0 until depth).map(j =>
          struct(lit(j.toLong).as("j"), (rowHash(j, col("w")) % width).as("b"))): _*)).as("h"),
        col("cnt"))
      .groupBy(col("h.j").as("j"), col("h.b").as("b"))
      .agg(sum("cnt").as("cnt"))
      .collect()
    val cellArr = new Array[Long](depth * width)
    cells.foreach(r => cellArr(r.getLong(0).toInt * width + r.getLong(1).toInt) = r.getLong(2))
    val arrLit = typedLit(cellArr.toSeq)
    val est = (0 until depth).map { j =>
      element_at(arrLit, ((rowHash(j, col("w")) % width) + lit(j * width) + 1).cast("int"))
    }.reduce(least(_, _))
    ws.where(est >= minCount)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** Streaming twin of [[countMinSketch]] — the batch form's
    * two-level aggregation (per-token counts, then cells) collapses
    * to ONE aggregation so Structured Streaming accepts it: counting
    * token occurrences per (j, b) cell directly equals summing
    * per-token counts. Complete-mode output; state is the depth x
    * width cell grid — constant, the sketch property that makes it
    * streamable at all. Spec proves stream == batch. */
  def countMinSketchStream(docs: DataFrame, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1)
    docs
      .select(explode(org.apache.spark.sql.graft.TokenizeExpr.tokenizeLower(col("text"))).as("w"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j.toLong).as("j"), (rowHash(j, col("w")) % width).as("b"))): _*)).as("h"))
      .groupBy(col("h.j").as("j"), col("h.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** HyperLogLog registers over distinct corpus tokens (Flajolet et
    * al., "HyperLogLog: the analysis of a near-optimal cardinality
    * estimation algorithm", AofA 2007 — public). The 60-bit portable
    * token hash splits into bucket = h mod m and a 54-bit remainder w;
    * the register is rho(w) = 54 - bitlength(w) + 1 (55 for w = 0) —
    * pure integer math both engines state identically (bitlength is
    * length(bin(w)) in DuckDB, 64 - numberOfLeadingZeros on the JVM).
    * Every bucket emits a row (absent buckets at rho 0), so the m-row
    * output IS the mergeable state: shards combine by max per bucket
    * (spec-proved), and the estimator needs nothing else.
    *
    * Scale shape: distinct + groupBy both bound by vocabulary, the
    * exchange by m rows — constant-size output at any corpus size. */
  def hllSketch(docs: DataFrame, m: Int = 64): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two")
    val b = java.lang.Integer.numberOfTrailingZeros(m)
    val spark = docs.sparkSession
    import spark.implicits._
    val h = org.apache.spark.sql.graft.Md5Prefix60Expr.md5Prefix60(col("w"))
    val regs = docs
      .select(explode(org.apache.spark.sql.graft.TokenizeExpr.tokenizeLower(col("text"))).as("w"))
      .distinct()
      // quotient via shiftright, NOT `/`: Column division is IEEE
      // double and drops low bits past 2^53
      .select((h % m).as("bucket"), shiftright(h, b).as("rem"))
      .withColumn("rho",
        when(col("rem") === 0, lit(55L))
          .otherwise(lit(55L) - length(conv(col("rem"), 10, 2))))
      .groupBy("bucket").agg(max("rho").as("rho"))
    // absent buckets are part of the state: register 0
    val all = (0L until m.toLong).toDF("bucket")
    all.join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("rho"), lit(0L)).as("rho"))
  }

  /** Streaming twin of [[hllSketch]]: registers only GROW, so the
    * batch path's distinct() is an optimization, not semantics —
    * max() over repeated tokens is idempotent and streams in one
    * complete-mode aggregation with m rows of state. Only buckets
    * seen so far appear (absent = register 0, as in the merged
    * state); spec proves stream == batch on the non-zero registers. */
  def hllSketchStream(docs: DataFrame, m: Int = 64): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two")
    val b = java.lang.Integer.numberOfTrailingZeros(m)
    val h = org.apache.spark.sql.graft.Md5Prefix60Expr.md5Prefix60(col("w"))
    docs
      .select(explode(org.apache.spark.sql.graft.TokenizeExpr.tokenizeLower(col("text"))).as("w"))
      .select((h % m).as("bucket"), shiftright(h, b).as("rem"))
      .withColumn("rho",
        when(col("rem") === 0, lit(55L))
          .otherwise(lit(55L) - length(conv(col("rem"), 10, 2))))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }

  /** Standard HLL estimate from the m registers — the float math kept
    * OUT of the oracle-checked state: Z is the exact integer
    * Σ 2^(55 - rho) (every term is integral because rho <= 55), so
    * E = alpha_m * m^2 * 2^55 / Z is one closed-form expression over
    * exact integers. Small-range correction (linear counting) applies
    * below 5m/2 when empty buckets remain, per the paper. */
  def hllEstimate(registers: Array[(Long, Long)]): Double = {
    val m = registers.length
    require(m >= 16, "alpha constant table starts at m = 16")
    val alpha = if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1 + 1.079 / m)
    var z = 0L
    registers.foreach { case (_, r) => z += 1L << (55 - r.toInt) }
    val e = alpha * m * m * math.pow(2.0, 55) / z
    val zeros = registers.count(_._2 == 0L)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Point-frequency estimate from a collected sketch: min over the
    * depth rows of the queried cell (0 for never-hashed cells). A
    * serving-side helper — the sketch is depth x width tiny. */
  def cmsEstimate(sketch: Array[(Long, Long, Long)], token: String,
                  depth: Int = 4, width: Int = 256): Long = {
    val cells = sketch.map { case (j, b, c) => (j, b) -> c }.toMap
    (0 until depth).map { j =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$token".getBytes("UTF-8"))
      val hex = digest.map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      cells.getOrElse((j.toLong, h % width), 0L)
    }.min
  }
}
