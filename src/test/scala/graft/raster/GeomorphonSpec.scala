package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

/** Geomorphon ternary-pattern landforms on hand-built fields. */
class GeomorphonSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 16, 16), TileLayout(2, 2, 8, 8))
  val interior = for (x <- 4L to 11L; y <- 4L to 11L) yield (x, y)

  private def classify(f: (Long, Long) => Double,
                       t12: Long = 12): Map[(Long, Long), Long] = {
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y, f(x, y))
    RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout)
      .geomorphon(t12).toCells
      .select(col("x"), col("y"), col("v").cast("long"))
      .as[(Long, Long, Long)].collect()
      .map(c => (c._1, c._2) -> c._3).toMap
  }

  test("flat field classifies flat; edge cells drop (full-window rule)") {
    val out = classify((_, _) => 5.0)
    assert(interior.forall(k => out(k) == Geomorphon.Flat))
    // anything within 4 of the grid edge lacks the 32-sample window
    assert(out.keySet == interior.toSet)
  }

  test("cone apex = peak, inverted apex = pit") {
    def cone(x: Long, y: Long) = 100.0 - 10.0 * math.max(math.abs(x - 8), math.abs(y - 8))
    val up = classify(cone)
    assert(up((8L, 8L)) == Geomorphon.Peak)
    val dn = classify((x, y) => -cone(x, y))
    assert(dn((8L, 8L)) == Geomorphon.Pit)
  }

  test("ridge and valley lines classify along x = 8") {
    val ridge = classify((x, _) => 100.0 - 10.0 * math.abs(x - 8))
    val valley = classify((x, _) => 10.0 * math.abs(x - 8))
    for (y <- 4L to 11L) {
      assert(ridge((8L, y)) == Geomorphon.Ridge, s"ridge y=$y: ${ridge((8L, y))}")
      assert(valley((8L, y)) == Geomorphon.Valley, s"valley y=$y: ${valley((8L, y))}")
    }
  }

  test("threshold is strict and exact: slope 1/step is flat, 2/step is slope") {
    // v = x: every per-step rise is exactly the t12 = 12 threshold ->
    // neutral everywhere (up12 > 12 is FALSE at 12) -> flat. The
    // exact-integer arithmetic makes this boundary deterministic.
    val atThreshold = classify((x, _) => x.toDouble)
    assert(interior.forall(k => atThreshold(k) == Geomorphon.Flat))
    // v = 2x: E/W rays decide (diagonals too), hi = lo = 3 -> slope
    val above = classify((x, _) => 2.0 * x)
    assert(interior.forall(k => above(k) == Geomorphon.Slope))
    // raising the threshold past 24 flattens it again
    val relaxed = classify((x, _) => 2.0 * x, t12 = 25)
    assert(interior.forall(k => relaxed(k) == Geomorphon.Flat))
  }

  test("fractional DEM: sub-integer tangents decide by the true double " +
       "comparison (no zero-ward 1/12-step quantization)") {
    // plane z = 1.0625·x (dyadic, exact in doubles): per-step 12-tangent
    // is 12.75 — a QUANTIZED (toLong) comparison would floor it to 12,
    // fail the strict > t12 test and read FLAT; the double path reads
    // the true slope (hi = lo = 3)
    val out = classify((x, _) => 1.0625 * x)
    assert(interior.forall(k => out(k) == Geomorphon.Slope),
      s"zero-ward quantization bias: ${out(interior.head)}")
  }

  test("fractional DEM matches an independent driver reference cell-for-cell") {
    // pseudo-random dyadic field (multiples of 1/8 — every product with
    // 12/k is exact in doubles, so reference and kernel share decisions)
    def z(x: Long, y: Long): Double = ((x * 37 + y * 91) % 64).toDouble / 8.0
    val out = classify(z)
    // straight-from-the-paper scalar reference, written independently
    // of the kernel (per-ray max of 12·(z_k − z0)/k, strict > t12,
    // exact ties neutral)
    def reference(x: Long, y: Long): Long = {
      var hi = 0; var lo = 0
      for ((dx, dy) <- Geomorphon.Dirs) {
        var up = Double.NegativeInfinity; var dn = Double.NegativeInfinity
        for (k <- 1 to 4) {
          val dz = z(x + dx * k, y + dy * k) - z(x, y)
          up = math.max(up, dz * 12.0 / k)
          dn = math.max(dn, -dz * 12.0 / k)
        }
        if (up > 12 && up > dn) hi += 1
        else if (dn > 12 && dn > up) lo += 1
      }
      Geomorphon.Lut((hi, lo)).toLong
    }
    interior.foreach { case (x, y) =>
      assert(out((x, y)) == reference(x, y), s"($x,$y)")
    }
  }

  test("Weiss landforms: flat plains, cone apex = mountain top, pit = canyon") {
    def landform(f: (Long, Long) => Double): Map[(Long, Long), Long] = {
      val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y, f(x, y))
      Geomorphon.landforms(
          RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout), t = 1L, relief = 4L)
        .toCells.select(col("x"), col("y"), col("v").cast("long"))
        .as[(Long, Long, Long)].collect().map(c => (c._1, c._2) -> c._3).toMap
    }
    val flat = landform((_, _) => 7.0)
    assert(interior.forall(k => flat(k) == 5L), "plains") // rng 0 <= relief
    def cone(x: Long, y: Long) = 100.0 - 10.0 * math.max(math.abs(x - 8), math.abs(y - 8))
    assert(landform(cone)((8L, 8L)) == 10L, "mountain top")
    assert(landform((x, y) => -cone(x, y))((8L, 8L)) == 1L, "canyon")
    // steep uniform slope: both TPIs neutral (symmetric window), high
    // relief -> open slope
    assert(landform((x, _) => 10.0 * x)((8L, 8L)) == 6L, "open slope")
  }

  test("cast shadow: a wall shadows the 4 cells sunward of it, exactly") {
    def shadow(f: (Long, Long) => Double): Map[(Long, Long), Long] = {
      val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y, f(x, y))
      Geomorphon.castShadow(
          RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout),
          dirIdx = 2, tanAlt = 0.5)
        .toCells.select(col("x"), col("y"), col("v").cast("long"))
        .as[(Long, Long, Long)].collect().map(c => (c._1, c._2) -> c._3).toMap
    }
    val wall = shadow((x, _) => if (x >= 10) 100.0 else 0.0)
    for (y <- 4L to 11L) {
      for (x <- 6L to 9L) assert(wall((x, y)) == 1L, s"($x,$y) in shadow")
      for (x <- 4L to 5L) assert(wall((x, y)) == 0L, s"($x,$y) lit")
    }
    // threshold is strict: rise of exactly k/2 per k steps does NOT shadow
    val graze = shadow((x, _) => 0.5 * x)
    assert(interior.forall(k => graze(k) == 0L), "graze")
    val steeper = shadow((x, _) => 0.625 * x) // dyadic, > 1/2 per step
    assert(interior.forall(k => steeper(k) == 1L), "steeper")
  }

  test("openness: 90 on flats, sky-open at the cone apex, signs sum to 180") {
    def open(f: (Long, Long) => Double, positive: Boolean): Map[(Long, Long), Double] = {
      val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y, f(x, y))
      RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout)
        .openness(positive).toCells
        .as[(Long, Long, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    }
    // flat: every ray's max tangent is 0 -> both openness = 90 deg
    val flatP = open((_, _) => 5.0, positive = true)
    val flatN = open((_, _) => 5.0, positive = false)
    assert(interior.forall(k => math.abs(flatP(k) - 90.0) < 1e-12))
    assert(interior.forall(k => math.abs(flatN(k) - 90.0) < 1e-12))
    // cone apex: every ray descends at 10/step -> positive openness
    // = 90 + atan(10) ~ 174.3 (open sky), negative its mirror
    def cone(x: Long, y: Long) = 100.0 - 10.0 * math.max(math.abs(x - 8), math.abs(y - 8))
    val p = open(cone, positive = true); val nE = open(cone, positive = false)
    val want = 90.0 + math.toDegrees(math.atan(10.0))
    assert(math.abs(p((8L, 8L)) - want) < 1e-9, p((8L, 8L)))
    assert(math.abs(nE((8L, 8L)) - (180.0 - want)) < 1e-9)
    // pos + neg = 180 wherever every ray is MONOTONE (max slope up =
    // max slope down, atan odd): true at the cone apex and everywhere
    // on a plane ramp — NOT on general surfaces (each sign takes its
    // own per-ray maximum)
    assert(math.abs(p((8L, 8L)) + nE((8L, 8L)) - 180.0) < 1e-9)
    val rampP = open((x, _) => 20.0 * x, positive = true)
    val rampN = open((x, _) => 20.0 * x, positive = false)
    assert(interior.forall(k => math.abs(rampP(k) + rampN(k) - 180.0) < 1e-9))
  }

  test("missing ray cells drop the cell (NoData propagates)") {
    val cells = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y, 5.0))
      .filterNot { case (x, y, _) => x == 6 && y == 6 }
    val out = RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout)
      .geomorphon().toCells
      .select(col("x"), col("y")).as[(Long, Long)].collect().toSet
    // every interior cell whose 8 rays (4 steps) touch (6,6) is gone
    val touched = interior.filter { case (cx, cy) =>
      (1 to 4).exists { k =>
        Seq((0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1))
          .exists { case (dx, dy) => cx + dx * k == 6 && cy + dy * k == 6 }
      }
    }.toSet + ((6L, 6L))
    assert(out == interior.toSet -- touched)
  }
}
