package graft.raster

import graft.SparkSpec

class RegionGroupSpec extends SparkSpec {
  import spark.implicits._

  // 4x4 grid, linear id = y*4+x. cls=1 cells: L-shape {0,1,5},
  // isolated {3}, diagonal-only neighbor {10}; cls=2 cell {15}
  // touches {10} diagonally but differs in class.
  val cells = Seq(
    (0L, 0L, 1L), (1L, 0L, 1L), (1L, 1L, 1L),
    (3L, 0L, 1L),
    (2L, 2L, 1L),
    (3L, 3L, 2L))
    .toDF("x", "y", "cls")

  def run(conn: Int): Map[Long, Long] =
    RegionGroup.regionGroup(cells, gridCols = 4, connectivity = conn)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._2 * 4 + r._1) -> r._4).toMap

  test("region group 4-connectivity: edge-adjacent same-class cells merge, diagonals don't") {
    val m = run(4)
    assert(m(0L) == 0L && m(1L) == 0L && m(5L) == 0L) // L-shape
    assert(m(3L) == 3L)                                // isolated singleton
    assert(m(10L) == 10L)                              // diagonal stays apart
    assert(m(15L) == 15L)
  }

  test("region group 8-connectivity: diagonals merge, class boundary still separates") {
    val m = run(8)
    assert(m(0L) == 0L && m(1L) == 0L && m(5L) == 0L && m(10L) == 0L)
    assert(m(3L) == 3L)
    assert(m(15L) == 15L) // adjacent to id 10 but cls 2 != 1
  }

  test("two-level tile contraction labels identically to the flat path") {
    // 24x24 grid, tiles of 8: deterministic sparse pattern whose
    // regions snake across tile borders (incl. diagonal corner
    // touches); compare flat (tileSize=0) vs contracted label maps
    val g = for {
      x <- 0L until 24L; y <- 0L until 24L
      if (x * 7 + y * 13 + (x * y) % 5) % 3 != 0
    } yield (x, y, (x + y) % 2)
    val df = g.toDF("x", "y", "cls")
    for (conn <- Seq(4, 8)) {
      val flat = RegionGroup.regionGroup(df, 24, conn, tileSize = 0)
        .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._4).toMap
      val two = RegionGroup.regionGroup(df, 24, conn, tileSize = 8)
        .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._4).toMap
      assert(two == flat, s"connectivity $conn")
    }
  }

  test("region group 8-connectivity: anti-diagonal (dx=1, dy=-1) neighbors merge") {
    val d = Seq((0L, 1L, 1L), (1L, 0L, 1L)).toDF("x", "y", "cls")
    val m = RegionGroup.regionGroup(d, gridCols = 4, connectivity = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._2 * 4 + r._1) -> r._4).toMap
    assert(m == Map(4L -> 1L, 1L -> 1L))
  }

  test("vectorize: hand-computed area/perimeter/bbox per region") {
    // L-shape {(0,0),(1,0),(1,1)}: area 3, perimeter 8 (4*3 - 2*2
    // shared edges); singletons: area 1, perimeter 4; plus a 2x2 block
    val withBlock = cells.union(Seq(
      (5L, 5L, 5L), (6L, 5L, 5L), (5L, 6L, 5L), (6L, 6L, 5L)
    ).toDF("x", "y", "cls"))
    val labeled = RegionGroup.regionGroup(withBlock, gridCols = 8)
    val v = RegionGroup.vectorize(labeled)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // L-shape, region label 0 (min id): area 3, perimeter 8, bbox 0..1
    assert(v(0L) == ((0L, 1L, 3L, 8L, 0L, 0L, 1L, 1L)))
    // isolated singleton
    assert(v(3L) == ((3L, 1L, 1L, 4L, 3L, 0L, 3L, 0L)))
    // 2x2 block at (5..6, 5..6), label = min id = 5*8+5 = 45:
    // area 4, perimeter 8 (4*4 - 2*4 shared edges)
    assert(v(45L) == ((45L, 5L, 4L, 8L, 5L, 5L, 6L, 6L)))
  }

  test("sieve: small regions adopt the largest neighbor's class; islands keep theirs") {
    // row strip A (cls 1, 3 cells), singleton B (cls 2) under A's
    // middle, singleton C (cls 3) at the far corner with no neighbor
    val g = Seq(
      (0L, 0L, 1L), (1L, 0L, 1L), (2L, 0L, 1L),
      (1L, 1L, 2L),
      (7L, 7L, 3L)).toDF("x", "y", "cls")
    val labeled = RegionGroup.regionGroup(g, gridCols = 8)
    val out = RegionGroup.sieve(labeled, minSize = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 1L)) == 1L)                         // B absorbed into A
    assert(out((7L, 7L)) == 3L)                         // island keeps cls
    assert(out((0L, 0L)) == 1L && out((2L, 0L)) == 1L)  // A untouched
    assert(out.size == 5)
  }

  test("sieve: equal-area neighbor tie breaks to the smallest region id") {
    // two 2-cell regions flank a singleton: left {(0,1),(1,1)} cls 5
    // (region id 8), right {(3,1),(4,1)} cls 7 (region id 11); the
    // singleton (2,1) cls 9 touches both -> adopts cls 5 (region 8 < 11)
    val g = Seq(
      (0L, 1L, 5L), (1L, 1L, 5L),
      (2L, 1L, 9L),
      (3L, 1L, 7L), (4L, 1L, 7L)).toDF("x", "y", "cls")
    val out = RegionGroup.sieve(RegionGroup.regionGroup(g, gridCols = 8), minSize = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((2L, 1L)) == 5L)
    // the flanking regions are >= minSize and stay
    assert(out((0L, 1L)) == 5L && out((4L, 1L)) == 7L)
  }
}
