package graft.vector

import graft.SparkSpec

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  test("points land in containing polygons only; multi-containment emits multiple rows") {
    val pts = Seq((1L, 1.5, 1.5), (2L, 5.5, 5.5), (3L, 3.5, 3.5), (4L, 9.5, 9.5))
      .toDF("pid", "px", "py")
    val polys = Seq(
      (10L, "POLYGON ((0 0, 4 0, 4 4, 0 4))"),        // pids 1, 3
      (20L, "POLYGON ((3 3, 7 3, 7 7, 3 7))"),        // pids 2, 3
      (30L, "POLYGON ((0 0, 8 0, 8 8, 0 8), (2 2, 6 2, 6 6, 2 6))")) // hole eats 2, 3
      .toDF("gid", "wkt")
    val out = SpatialJoin.pointsInPolygons(pts, polys)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (3L, 10L), (2L, 20L), (3L, 20L), (1L, 30L)))
  }

  test("past maxPolys the grid-bucket plan runs and equals the broadcast plan") {
    // 40 points x 12 polygons (holes + multipolygons included):
    // maxPolys = 0 forces the distributed plan; results must be set-equal
    val rnd = new scala.util.Random(11)
    val pts = (1L to 40L).map(i =>
      (i, rnd.nextDouble() * 20, rnd.nextDouble() * 20)).toDF("pid", "px", "py")
    val polys = (1L to 12L).map { g =>
      val x = (g % 4) * 5.0; val y = (g / 4) * 6.0
      if (g % 3 == 0)
        (g, s"POLYGON (($x $y, ${x + 6} $y, ${x + 6} ${y + 6}, $x ${y + 6}), " +
          s"(${x + 2} ${y + 2}, ${x + 4} ${y + 2}, ${x + 4} ${y + 4}, ${x + 2} ${y + 4}))")
      else
        (g, s"POLYGON (($x $y, ${x + 4} $y, ${x + 4} ${y + 4}, $x ${y + 4}))")
    }.toDF("gid", "wkt")
    val broadcastPlan = SpatialJoin.pointsInPolygons(pts, polys)
      .as[(Long, Long)].collect().toSet
    val gridPlan = SpatialJoin.pointsInPolygons(pts, polys, maxPolys = 0)
      .as[(Long, Long)].collect().toSet
    assert(broadcastPlan.nonEmpty)
    assert(gridPlan == broadcastPlan)
    // and with an explicit (awkwardly small) cell size — fan-out grows,
    // pairs still meet exactly once
    val tiny = SpatialJoin.pointsInPolygonsGrid(pts, polys, cellSize = 0.9)
      .as[(Long, Long)].collect()
    assert(tiny.toSet == broadcastPlan && tiny.length == tiny.toSet.size)
  }
}
