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

  test("maxPolys ceiling fails loudly") {
    val pts = Seq((1L, 1.0, 1.0)).toDF("pid", "px", "py")
    val polys = Seq((1L, "POLYGON ((0 0, 2 0, 2 2, 0 2))"),
      (2L, "POLYGON ((0 0, 2 0, 2 2, 0 2))")).toDF("gid", "wkt")
    val e = intercept[IllegalArgumentException](
      SpatialJoin.pointsInPolygons(pts, polys, maxPolys = 1))
    assert(e.getMessage.contains("maxPolys"))
  }
}
