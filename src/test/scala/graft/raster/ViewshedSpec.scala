package graft.raster

import graft.SparkSpec

class ViewshedSpec extends SparkSpec {
  import spark.implicits._

  def run(cells: Seq[(Long, Long, Double)], ox: Long, oy: Long, z: Long,
          r: Int = 24): Map[(Long, Long), Long] =
    Viewshed.viewshed(cells.toDF("x", "y", "v"), ox, oy, z, r)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap

  test("viewshed: flat plane fully visible from a tower") {
    val plane = for (x <- 0L to 5L; y <- 0L to 5L) yield (x, y, 0.0)
    val m = run(plane, 2, 2, z = 10)
    assert(m.size == 36 && m.values.forall(_ == 1L))
  }

  test("viewshed: a wall hides the low ground behind it, tall peaks clear it") {
    // observer eye z=5 at (0,0); wall z=20 at (1,0):
    //   (2,0) z=0: wall angle 15/1 > target -5/2            -> hidden
    //   (3,0) z=100: 95/3 ~ 31.7 > 15                       -> visible
    //   (0,2) z=0: different ray, no blocker                -> visible
    val cells = Seq((0L, 0L, 5.0), (1L, 0L, 20.0), (2L, 0L, 0.0),
      (3L, 0L, 100.0), (0L, 2L, 0.0))
    val m = run(cells, 0, 0, z = 5)
    assert(m((1L, 0L)) == 1L) // the wall itself is visible
    assert(m((2L, 0L)) == 0L)
    assert(m((3L, 0L)) == 1L)
    assert(m((0L, 2L)) == 1L)
  }

  test("viewshed: equal angle blocks (>= rule)") {
    // slopes from z=5 eye: (1,0)->5/1, (2,0)->10/2 — exactly equal
    val m = run(Seq((1L, 0L, 10.0), (2L, 0L, 15.0)), 0, 0, z = 5)
    assert(m((1L, 0L)) == 1L && m((2L, 0L)) == 0L)
  }

  test("viewshed: diagonal rays sample the NN diagonal cells") {
    // blocker on the diagonal at (2,2) z=30; target (4,4) z=0 hidden,
    // but (4,3) rounds its samples off the peak cell's row -> depends
    // on NN path: samples for (4,3): k=1 -> (1,1); k=2 -> (2,2)!
    // round(2*3/4)=round(1.5)=2 -> also blocked; (4,0) unaffected
    val cells = Seq((2L, 2L, 30.0), (4L, 4L, 0.0), (4L, 3L, 0.0), (4L, 0L, 0.0))
    val m = run(cells, 0, 0, z = 5)
    assert(m((4L, 4L)) == 0L)
    assert(m((4L, 3L)) == 0L)
    assert(m((4L, 0L)) == 1L)
    assert(m((2L, 2L)) == 1L)
  }

  test("viewshed: NoData holes along the ray are transparent") {
    // nothing exists between observer and (3,0)
    val m = run(Seq((3L, 0L, 0.0)), 0, 0, z = 5)
    assert(m((3L, 0L)) == 1L)
  }

  test("viewshed: radius bounds the target set") {
    val far = Seq((10L, 0L, 0.0), (3L, 0L, 0.0))
    val m = run(far, 0, 0, z = 5, r = 5)
    assert(m.contains((3L, 0L)) && !m.contains((10L, 0L)))
  }
}
