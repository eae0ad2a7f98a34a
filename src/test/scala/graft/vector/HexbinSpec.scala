package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HexbinSpec extends SparkSpec {
  import spark.implicits._

  test("hexbin: every point is nearest its assigned hex center") {
    val size = 5.0
    val pts = (for (i <- 0 until 200) yield
      (i.toLong, (i * 13 % 40) + 0.37, (i * 29 % 40) + 0.91))
      .toDF("pid", "px", "py")
    val (hq, hr) = Hexbin.hexId(col("px"), col("py"), size)
    val rows = pts.select(col("px"), col("py"), hq.as("q"), hr.as("r"))
      .as[(Double, Double, Long, Long)].collect()
    def center(q: Long, r: Long): (Double, Double) =
      (size * math.sqrt(3.0) * (q + r / 2.0), size * 1.5 * r)
    rows.foreach { case (px, py, q, r) =>
      val (cx, cy) = center(q, r)
      val d0 = math.hypot(px - cx, py - cy)
      assert(d0 <= size + 1e-9) // inside the circumradius
      // strictly closer than all 6 neighbors (no boundary points here)
      for ((dq, dr) <- Seq((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))) {
        val (nx, ny) = center(q + dq, r + dr)
        assert(d0 < math.hypot(px - nx, py - ny) + 1e-9)
      }
    }
  }

  test("hexbin: bin counts conserve points") {
    val pts = (1L to 100L).map(i => (i, (i * 13 % 64) + 0.5, (i * 29 % 64) + 0.5))
      .toDF("pid", "px", "py")
    val out = Hexbin.bin(pts, 10.0).as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == 100L)
    assert(out.map(_._4).sum == (1L to 100L).sum)
  }
}
