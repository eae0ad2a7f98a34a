package graft.raster

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}

/** Property checks for the r13 tile-local halo conversions
  * (zonalGeometry, Contour.segmentCounts, Hydrology.flowDirection):
  * on random sparse grids spanning multiple tiles, the distributed
  * halo-scan result must equal a driver-side BRUTE-FORCE reference
  * computed straight from the cell map — the strongest guard against
  * seam/ownership bugs (each property run hits tile interiors, seams,
  * the 4-corner junction, grid edges, and NoData holes at random). */
class HaloPartialsPropertySpec extends SparkSpec {
  import spark.implicits._

  // 8x8 grid cut into four 4x4 tiles: every shape category (interior,
  // x-seam, y-seam, corner junction, grid edge) is reachable
  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))
  val G = 8

  private val gridGen: Gen[Map[(Int, Int), Double]] = for {
    n <- Gen.choose(1, 40)
    cells <- Gen.listOfN(n, for {
      x <- Gen.choose(0, G - 1); y <- Gen.choose(0, G - 1)
      v <- Gen.choose(0, 3)
    } yield ((x, y), v.toDouble))
  } yield cells.toMap

  private def toLayer(m: Map[(Int, Int), Double]): RasterLayer =
    RasterLayer.fromCells(
      m.toSeq.map { case ((x, y), v) => (x.toLong, y.toLong, v) }.toDF("x", "y", "v"),
      layout, CellOp.Last)

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(30)

  test("zonalGeometry == brute force on random multi-tile grids") {
    val p = Prop.forAll(gridGen) { m =>
      val got = ZonalOps.zonalGeometry(toLayer(m))
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // brute force: per zone, count cells + 4-neighbor boundary edges
      val want = m.keys.groupBy(k => m(k).toLong).map { case (z, ks) =>
        val per = ks.toSeq.map { case (x, y) =>
          Seq((x - 1, y), (x + 1, y), (x, y - 1), (x, y + 1)).count { nb =>
            !m.get(nb).exists(_.toLong == z)
          }.toLong
        }.sum
        z -> (ks.size.toLong, per)
      }
      got == want
    }
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("contour segmentCounts == brute force marching squares") {
    val levels = Seq(1.0, 2.5)
    val p = Prop.forAll(gridGen) { m =>
      val got = Contour.segmentCounts(toLayer(m), levels)
        .as[(Double, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = levels.map { lev =>
        var segs = 0L; var blocks = 0L
        for (y <- 0 until G - 1; x <- 0 until G - 1) {
          val cs = Seq((x, y), (x + 1, y), (x, y + 1), (x + 1, y + 1)).map(m.get)
          if (cs.forall(_.isDefined)) {
            val Seq(v00, v10, v01, v11) = cs.map(_.get)
            val c = (if (v00 >= lev) 1 else 0) + (if (v10 >= lev) 2 else 0) +
                    (if (v01 >= lev) 4 else 0) + (if (v11 >= lev) 8 else 0)
            if (c != 0 && c != 15) {
              blocks += 1
              segs += (if (c == 6 || c == 9) 2L else 1L)
            }
          }
        }
        lev -> (segs, blocks)
      }.toMap
      got == want
    }
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("flowDirection == brute force D8 with the ascending-code tie cascade") {
    val Sentinel = -1e300
    // wider value range so drops actually differentiate
    val demGen = gridGen.map(_.map { case (k, v) => k -> v * 7 })
    val p = Prop.forAll(demGen) { m =>
      val got = Hydrology.flowDirectionLayer(toLayer(m))
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1.toInt, r._2.toInt) -> r._3).toMap
      val want = m.map { case ((x, y), zc) =>
        val drops = Hydrology.Dirs.map { case (dx, dy, code) =>
          val d = m.get((x + dx, y + dy))
            .filter(_ => x + dx >= 0 && x + dx < G && y + dy >= 0 && y + dy < G)
            .map(nz => (zc - nz) / (if (dx != 0 && dy != 0) math.sqrt(2.0) else 1.0))
            .getOrElse(Sentinel)
          code -> d
        }
        val best = drops.map(_._2).max
        val code = if (best <= 0) 0L
                   else drops.find(_._2 == best).get._1.toLong
        (x, y) -> code
      }
      got == want
    }
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("plan shape: no Window / per-cell exchange in the converted operators") {
    val l = toLayer(Map((0, 0) -> 1.0, (4, 4) -> 2.0))
    def physical(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    assert(!physical(ZonalOps.zonalGeometry(l)).contains("Window"),
      "zonalGeometry plan regressed to a window over per-cell rows")
    assert(!physical(Contour.segmentCounts(l, Seq(1.0))).contains("Window"),
      "contours plan regressed to a window over per-cell rows")
    assert(!physical(Hydrology.flowDirectionLayer(l)).contains("Window"),
      "flowDirection plan regressed")
  }
}
