package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CRS.{AlbersEqualArea, Sinusoidal}
import graft.core.CRS.TransverseMercator.{Ecc, SemiMajor}

/** Albers Equal-Area + Sinusoidal correctness via derived-property
  * invariants (the PolarLccSpec pattern): parallel scale must be
  * exactly 1 on every declared standard parallel, the finite-
  * difference area scale h*k must be 1 EVERYWHERE (the equal-area
  * property — one equation cross-checking every projection constant
  * at once), and the inverses must undo the forwards to sub-mm.
  */
class AlbersSinuSpec extends AnyFunSuite {

  // radius of the parallel at lat (distance per radian of longitude)
  private def m(latDeg: Double): Double = {
    val p = math.toRadians(latDeg)
    math.cos(p) / math.sqrt(1 - Ecc * Ecc * math.sin(p) * math.sin(p))
  }
  // meridional radius of curvature at lat (distance per radian of latitude)
  private def mrc(latDeg: Double): Double = {
    val p = math.toRadians(latDeg)
    val s2 = math.sin(p) * math.sin(p)
    SemiMajor * (1 - Ecc * Ecc) / math.pow(1 - Ecc * Ecc * s2, 1.5)
  }

  private val conus = AlbersEqualArea(-96.0, 23.0, 29.5, 45.5) // EPSG:5070

  // finite-difference parallel scale k and meridian scale h
  private def kh(t: CRS.Transform, lon: Double, lat: Double): (Double, Double) = {
    val d = 1e-6
    val (x1, y1) = t.forward(lon - d / 2, lat)
    val (x2, y2) = t.forward(lon + d / 2, lat)
    val k = math.hypot(x2 - x1, y2 - y1) / (SemiMajor * m(lat) * math.toRadians(d))
    val (x3, y3) = t.forward(lon, lat - d / 2)
    val (x4, y4) = t.forward(lon, lat + d / 2)
    val h = math.hypot(x4 - x3, y4 - y3) / (mrc(lat) * math.toRadians(d))
    (k, h)
  }

  test("Albers: origin maps to the false origin; k = 1 on BOTH standard parallels") {
    val (ox, oy) = conus.forward(-96.0, 23.0)
    assert(math.abs(ox) < 1e-6 && math.abs(oy) < 1e-6)
    assert(math.abs(kh(conus, -90.0, 29.5)._1 - 1.0) < 1e-6)
    assert(math.abs(kh(conus, -105.0, 45.5)._1 - 1.0) < 1e-6)
    // between the parallels the cone dips below 1, outside it grows
    assert(kh(conus, -96.0, 37.0)._1 < 1.0 && kh(conus, -96.0, 50.0)._1 > 1.0)
  }

  test("Albers is equal-area: h * k = 1 everywhere (finite differences)") {
    for (lon <- Seq(-120.0, -96.0, -75.0); lat <- Seq(25.0, 37.5, 48.0)) {
      val (k, h) = kh(conus, lon, lat)
      assert(math.abs(h * k - 1.0) < 1e-5, s"h*k at ($lon, $lat) = ${h * k}")
    }
  }

  test("Albers roundtrips are identity across CONUS") {
    for (lon <- Seq(-124.5, -96.0, -67.25); lat <- Seq(24.5, 37.0, 49.0)) {
      val (x, y) = conus.forward(lon, lat)
      val (lon2, lat2) = conus.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
    }
  }

  test("Albers forward wraps lon-lon0 across the antimeridian before the cone scaling") {
    val aleutian = AlbersEqualArea(-154.0, 50.0, 55.0, 65.0)
    assert(aleutian.forward(179.0, 55.0) == aleutian.forward(179.0 - 360.0, 55.0))
  }

  test("Sinusoidal (ellipsoidal): k = 1 along every parallel, h = 1 on the central meridian") {
    val sinu = Sinusoidal()
    for (lat <- Seq(-60.0, 0.0, 35.25, 70.0)) {
      assert(math.abs(kh(sinu, 40.0, lat)._1 - 1.0) < 1e-6, s"k at $lat")
      assert(math.abs(kh(sinu, 0.0, lat)._2 - 1.0) < 1e-6, s"h at $lat")
    }
    // equal-area: the meridian convergence shears but h*k*cos(shear)
    // stays 1; check the determinant form via a small quad
    val d = 1e-6
    for (lon <- Seq(-120.0, 60.0); lat <- Seq(-45.0, 30.0)) {
      val (x0, y0) = sinu.forward(lon, lat)
      val (x1, y1) = sinu.forward(lon + d, lat)
      val (x2, y2) = sinu.forward(lon, lat + d)
      val area = math.abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))
      val truth = SemiMajor * m(lat) * math.toRadians(d) * mrc(lat) * math.toRadians(d)
      assert(math.abs(area / truth - 1.0) < 1e-5, s"area scale at ($lon, $lat)")
    }
  }

  test("Sinusoidal roundtrips: ellipsoidal and MODIS sphere") {
    val ell = Sinusoidal()
    val modis = Sinusoidal(sphereRadius = Some(6371007.181))
    for (t <- Seq(ell, modis); lon <- Seq(-179.5, -63.0, 0.0, 141.75);
         lat <- Seq(-82.0, -23.5, 0.0, 45.125, 80.0)) {
      val (x, y) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"$t lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"$t lat $lat -> $lat2")
    }
  }

  test("MODIS sphere: y is linear in latitude and the h-tile width is ~1111950.52 m") {
    val modis = Sinusoidal(sphereRadius = Some(6371007.181))
    val (_, y10) = modis.forward(0.0, 10.0)
    val (_, y20) = modis.forward(0.0, 20.0)
    assert(math.abs(y20 - 2 * y10) < 1e-6)
    // published MODIS constant: tile height = 10 degrees of latitude
    assert(math.abs((y20 - y10) - 1111950.519667) < 1e-3)
  }

  test("fromName resolves EPSG:5070 and the aea/sinu proj4 forms") {
    assert(CRS.fromName("EPSG:5070") == conus)
    val p = CRS.fromName("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0")
    assert(p == conus)
    val s = CRS.fromName("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181")
    assert(s == Sinusoidal(sphereRadius = Some(6371007.181)))
    // the MODIS string's usual +a=+b spelling is the same sphere
    assert(CRS.fromName("+proj=sinu +lon_0=0 +a=6371007.181 +b=6371007.181") == s)
    // +a alone (no +b) is NOT a declared sphere -> ellipsoidal WGS84
    assert(CRS.fromName("+proj=sinu +lon_0=0") == Sinusoidal())
    intercept[IllegalArgumentException](CRS.fromName("+proj=aea +lat_0=23"))
  }

  // the forwardSqlSteps texts are exercised end-to-end (Spark expr()
  // vs DuckDB CTE chain on live data) by q_reproject_albers and
  // q_reproject_sinu in the correctness gate
}
