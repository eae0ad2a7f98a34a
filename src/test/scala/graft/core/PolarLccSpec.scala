package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CRS.{LambertConformalConic, PolarStereographic}
import graft.core.CRS.TransverseMercator.{Ecc, SemiMajor}

/** Polar Stereographic + Lambert Conformal Conic correctness via
  * derived-property invariants: the projection constants (scaleC; n,
  * F, rho0) are only consistent if the scale factor is exactly 1 at
  * every declared true-scale line, and the iterative inverses must
  * undo the closed-form forwards to sub-mm.
  */
class PolarLccSpec extends AnyFunSuite {

  private def m(latDeg: Double): Double = {
    val p = math.toRadians(latDeg)
    math.cos(p) / math.sqrt(1 - Ecc * Ecc * math.sin(p) * math.sin(p))
  }

  private val arctic = PolarStereographic(-45.0, 70.0, north = true) // EPSG:3413
  private val antarctic = PolarStereographic(0.0, -71.0, north = false) // EPSG:3031

  test("pole maps to the grid origin; central meridian maps straight down") {
    val (px, py) = arctic.forward(123.0, 90.0)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
    val (x, y) = arctic.forward(-45.0, 75.0) // on lon0
    assert(math.abs(x) < 1e-6 && y < 0)
  }

  test("scale is exactly 1 on the true-scale parallel (both hemispheres)") {
    // k(phi) = rho / (a m(phi)); rho measured from the pole center
    def k(t: PolarStereographic, lon: Double, lat: Double): Double = {
      val (x, y) = t.forward(lon, lat)
      math.sqrt(x * x + y * y) / (SemiMajor * m(math.abs(lat)))
    }
    assert(math.abs(k(arctic, 10.0, 70.0) - 1.0) < 1e-12)
    assert(math.abs(k(antarctic, 10.0, -71.0) - 1.0) < 1e-12)
    // away from the parallel the scale grows toward the equator
    assert(k(arctic, 10.0, 60.0) > 1.0 && k(arctic, 10.0, 80.0) < 1.0)
  }

  test("UPS (k0 form): scale at the pole is 0.994") {
    val ups = CRS.fromName("EPSG:5041").asInstanceOf[PolarStereographic]
    val (x, y) = ups.forward(77.0, 89.9999)
    val rho = math.hypot(x - 2000000.0, y - 2000000.0)
    assert(math.abs(rho / (SemiMajor * m(89.9999)) - 0.994) < 1e-7)
    // pole sits on the false origin
    val (px, py) = ups.forward(0.0, 90.0)
    assert(math.abs(px - 2000000.0) < 1e-6 && math.abs(py - 2000000.0) < 1e-6)
  }

  test("polar roundtrips are identity to sub-mm (1e-9 deg)") {
    for (t <- Seq(arctic, antarctic, CRS.fromName("EPSG:5041"), CRS.fromName("EPSG:5042"));
         lon <- Seq(-179.5, -45.0, 0.0, 60.25, 179.5);
         lat <- Seq(55.0, 70.0, 82.125, 89.0)) {
      val sLat = if (t == antarctic || t == CRS.fromName("EPSG:5042")) -lat else lat
      val (x, y) = t.forward(lon, sLat)
      val (lon2, lat2) = t.inverse(x, y)
      assert(math.abs(lat2 - sLat) < 1e-9, s"$t lat $sLat -> $lat2")
      val dLon = math.abs(lon2 - lon) min math.abs(math.abs(lon2 - lon) - 360)
      assert(dLon < 1e-9, s"$t lon $lon -> $lon2")
    }
  }

  test("LCC: origin maps to the false origin; scale is 1 on BOTH standard parallels") {
    // a CONUS-ish state-plane shape (like Texas Central's parallels)
    val lcc = LambertConformalConic(-98.5, 29.67, 30.12, 31.88, 700000.0, 3000000.0)
    val (ox, oy) = lcc.forward(-98.5, 29.67)
    assert(math.abs(ox - 700000.0) < 1e-6 && math.abs(oy - 3000000.0) < 1e-6)
    // finite-difference scale along a parallel: projected arc over true
    // ellipsoid arc a m(phi) dλ — independent of the projection's own
    // constants (n, F, rho0), so it cross-checks all three at once
    def k(lat: Double): Double = {
      val d = 1e-6 // degrees
      val (x1, y1) = lcc.forward(-96.0 - d / 2, lat)
      val (x2, y2) = lcc.forward(-96.0 + d / 2, lat)
      math.hypot(x2 - x1, y2 - y1) / (SemiMajor * m(lat) * math.toRadians(d))
    }
    assert(math.abs(k(30.12) - 1.0) < 1e-6, s"k(lat1) = ${k(30.12)}")
    assert(math.abs(k(31.88) - 1.0) < 1e-6, s"k(lat2) = ${k(31.88)}")
    assert(k(31.0) < 1.0 && k(29.0) > 1.0) // inside the parallels the cone dips below 1
  }

  test("LCC forward wraps lon-lon0 across the antimeridian (Aleutian cone)") {
    val lcc = LambertConformalConic(-154.0, 55.0, 52.0, 58.0)
    // the same physical meridian expressed either side of the wrap
    // must project identically (th is scaled by the non-integer cone
    // constant BEFORE sin/cos, so an unwrapped 333-degree dl would
    // land on a different azimuth)
    val a = lcc.forward(179.0, 55.0)
    val b = lcc.forward(179.0 - 360.0, 55.0)
    assert(a == b)
    val (lon2, lat2) = lcc.inverse(a._1, a._2)
    assert(math.abs(lon2 - 179.0) < 1e-9 && math.abs(lat2 - 55.0) < 1e-9)
  }

  test("LCC roundtrips are identity across the zone") {
    val lcc = LambertConformalConic(-98.5, 29.67, 30.12, 31.88, 700000.0, 3000000.0)
    for (lon <- Seq(-103.0, -98.5, -94.25); lat <- Seq(26.0, 29.67, 31.88, 36.5)) {
      val (x, y) = lcc.forward(lon, lat)
      val (lon2, lat2) = lcc.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
    }
  }

  test("fromName resolves polar and LCC proj4 strings") {
    assert(CRS.fromName("EPSG:3413") == arctic)
    assert(CRS.fromName("3031") == antarctic)
    val p = CRS.fromName("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0")
    assert(p == arctic)
    val l = CRS.fromName("+proj=lcc +lon_0=-98.5 +lat_0=29.67 +lat_1=30.12 +lat_2=31.88 +x_0=700000 +y_0=3000000")
    assert(l == LambertConformalConic(-98.5, 29.67, 30.12, 31.88, 700000.0, 3000000.0))
    intercept[IllegalArgumentException](CRS.fromName("+proj=stere +lat_0=45"))
    // +proj=sterea (oblique Gauss-Schreiber) is a DIFFERENT projection —
    // a prefix match would silently construct polar math for it
    val e = intercept[IllegalArgumentException](
      CRS.fromName("+proj=sterea +lat_0=90 +lon_0=0"))
    assert(e.getMessage.contains("sterea"))
    intercept[IllegalArgumentException](CRS.fromName("+proj=lcca +lat_0=45 +lat_1=46"))
    // bare polar stere without +lat_ts/+k defaults k0 = 1 (proj
    // semantics), never Infinity
    val bare = CRS.fromName("+proj=stere +lat_0=90 +lon_0=0")
      .asInstanceOf[PolarStereographic]
    val (bx, by) = bare.forward(10.0, 80.0)
    assert(!bx.isNaN && !bx.isInfinite && !by.isNaN && !by.isInfinite)
  }

  test("inverse longitudes are normalized into [-180, 180) even when lon0 shifts them out") {
    // EPSG:3413's lon0 = -45: a raw lon0 + dl spans (-225, 135], which
    // would silently NoData the (135, 180] wedge in reprojectTiled's
    // source bounds check
    for (lon <- Seq(136.0, 160.0, 179.9, -179.9); lat <- Seq(62.0, 75.0)) {
      val (x, y) = arctic.forward(lon, lat)
      val (lon2, _) = arctic.inverse(x, y)
      assert(lon2 >= -180.0 && lon2 < 180.0, s"lon $lon -> $lon2 out of range")
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
    }
  }
}
