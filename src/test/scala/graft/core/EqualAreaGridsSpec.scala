package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CRS.{CylindricalEqualArea, LambertAzimuthalEqualArea}
import graft.core.CRS.TransverseMercator.{Ecc, SemiMajor}

/** r16 CRS registry additions — CEA (EASE-Grid 2.0) and LAEA (ETRS89
  * Europe) via the AlbersSinuSpec derived-property discipline
  * (standard-parallel scale, the h*k = 1 equal-area identity,
  * sub-mm roundtrips), plus the by-number registrations
  * (2154/2193/25832/3035/6933) checked against their defining
  * projections. */
class EqualAreaGridsSpec extends AnyFunSuite {

  private def m(latDeg: Double): Double = {
    val p = math.toRadians(latDeg)
    math.cos(p) / math.sqrt(1 - Ecc * Ecc * math.sin(p) * math.sin(p))
  }
  private def mrc(latDeg: Double): Double = {
    val p = math.toRadians(latDeg)
    val s2 = math.sin(p) * math.sin(p)
    SemiMajor * (1 - Ecc * Ecc) / math.pow(1 - Ecc * Ecc * s2, 1.5)
  }
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

  private val ease2 = CylindricalEqualArea(0.0, 30.0) // EPSG:6933
  private val laeaEu = LambertAzimuthalEqualArea(10.0, 52.0, 4321000.0, 3210000.0) // EPSG:3035

  test("CEA: k = 1 on both standard parallels; published EASE-2 x-extent") {
    assert(math.abs(kh(ease2, 40.0, 30.0)._1 - 1.0) < 1e-6)
    assert(math.abs(kh(ease2, -75.0, -30.0)._1 - 1.0) < 1e-6)
    // the published EASE-Grid 2.0 global half-extent: x(180) =
    // 17367530.45 m (NSIDC EASE-2 definition) — a full-constant
    // cross-check of a*k0*pi
    val (xMax, _) = ease2.forward(180.0 - 1e-12, 0.0)
    assert(math.abs(xMax - 17367530.45) < 0.1, xMax)
    // the equator maps to y = 0, the origin to (0, 0)
    assert(ease2.forward(0.0, 0.0) == (0.0, 0.0))
  }

  test("CEA is equal-area (h*k = 1) and roundtrips to 1e-9 degrees") {
    for (lon <- Seq(-170.25, -30.0, 0.25, 145.0); lat <- Seq(-80.0, -30.0, 0.25, 55.5)) {
      val (k, h) = kh(ease2, lon, lat)
      assert(math.abs(h * k - 1.0) < 1e-5, s"h*k at ($lon, $lat) = ${h * k}")
      val (x, y) = ease2.forward(lon, lat)
      val (lon2, lat2) = ease2.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon, $lat) -> ($lon2, $lat2)")
    }
  }

  /** Finite-difference Jacobian area scale — the equal-area invariant
    * that holds for OBLIQUE aspects too (h*k = 1 assumes an orthogonal
    * projected graticule, true for normal conic/cylindric aspects but
    * NOT for the oblique azimuthal: there h*k*cos(theta') = 1). */
  private def areaScale(t: CRS.Transform, lon: Double, lat: Double): Double = {
    val d = 1e-6
    val (x1, y1) = t.forward(lon - d / 2, lat)
    val (x2, y2) = t.forward(lon + d / 2, lat)
    val (x3, y3) = t.forward(lon, lat - d / 2)
    val (x4, y4) = t.forward(lon, lat + d / 2)
    val dr = math.toRadians(d)
    val jac = math.abs((x2 - x1) * (y4 - y3) - (x4 - x3) * (y2 - y1)) / (dr * dr)
    jac / (SemiMajor * m(lat) * mrc(lat))
  }

  test("LAEA: false origin at (lon0, lat0); equal-area (Jacobian); roundtrips across Europe") {
    val (ox, oy) = laeaEu.forward(10.0, 52.0)
    assert(math.abs(ox - 4321000.0) < 1e-6 && math.abs(oy - 3210000.0) < 1e-6)
    for (lon <- Seq(-10.25, 5.0, 24.75, 34.0); lat <- Seq(34.25, 48.0, 60.5, 70.75)) {
      assert(math.abs(areaScale(laeaEu, lon, lat) - 1.0) < 1e-5,
        s"Jacobian at ($lon, $lat) = ${areaScale(laeaEu, lon, lat)}")
      val (x, y) = laeaEu.forward(lon, lat)
      val (lon2, lat2) = laeaEu.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon, $lat) -> ($lon2, $lat2)")
    }
    // azimuthal symmetry: mirror longitudes about lon0 mirror x and share y
    val (xe, ye) = laeaEu.forward(10.0 + 7.5, 45.0)
    val (xw, yw) = laeaEu.forward(10.0 - 7.5, 45.0)
    assert(math.abs((xe - 4321000.0) + (xw - 4321000.0)) < 1e-6)
    assert(math.abs(ye - yw) < 1e-6)
  }

  test("by-number registrations resolve to the defining projections") {
    // Lambert-93: false origin at (3E, 46.5N); k = 1 on both standard
    // parallels (conformal cone)
    val l93 = CRS.fromName("EPSG:2154").asInstanceOf[CRS.LambertConformalConic]
    val (fx, fy) = l93.forward(3.0, 46.5)
    assert(math.abs(fx - 700000.0) < 1e-6 && math.abs(fy - 6600000.0) < 1e-6)
    assert(math.abs(kh(l93, 2.0, 44.0)._1 - 1.0) < 1e-6)
    assert(math.abs(kh(l93, 6.0, 49.0)._1 - 1.0) < 1e-6)
    // NZTM: central-meridian scale 0.9996 at the natural origin,
    // false origin (1600000, 10000000)
    val nztm = CRS.fromName("EPSG:2193").asInstanceOf[CRS.Tmerc]
    val (nx, ny) = nztm.forward(173.0, 0.0)
    assert(math.abs(nx - 1600000.0) < 1e-6 && math.abs(ny - 10000000.0) < 1e-6)
    val (k173, _) = kh(nztm, 173.0, -41.0)
    assert(math.abs(k173 - 0.9996) < 1e-6, k173)
    // roundtrip over NZ
    for (lon <- Seq(166.5, 174.75, 178.25); lat <- Seq(-46.5, -41.0, -34.5)) {
      val (x, y) = nztm.forward(lon, lat)
      val (lon2, lat2) = nztm.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    // ETRS89 / UTM 32N == WGS84 / UTM 32N at this precision
    val etrs = CRS.fromName("EPSG:25832"); val wgs = CRS.fromName("EPSG:32632")
    val (ex, ey) = etrs.forward(9.25, 51.5); val (wx, wy) = wgs.forward(9.25, 51.5)
    assert(ex == wx && ey == wy)
    // registry spellings + proj4 forms
    assert(CRS.fromName("epsg:6933").isInstanceOf[CylindricalEqualArea])
    assert(CRS.fromName("3035").isInstanceOf[LambertAzimuthalEqualArea])
    assert(CRS.fromName("+proj=cea +lat_ts=30 +lon_0=0") == ease2)
    assert(CRS.fromName("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000") == laeaEu)
  }

  test("LAEA matches the authalic-sphere radial law at the origin's antipodal axis") {
    // On the central meridian the projected distance from the false
    // origin equals the authalic-sphere chord 2*Rq*sin(ce/2) scaled by
    // the D-ellipse: x = 0 exactly, and north/south displacement is
    // monotone in latitude
    val ys = Seq(35.0, 45.0, 52.0, 60.0, 70.0).map { lat =>
      val (x, y) = laeaEu.forward(10.0, lat)
      assert(math.abs(x - 4321000.0) < 1e-6, s"x off-axis at lat $lat")
      y
    }
    assert(ys == ys.sorted)
  }
}
