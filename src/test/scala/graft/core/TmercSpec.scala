package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CRS.{Tmerc, Utm}

/** Generic `+proj=tmerc` (arbitrary central meridian / latitude of
  * origin / scale / false origin / ellipsoid + optional 7-param datum
  * shift) — the r15 generalization of the UTM-only Krüger path.
  *
  * Checked four independent ways: (1) parameter-for-parameter
  * equivalence with the existing UTM transform (same series, different
  * plumbing), (2) the published OSGB worked example ("A guide to
  * coordinate systems in Great Britain", Annexe C: projection-only,
  * OSGB36 geodetic in, national-grid E/N out), (3) forward/inverse
  * round-trips through the full datum + projection chain, and (4) the
  * finite-difference invariants the other projections carry
  * (conformality, k0 on the central meridian).
  */
class TmercSpec extends AnyFunSuite {

  test("Tmerc with UTM parameters reproduces Utm exactly") {
    val viaTmerc = Tmerc(lon0 = 15.0, k0 = 0.9996, falseEasting = 500000.0)
    val utm = Utm(33, south = false)
    for (lon <- Seq(9.5, 13.0, 15.0, 18.25); lat <- Seq(-40.0, 0.0, 33.75, 71.0)) {
      val (e1, n1) = viaTmerc.forward(lon, lat)
      val (e2, n2) = utm.forward(lon, lat)
      // same series, independently-computed constants -> agree to ulps
      // (micrometres), not bit-exact
      assert(math.abs(e1 - e2) < 1e-6 && math.abs(n1 - n2) < 1e-6, s"($lon,$lat)")
      val (lo1, la1) = viaTmerc.inverse(e1, n1)
      assert(math.abs(lo1 - lon) < 1e-10 && math.abs(la1 - lat) < 1e-10)
    }
  }

  test("OSGB worked example: projection-only national grid E/N (Airy 1830)") {
    // OSGB "A guide to coordinate systems in Great Britain", the
    // standard worked point: OSGB36 geodetic
    //   phi = 52 39' 27.2531" N, lam = 1 43' 4.5177" E
    // -> E 651409.903, N 313177.270 (to the mm). Datum leg disabled:
    // the input IS OSGB36 geodetic.
    val proj = Tmerc(lon0 = -2.0, lat0 = 49.0, k0 = 0.9996012717,
      falseEasting = 400000.0, falseNorthing = -100000.0,
      semiMajor = 6377563.396, flattening = 1.0 / 299.3249646)
    val lam = 1.0 + 43.0 / 60 + 4.5177 / 3600
    val phi = 52.0 + 39.0 / 60 + 27.2531 / 3600
    val (e, n) = proj.forward(lam, phi)
    assert(math.abs(e - 651409.903) < 2e-3, s"E $e")
    assert(math.abs(n - 313177.270) < 2e-3, s"N $n")
    // and back
    val (lo, la) = proj.inverse(e, n)
    assert(math.abs(lo - lam) < 1e-9 && math.abs(la - phi) < 1e-9)
  }

  test("EPSG:27700 full chain: datum magnitude, round-trips, registry names") {
    val osgb = CRS.fromName("EPSG:27700")
    // WGS84 vs OSGB36 datum shift over Britain is the famous ~100 m:
    // project London with and without the Helmert leg and compare
    val projOnly = Tmerc(lon0 = -2.0, lat0 = 49.0, k0 = 0.9996012717,
      falseEasting = 400000.0, falseNorthing = -100000.0,
      semiMajor = 6377563.396, flattening = 1.0 / 299.3249646)
    val (e1, n1) = osgb.forward(-0.1276, 51.5072)
    val (e0, n0) = projOnly.forward(-0.1276, 51.5072)
    val shift = math.hypot(e1 - e0, n1 - n0)
    assert(shift > 50 && shift < 200, s"datum shift $shift m")
    // round-trip through the full chain: bounded by the inherent 2D
    // height-dropping asymmetry (~1e-8 deg for OSGB's ~500 m shift;
    // see Tmerc.toLocalDatum), NOT by iteration convergence
    for (lon <- Seq(-7.5, -2.0, 1.5); lat <- Seq(50.0, 54.5, 60.0)) {
      val (e, n) = osgb.forward(lon, lat)
      val (lo, la) = osgb.inverse(e, n)
      assert(math.abs(lo - lon) < 3e-8 && math.abs(la - lat) < 3e-8, s"($lon,$lat)")
    }
    // proj4 spelling resolves to the same transform
    val byProj4 = CRS.fromName("+proj=tmerc +lat_0=49 +lon_0=-2 " +
      "+k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    val (e2, n2) = byProj4.forward(-0.1276, 51.5072)
    assert(math.abs(e2 - e1) < 1e-6 && math.abs(n2 - n1) < 1e-6)
  }

  test("finite-difference invariants: conformality + k0 on the central meridian") {
    val osgbProj = Tmerc(lon0 = -2.0, lat0 = 49.0, k0 = 0.9996012717,
      falseEasting = 400000.0, falseNorthing = -100000.0,
      semiMajor = 6377563.396, flattening = 1.0 / 299.3249646)
    val a = 6377563.396; val e2 = (1.0 / 299.3249646) * (2 - 1.0 / 299.3249646)
    val h = 1e-6 // degrees
    for (lon <- Seq(-5.0, -2.0, 0.5); lat <- Seq(50.0, 55.0, 59.0)) {
      val phi = math.toRadians(lat)
      // local metric: meters per degree of lon/lat on the ellipsoid
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val rho = a * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
      val mPerLon = math.toRadians(1.0) * nu * math.cos(phi)
      val mPerLat = math.toRadians(1.0) * rho
      val (e0, n0) = osgbProj.forward(lon, lat)
      val (eL, nL) = osgbProj.forward(lon + h, lat)
      val (eP, nP) = osgbProj.forward(lon, lat + h)
      val (dEdl, dNdl) = ((eL - e0) / h, (nL - n0) / h)
      val (dEdp, dNdp) = ((eP - e0) / h, (nP - n0) / h)
      // conformal: the normalized Jacobian is a scaled rotation
      assert(math.abs(dEdl / mPerLon - dNdp / mPerLat) < 1e-4,
        s"($lon,$lat): diag mismatch")
      assert(math.abs(dNdl / mPerLon + dEdp / mPerLat) < 1e-4,
        s"($lon,$lat): off-diag mismatch")
      val k = math.hypot(dEdl, dNdl) / mPerLon
      if (lon == -2.0) assert(math.abs(k - 0.9996012717) < 1e-7,
        s"scale on CM $k")
      else assert(k > 0.9996 && k < 1.0008, s"scale $k off-CM")
    }
  }

  test("tmerc proj4 parsing: ellipsoid spellings and towgs84 arity") {
    // +a/+b spelling of Airy matches +ellps=airy
    val byAb = CRS.fromName("+proj=tmerc +lon_0=-2 +lat_0=49 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +a=6377563.396 +b=6356256.909")
    val byName = Tmerc(lon0 = -2.0, lat0 = 49.0, k0 = 0.9996012717,
      falseEasting = 400000.0, falseNorthing = -100000.0,
      semiMajor = 6377563.396, flattening = 1.0 / 299.3249646)
    val (e1, n1) = byAb.forward(0.5, 52.0)
    val (e2, n2) = byName.forward(0.5, 52.0)
    // a/b-derived flattening agrees with the published 1/rf to ~1e-9
    assert(math.abs(e1 - e2) < 1e-2 && math.abs(n1 - n2) < 1e-2)
    // 3-param towgs84 (translation only) is accepted; round-trip floor
    // is the 2D height-dropping asymmetry (~|t|^2/R ~ 0.02 m here)
    val t3 = CRS.fromName("+proj=tmerc +lon_0=9 +k=1 +x_0=0 +y_0=0 " +
      "+ellps=wgs84 +towgs84=100,-200,300")
    val (lo, la) = t3.inverse(t3.forward(9.5, 48.0)._1, t3.forward(9.5, 48.0)._2)
    assert(math.abs(lo - 9.5) < 1e-6 && math.abs(la - 48.0) < 1e-6)
    intercept[IllegalArgumentException] {
      CRS.fromName("+proj=tmerc +lon_0=0 +ellps=bessel")
    }
  }
}
