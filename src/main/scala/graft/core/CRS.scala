package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coordinate reference systems + transforms, Spark-first: transforms are
  * `Column -> Column` so they compile to codegen'd Catalyst expressions
  * (no UDFs), and plain-Double variants for driver-side math.
  *
  * Reference behavior: geopyspark layer.py `reproject()` /
  * key_conversion.py (EPSG:4326 lat-lng <-> EPSG:3857 spherical web
  * mercator). Formulas are the public spherical-mercator equations.
  */
object CRS {
  val EarthRadius = 6378137.0
  /** EPSG:3857 world extent (square, +/- pi*R). */
  val WebMercatorExtent: Extent = {
    val m = math.Pi * EarthRadius
    Extent(-m, -m, m, m)
  }
  val LatLngExtent: Extent = Extent(-180, -90, 180, 90)

  // ---- driver-side (pure) ----
  def lngToMercX(lng: Double): Double = EarthRadius * math.toRadians(lng)
  def latToMercY(lat: Double): Double =
    EarthRadius * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
  def mercXToLng(x: Double): Double = math.toDegrees(x / EarthRadius)
  def mercYToLat(y: Double): Double =
    math.toDegrees(2 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2)

  // ---- Column (codegen) variants ----
  def lngToMercXCol(lng: Column): Column = radians(lng) * lit(EarthRadius)
  def latToMercYCol(lat: Column): Column =
    log(tan(lit(math.Pi / 4) + radians(lat) / 2)) * lit(EarthRadius)

  /** TMS/XYZ tile coordinates at `zoom` for a lon/lat point (y grows
    * south, as in web tiling). Reference: key_conversion.py. */
  def tmsTileCol(lng: Column, lat: Column, zoom: Int): (Column, Column) = {
    val n  = lit((1L << zoom).toDouble)
    val tx = floor((lng + 180.0) / 360.0 * n)
    val ty = floor((lit(1.0) - log(tan(radians(lat)) + lit(1.0) / cos(radians(lat))) / lit(math.Pi)) / 2.0 * n)
    (tx.cast("long"), ty.cast("long"))
  }

  // ------------------------------------------------------------------
  // Arbitrary-CRS transforms (reference layer.py:876/:1668 reproject
  // accepts any target_crs). A Transform maps lon/lat degrees <-> the
  // CRS's planar coordinates; instances ride executor closures, so
  // every method is pure math over Doubles.
  // ------------------------------------------------------------------

  trait Transform extends Serializable {
    /** lon/lat degrees -> planar (x, y). */
    def forward(lon: Double, lat: Double): (Double, Double)
    /** planar (x, y) -> lon/lat degrees. Every GEOGRAPHIC projection
      * returns longitude normalized into [-180, 180); [[LatLng]] is
      * exempt — it is a planar identity whose "degrees" are often
      * plain grid coordinates (unit layouts span 0..256), and wrapping
      * those would corrupt them. */
    def inverse(x: Double, y: Double): (Double, Double)
  }

  /** Normalize a longitude into [-180, 180) — every inverse MUST
    * return normalized longitudes: reprojectTiled bounds-checks them
    * against the source extent, and an un-wrapped lon0 + dl (e.g.
    * EPSG:3413's lon0 = -45 spans (-225, 135]) would silently NoData
    * a 45-degree wedge of a global source. */
  def normLon(lon: Double): Double =
    lon - 360.0 * math.floor((lon + 180.0) / 360.0)

  /** EPSG:4326 treated as a planar CRS in degree units. */
  case object LatLng extends Transform {
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** EPSG:3857 spherical web mercator (same formulas as the Column
    * variants above). */
  case object WebMercator extends Transform {
    def forward(lon: Double, lat: Double): (Double, Double) =
      (lngToMercX(lon), latToMercY(lat))
    def inverse(x: Double, y: Double): (Double, Double) =
      (normLon(mercXToLng(x)), mercYToLat(y))
  }

  /** CRS registry by the names the reference accepts (layer.py:876
    * takes EPSG ints, "EPSG:n" strings, or proj4 strings): EPSG:4326,
    * EPSG:3857, the UTM range EPSG:32601-32660 (north) / 32701-32760
    * (south), the polar grids EPSG:3413 / 3031 / 5041 / 5042, the
    * CONUS Albers grid EPSG:5070, and the proj4 forms
    * "+proj=utm/stere/lcc/aea/sinu/longlat/merc" with their standard
    * parameters (+proj=sinu honors +R / +a=+b spheres — the MODIS
    * grid's form). */
  def fromName(crs: String): Transform = {
    val s = crs.trim.toLowerCase
    val epsg = "(?:epsg:)?(\\d+)".r
    def p4opt(name: String, p: String): Option[Double] =
      ("\\+" + name + "=(-?[0-9.]+)").r.findFirstMatchIn(p).map(_.group(1).toDouble)
    def p4(name: String, p: String): Double = p4opt(name, p).getOrElse(
      throw new IllegalArgumentException(s"missing +$name in '$crs'"))
    def p4or(name: String, p: String, default: Double): Double =
      p4opt(name, p).getOrElse(default)
    s match {
      case epsg(code) => code.toInt match {
        case 4326 => LatLng
        case 3857 => WebMercator
        case c if c >= 32601 && c <= 32660 => Utm(c - 32600, south = false)
        case c if c >= 32701 && c <= 32760 => Utm(c - 32700, south = true)
        // NSIDC Sea Ice Polar Stereographic North / Antarctic
        case 3413 => PolarStereographic(-45.0, 70.0, north = true)
        case 3976 => PolarStereographic(0.0, -70.0, north = false)
        case 3031 => PolarStereographic(0.0, -71.0, north = false)
        // Universal Polar Stereographic (k0 form)
        case 5041 => PolarStereographic(0.0, 90.0, north = true,
          falseEasting = 2000000.0, falseNorthing = 2000000.0, k0 = Some(0.994))
        case 5042 => PolarStereographic(0.0, -90.0, north = false,
          falseEasting = 2000000.0, falseNorthing = 2000000.0, k0 = Some(0.994))
        // NAD83 CONUS Albers, on the WGS84 ellipsoid (GRS80 and WGS84
        // flattenings differ in the 11th digit — sub-0.1 mm at CONUS
        // latitudes)
        case 5070 => AlbersEqualArea(-96.0, 23.0, 29.5, 45.5)
        // OSGB36 / British National Grid (generic tmerc + Airy 1830 +
        // the published small-angle Helmert)
        case 27700 => Osgb36
        // RGF93 / Lambert-93, the French national grid (lcc on GRS80 ~
        // WGS84 — flattenings differ in the 11th digit)
        case 2154 => LambertConformalConic(3.0, 46.5, 49.0, 44.0,
          700000.0, 6600000.0)
        // NZGD2000 / New Zealand Transverse Mercator 2000
        case 2193 => Tmerc(173.0, 0.0, 0.9996, 1600000.0, 10000000.0,
          6378137.0, 1.0 / 298.257222101)
        // ETRS89 / UTM zones 28N-38N (the European mapping family;
        // ETRS89 ~ WGS84 at this precision)
        case c if c >= 25828 && c <= 25838 => Utm(c - 25800, south = false)
        // ETRS89-extended / LAEA Europe — the pan-European grid
        case 3035 => LambertAzimuthalEqualArea(10.0, 52.0, 4321000.0, 3210000.0)
        // EASE-Grid 2.0 Global (cylindrical equal-area, lat_ts 30)
        case 6933 => CylindricalEqualArea(0.0, 30.0)
        case c => throw new IllegalArgumentException(s"unsupported EPSG:$c")
      }
      case p if p.startsWith("+proj=") =>
        // match the proj NAME as a whole token: prefix tests would
        // swallow distinct projections (+proj=sterea is the oblique
        // Gauss-Schreiber stereographic, +proj=lcca the LCC
        // alternative — entirely different math)
        val proj = "\\+proj=([a-z_0-9]+)".r.findFirstMatchIn(p).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(s"unparseable '$crs'"))
        proj match {
          case "utm" =>
            val zone = "\\+zone=(\\d+)".r.findFirstMatchIn(p)
              .map(_.group(1).toInt)
              .getOrElse(throw new IllegalArgumentException(s"missing +zone in '$crs'"))
            Utm(zone, south = p.contains("+south"))
          case "stere" =>
            val lat0 = p4("lat_0", p)
            require(math.abs(lat0) == 90.0,
              s"only polar aspects supported (+lat_0=+-90), got $lat0")
            val north = lat0 > 0
            // proj semantics: +lat_ts wins; else +k (default 1.0 —
            // without this, latTs = the pole makes scaleC =
            // m(90)/t(90) = Inf and every forward() silently returns
            // Infinity)
            val k0 = "\\+k_?0?=(-?[0-9.]+)".r.findFirstMatchIn(p).map(_.group(1).toDouble)
            PolarStereographic(p4or("lon_0", p, 0.0),
              p4or("lat_ts", p, lat0), north,
              p4or("x_0", p, 0.0), p4or("y_0", p, 0.0),
              if (p.contains("+lat_ts")) None else Some(k0.getOrElse(1.0)))
          case "lcc" =>
            val lat1 = p4("lat_1", p)
            LambertConformalConic(p4or("lon_0", p, 0.0), p4("lat_0", p),
              lat1, p4or("lat_2", p, lat1), p4or("x_0", p, 0.0), p4or("y_0", p, 0.0))
          case "aea" =>
            val lat1 = p4("lat_1", p)
            AlbersEqualArea(p4or("lon_0", p, 0.0), p4or("lat_0", p, 0.0),
              lat1, p4or("lat_2", p, lat1), p4or("x_0", p, 0.0), p4or("y_0", p, 0.0))
          case "sinu" =>
            // +R, or +a=+b (the MODIS sphere's usual spelling), selects
            // the spherical form; plain +proj=sinu is ellipsoidal WGS84.
            // (the whole string is lowercased on entry, so +R arrives
            // as +r)
            val r = p4opt("r", p).orElse((p4opt("a", p), p4opt("b", p)) match {
              case (Some(aa), Some(bb)) if aa == bb => Some(aa)
              case _ => None
            })
            Sinusoidal(p4or("lon_0", p, 0.0), p4or("x_0", p, 0.0),
              p4or("y_0", p, 0.0), r)
          case "tmerc" =>
            // generic transverse mercator: +lon_0 +lat_0 +k/+k_0 +x_0
            // +y_0, ellipsoid via +ellps=airy|wgs84|grs80 or +a/+b(+rf),
            // optional +towgs84=tx,ty,tz[,rx,ry,rz,ds] (proj gives the
            // LOCAL->WGS84 direction; we store its reverse)
            val (aa, ff) = "\\+ellps=([a-z0-9]+)".r.findFirstMatchIn(p).map(_.group(1)) match {
              case Some("airy")  => (6377563.396, 1.0 / 299.3249646)
              case Some("wgs84") => (TransverseMercator.SemiMajor, TransverseMercator.Flattening)
              case Some("grs80") => (6378137.0, 1.0 / 298.257222101)
              case Some(other) => throw new IllegalArgumentException(s"unsupported +ellps=$other")
              case None =>
                (p4opt("a", p), p4opt("b", p), p4opt("rf", p)) match {
                  case (Some(av), Some(bv), _) => (av, (av - bv) / av)
                  case (Some(av), _, Some(rf)) => (av, 1.0 / rf)
                  case (None, _, _) => (TransverseMercator.SemiMajor, TransverseMercator.Flattening)
                  case _ => throw new IllegalArgumentException(s"+a without +b/+rf in '$crs'")
                }
            }
            val tw = "\\+towgs84=([-0-9.,]+)".r.findFirstMatchIn(p).map(_.group(1))
              .map { list =>
                val v = list.split(",").map(_.toDouble)
                require(v.length == 3 || v.length == 7,
                  s"+towgs84 needs 3 or 7 params, got ${v.length}")
                val w = if (v.length == 3) v ++ Array(0.0, 0.0, 0.0, 0.0) else v
                // reverse direction: proj's params map LOCAL -> WGS84
                w.map(x => -x).toSeq
              }
            val k0v = "\\+k_?0?=(-?[0-9.]+)".r.findFirstMatchIn(p)
              .map(_.group(1).toDouble).getOrElse(1.0)
            Tmerc(p4or("lon_0", p, 0.0), p4or("lat_0", p, 0.0), k0v,
              p4or("x_0", p, 0.0), p4or("y_0", p, 0.0), aa, ff, tw)
          case "longlat" => LatLng
          case "merc"    => WebMercator
          case "cea" =>
            CylindricalEqualArea(p4or("lon_0", p, 0.0), p4or("lat_ts", p, 0.0),
              p4or("x_0", p, 0.0), p4or("y_0", p, 0.0))
          case "laea" =>
            LambertAzimuthalEqualArea(p4or("lon_0", p, 0.0), p4or("lat_0", p, 0.0),
              p4or("x_0", p, 0.0), p4or("y_0", p, 0.0))
          case other => throw new IllegalArgumentException(s"unsupported +proj=$other")
        }
      case other => throw new IllegalArgumentException(s"unsupported CRS '$other'")
    }
  }

  /** UTM zone on WGS84 — ellipsoidal Transverse Mercator via the
    * Krüger flattening series in n = f/(2-f) (Karney, "Transverse
    * Mercator with an accuracy of a few nanometers", J. Geodesy 2011;
    * the same 4th-order series proj/GeographicLib evaluate). At
    * 4th order the truncation error is micrometres inside a zone —
    * far below the mm rounding the oracle pins. */
  final case class Utm(zone: Int, south: Boolean) extends Transform {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone out of 1..60")
    import TransverseMercator._
    val lon0: Double = -183.0 + 6.0 * zone
    val falseNorthing: Double = if (south) 10000000.0 else 0.0

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(lon - lon0)
      val sphi = math.sin(phi)
      // conformal-latitude tangent: t = sinh(asinh(tan phi) - e atanh(e sin phi))
      val psi = asinh(math.tan(phi)) - Ecc * atanh(Ecc * sphi)
      val t = math.sinh(psi)
      val xip = math.atan2(t, math.cos(dl))
      val etap = asinh(math.sin(dl) / math.sqrt(t * t + math.cos(dl) * math.cos(dl)))
      var xi = xip; var eta = etap
      var j = 1
      while (j <= 4) {
        xi += Alpha(j - 1) * math.sin(2 * j * xip) * math.cosh(2 * j * etap)
        eta += Alpha(j - 1) * math.cos(2 * j * xip) * math.sinh(2 * j * etap)
        j += 1
      }
      (FalseEasting + K0 * RectA * eta, falseNorthing + K0 * RectA * xi)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - falseNorthing) / (K0 * RectA)
      val eta = (x - FalseEasting) / (K0 * RectA)
      var xip = xi; var etap = eta
      var j = 1
      while (j <= 4) {
        xip -= Beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etap -= Beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xip) / math.cosh(etap)) // conformal latitude
      var phi = chi
      j = 1
      while (j <= 4) {
        phi += Delta(j - 1) * math.sin(2 * j * chi)
        j += 1
      }
      val dl = math.atan2(math.sinh(etap), math.cos(xip))
      (normLon(lon0 + math.toDegrees(dl)), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Polar Stereographic on WGS84 — Snyder, "Map
    * Projections — A Working Manual" (USGS PP 1395) §21 / EPSG method
    * 9829 (variant B: true-scale latitude). Covers the polar grids
    * real data ships in: EPSG:3413 (NSIDC Arctic, latTs 70N, lon0
    * -45), EPSG:3031 (Antarctic, latTs -71S, lon0 0), and UPS
    * (EPSG:5041/5042) via the k0 = 0.994 form restated as its
    * equivalent true-scale latitude. `north` selects the aspect;
    * latTs is given for the SAME hemisphere (positive north,
    * negative south). */
  final case class PolarStereographic(lon0: Double, latTs: Double, north: Boolean,
                                      falseEasting: Double = 0.0,
                                      falseNorthing: Double = 0.0,
                                      k0: Option[Double] = None) extends Transform {
    import TransverseMercator.{Ecc => e, SemiMajor => a}
    // conformal-latitude half-angle factor t(phi); phi in RADIANS,
    // already mirrored into the north aspect
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    // rho = a * C * t(phi). Variant B (true-scale latitude): C = m(ts)/t(ts).
    // Variant A (k0 at the pole, UPS): C = 2 k0 / sqrt((1+e)^(1+e) (1-e)^(1-e))
    private val scaleC: Double = k0 match {
      case Some(k) => 2 * k / math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      case None =>
        val phiTs = math.toRadians(if (north) latTs else -latTs)
        val mTs = math.cos(phiTs) / math.sqrt(1 - e * e * math.sin(phiTs) * math.sin(phiTs))
        mTs / tOf(phiTs)
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(if (north) lat else -lat)
      val dl = math.toRadians(if (north) lon - lon0 else -(lon - lon0))
      val rho = a * scaleC * tOf(phi)
      val x = rho * math.sin(dl)
      val y = -rho * math.cos(dl)
      if (north) (falseEasting + x, falseNorthing + y)
      else (falseEasting - x, falseNorthing - y) // south aspect mirrors both axes
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx0 = x - falseEasting; val dy0 = y - falseNorthing
      val (dx, dy) = if (north) (dx0, dy0) else (-dx0, -dy0)
      val rho = math.sqrt(dx * dx + dy * dy)
      val t = rho / (a * scaleC)
      // Snyder eq. 7-9: fixed-point for phi, converges in a handful of
      // rounds (quadratic near the pole)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var k = 0
      while (k < 8) {
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
        k += 1
      }
      val dl = if (rho == 0) 0.0 else math.atan2(dx, -dy)
      val lon = if (north) lon0 + math.toDegrees(dl) else lon0 - math.toDegrees(dl)
      (normLon(lon), math.toDegrees(if (north) phi else -phi))
    }

    /** The forward projection as named SQL formula steps over lon/lat
      * columns — the same one-text-two-engines pattern as
      * [[TransverseMercator.forwardSqlSteps]]. North aspect only (the
      * oracle points live in the Arctic). */
    def forwardSqlSteps: (Seq[(String, String)], String, String) = {
      require(north, "SQL steps are emitted for the north aspect only")
      val aC = (a * scaleC).toString
      val eS = e.toString
      val steps = Seq(
        "phi" -> "radians(lat)",
        "dl" -> s"radians(lon - ($lon0))",
        "t" -> (s"tan(pi() / 4 - phi / 2) / " +
          s"power((1 - $eS * sin(phi)) / (1 + $eS * sin(phi)), $eS / 2)"),
        "rho" -> s"$aC * t")
      (steps, s"$falseEasting + rho * sin(dl)", s"$falseNorthing - rho * cos(dl)")
    }
  }

  /** Lambert Conformal Conic, 2 standard parallels, on WGS84 —
    * Snyder §15 / EPSG method 9802: the projection every US
    * state-plane zone and most national grids use. Parallels in
    * degrees; the cone constant n, F, and rho0 are the published
    * closed forms. */
  final case class LambertConformalConic(lon0: Double, lat0: Double,
                                         lat1: Double, lat2: Double,
                                         falseEasting: Double = 0.0,
                                         falseNorthing: Double = 0.0) extends Transform {
    import TransverseMercator.{Ecc => e, SemiMajor => a}
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e * e * math.sin(phi) * math.sin(phi))
    private val p0 = math.toRadians(lat0); private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    private val n =
      if (math.abs(lat1 - lat2) < 1e-12) math.sin(p1)
      else (math.log(mOf(p1)) - math.log(mOf(p2))) / (math.log(tOf(p1)) - math.log(tOf(p2)))
    private val f = mOf(p1) / (n * math.pow(tOf(p1), n))
    private val rho0 = a * f * math.pow(tOf(p0), n)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val rho = a * f * math.pow(tOf(phi), n)
      // wrap lon - lon0 into [-180, 180] BEFORE scaling by the cone
      // constant: unlike TM/polar, whose dl enters only 2-pi-periodic
      // sin/cos, LCC multiplies by non-integer n first — an Aleutian
      // cone (lon0 = -154) fed a normalized lon of 179 would otherwise
      // land on the wrong azimuth of the cone
      val th = n * math.toRadians(normLon(lon - lon0))
      (falseEasting + rho * math.sin(th), falseNorthing + rho0 - rho * math.cos(th))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseEasting; val dy = rho0 - (y - falseNorthing)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val th = math.atan2(sgn * dx, sgn * dy)
      val t = math.pow(rho / (a * f), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var k = 0
      while (k < 8) {
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
        k += 1
      }
      (normLon(lon0 + math.toDegrees(th / n)), math.toDegrees(phi))
    }

    /** The forward projection as named SQL formula steps — the
      * one-text-two-engines oracle pattern of
      * [[TransverseMercator.forwardSqlSteps]]. Callers keep |lon -
      * lon0| < 180 (the SQL chain does not restate normLon). */
    def forwardSqlSteps: (Seq[(String, String)], String, String) = {
      val eS = e.toString
      val steps = Seq(
        "phi" -> "radians(lat)",
        "tphi" -> (s"tan(pi() / 4 - phi / 2) / " +
          s"power((1 - $eS * sin(phi)) / (1 + $eS * sin(phi)), $eS / 2)"),
        // seed with CAST AS DOUBLE: a and f are both numeric literals,
        // and DuckDB parses those as DECIMAL — a DECIMAL x DECIMAL
        // product at these magnitudes overflows DECIMAL(18)
        "rho" -> s"CAST($a AS DOUBLE) * $f * power(tphi, $n)",
        "th" -> s"$n * radians(lon - ($lon0))")
      (steps, s"$falseEasting + rho * sin(th)",
        s"$falseNorthing + $rho0 - rho * cos(th)")
    }
  }

  /** Albers Equal-Area Conic, 2 standard parallels, on WGS84 —
    * Snyder §14 / EPSG method 9822: the standard US continental-
    * analysis CRS (NLCD, LANDFIRE, most CONUS mosaics ship as
    * EPSG:5070). Constants q (authalic function), m, the cone
    * constant n, C, and rho0 are the published closed forms; the
    * inverse solves the authalic latitude with Snyder eq. 3-16's
    * fixed point. */
  final case class AlbersEqualArea(lon0: Double, lat0: Double,
                                   lat1: Double, lat2: Double,
                                   falseEasting: Double = 0.0,
                                   falseNorthing: Double = 0.0) extends Transform {
    import TransverseMercator.{Ecc => e, SemiMajor => a}
    private val e2 = e * e
    // Snyder eq. 3-12: q(phi), the authalic-latitude kernel
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        math.log((1 - e * s) / (1 + e * s)) / (2 * e))
    }
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val p0 = math.toRadians(lat0); private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    private val n =
      if (math.abs(lat1 - lat2) < 1e-12) math.sin(p1)
      else (mOf(p1) * mOf(p1) - mOf(p2) * mOf(p2)) / (qOf(p2) - qOf(p1))
    private val bigC = mOf(p1) * mOf(p1) + n * qOf(p1)
    private val rho0 = a * math.sqrt(bigC - n * qOf(p0)) / n

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val rho = a * math.sqrt(bigC - n * qOf(math.toRadians(lat))) / n
      // same pre-wrap rule as LCC: theta scales by the non-integer
      // cone constant BEFORE sin/cos, so wrap dl first
      val th = n * math.toRadians(normLon(lon - lon0))
      (falseEasting + rho * math.sin(th), falseNorthing + rho0 - rho * math.cos(th))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseEasting; val dy = rho0 - (y - falseNorthing)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val th = math.atan2(sgn * dx, sgn * dy)
      val q = (bigC - (rho * n / a) * (rho * n / a)) / n
      // Snyder eq. 3-16 fixed point from the spherical seed; quadratic
      // convergence, clamped for the q ~ q_pole edge
      var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
      var k = 0
      while (k < 10) {
        val s = math.sin(phi)
        val om = 1 - e2 * s * s
        phi += om * om / (2 * math.cos(phi)) *
          (q / (1 - e2) - s / om + math.log((1 - e * s) / (1 + e * s)) / (2 * e))
        k += 1
      }
      (normLon(lon0 + math.toDegrees(th / n)), math.toDegrees(phi))
    }

    /** The forward projection as named SQL formula steps — the
      * one-text-two-engines oracle pattern of
      * [[TransverseMercator.forwardSqlSteps]]. Callers keep |lon -
      * lon0| < 180 (the SQL chain does not restate normLon). */
    def forwardSqlSteps: (Seq[(String, String)], String, String) = {
      val eS = e.toString
      val steps = Seq(
        "phi" -> "radians(lat)",
        "sphi" -> "sin(phi)",
        "q" -> (s"(1 - $e2) * (sphi / (1 - $e2 * sphi * sphi) - " +
          s"ln((1 - $eS * sphi) / (1 + $eS * sphi)) / (2 * $eS))"),
        "rho" -> s"$a * sqrt($bigC - $n * q) / $n",
        "th" -> s"$n * radians(lon - ($lon0))")
      (steps, s"$falseEasting + rho * sin(th)",
        s"$falseNorthing + $rho0 - rho * cos(th)")
    }
  }

  /** Cylindrical Equal-Area, ellipsoidal — Snyder §10 / EPSG method
    * 9835: the EASE-Grid 2.0 family every modern passive-microwave /
    * soil-moisture product ships in (EPSG:6933 global, lat_ts 30).
    * x = a k0 dl, y = a q / (2 k0) with q the authalic kernel
    * (Snyder eq. 3-12, shared with [[AlbersEqualArea]]) and
    * k0 = cos(lat_ts)/sqrt(1 - e^2 sin^2 lat_ts); the inverse solves
    * the authalic latitude with the same eq. 3-16 fixed point. */
  final case class CylindricalEqualArea(lon0: Double = 0.0, latTs: Double = 0.0,
                                        falseEasting: Double = 0.0,
                                        falseNorthing: Double = 0.0) extends Transform {
    import TransverseMercator.{Ecc => e, SemiMajor => a}
    private val e2 = e * e
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        math.log((1 - e * s) / (1 + e * s)) / (2 * e))
    }
    private val ts = math.toRadians(latTs)
    private val k0 = math.cos(ts) / math.sqrt(1 - e2 * math.sin(ts) * math.sin(ts))

    def forward(lon: Double, lat: Double): (Double, Double) =
      (falseEasting + a * k0 * math.toRadians(normLon(lon - lon0)),
        falseNorthing + a * qOf(math.toRadians(lat)) / (2 * k0))

    def inverse(x: Double, y: Double): (Double, Double) = {
      val q = 2 * k0 * (y - falseNorthing) / a
      // Snyder eq. 3-16 fixed point (the AlbersEqualArea inverse)
      var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
      var k = 0
      while (k < 10) {
        val s = math.sin(phi)
        val om = 1 - e2 * s * s
        phi += om * om / (2 * math.cos(phi)) *
          (q / (1 - e2) - s / om + math.log((1 - e * s) / (1 + e * s)) / (2 * e))
        k += 1
      }
      (normLon(lon0 + math.toDegrees((x - falseEasting) / (a * k0))),
        math.toDegrees(phi))
    }

    /** Forward as named SQL steps — the one-text-two-engines oracle
      * pattern. Callers keep |lon - lon0| < 180. */
    def forwardSqlSteps: (Seq[(String, String)], String, String) = {
      val eS = e.toString
      val steps = Seq(
        "phi" -> "radians(lat)",
        "sphi" -> "sin(phi)",
        "q" -> (s"(1 - $e2) * (sphi / (1 - $e2 * sphi * sphi) - " +
          s"ln((1 - $eS * sphi) / (1 + $eS * sphi)) / (2 * $eS))"))
      // CAST seeds the DECIMAL-literal chains (a x k0 would overflow
      // DECIMAL(18) in DuckDB)
      (steps, s"$falseEasting + CAST($a AS DOUBLE) * $k0 * radians(lon - ($lon0))",
        s"$falseNorthing + CAST($a AS DOUBLE) * q / (2 * $k0)")
    }
  }

  /** Lambert Azimuthal Equal-Area, ellipsoidal — Snyder §24 / EPSG
    * method 9820: the pan-European statistical grid (EPSG:3035,
    * ETRS89-extended / LAEA Europe, lat0 52N lon0 10E). Authalic
    * latitude beta via the shared q kernel; the oblique-aspect B/D
    * construction is Snyder eq. 24-19..24-21; the inverse solves phi
    * with the same eq. 3-16 fixed point. */
  final case class LambertAzimuthalEqualArea(lon0: Double, lat0: Double,
                                             falseEasting: Double = 0.0,
                                             falseNorthing: Double = 0.0) extends Transform {
    import TransverseMercator.{Ecc => e, SemiMajor => a}
    private val e2 = e * e
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        math.log((1 - e * s) / (1 + e * s)) / (2 * e))
    }
    private val p0 = math.toRadians(lat0)
    private val qp = qOf(math.Pi / 2)
    private val q0 = qOf(p0)
    private val beta0 = math.asin(math.max(-1.0, math.min(1.0, q0 / qp)))
    private val rq = a * math.sqrt(qp / 2)
    private val m0 = math.cos(p0) / math.sqrt(1 - e2 * math.sin(p0) * math.sin(p0))
    private val bigD = a * m0 / (rq * math.cos(beta0))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val beta = math.asin(math.max(-1.0, math.min(1.0, qOf(math.toRadians(lat)) / qp)))
      val dl = math.toRadians(normLon(lon - lon0))
      val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
        math.cos(beta0) * math.cos(beta) * math.cos(dl)))
      (falseEasting + b * bigD * math.cos(beta) * math.sin(dl),
        falseNorthing + (b / bigD) * (math.cos(beta0) * math.sin(beta) -
          math.sin(beta0) * math.cos(beta) * math.cos(dl)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - falseEasting) / bigD
      val dy = (y - falseNorthing) * bigD
      val rho = math.hypot(dx, dy)
      if (rho < 1e-12) return (normLon(lon0), lat0)
      val ce = 2 * math.asin(math.max(-1.0, math.min(1.0, rho / (2 * rq))))
      val q = qp * (math.cos(ce) * math.sin(beta0) +
        dy * math.sin(ce) * math.cos(beta0) / rho)
      var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
      var k = 0
      while (k < 10) {
        val s = math.sin(phi)
        val om = 1 - e2 * s * s
        phi += om * om / (2 * math.cos(phi)) *
          (q / (1 - e2) - s / om + math.log((1 - e * s) / (1 + e * s)) / (2 * e))
        k += 1
      }
      val lam = math.atan2(dx * math.sin(ce),
        rho * math.cos(beta0) * math.cos(ce) - dy * math.sin(beta0) * math.sin(ce))
      (normLon(lon0 + math.toDegrees(lam)), math.toDegrees(phi))
    }

    /** Forward as named SQL steps — the one-text-two-engines oracle
      * pattern. Callers keep |lon - lon0| < 180 and stay off the
      * antipode (the b denominator's singular point). */
    def forwardSqlSteps: (Seq[(String, String)], String, String) = {
      val eS = e.toString
      val sb0 = math.sin(beta0); val cb0 = math.cos(beta0)
      val steps = Seq(
        "phi" -> "radians(lat)",
        "sphi" -> "sin(phi)",
        "q" -> (s"(1 - $e2) * (sphi / (1 - $e2 * sphi * sphi) - " +
          s"ln((1 - $eS * sphi) / (1 + $eS * sphi)) / (2 * $eS))"),
        "beta" -> s"asin(least(1.0, greatest(-1.0, q / $qp)))",
        "dl" -> s"radians(lon - ($lon0))",
        "bb" -> (s"$rq * sqrt(2 / (1 + $sb0 * sin(beta) + " +
          s"$cb0 * cos(beta) * cos(dl)))"))
      (steps, s"$falseEasting + bb * $bigD * cos(beta) * sin(dl)",
        s"$falseNorthing + (bb / $bigD) * ($cb0 * sin(beta) - $sb0 * cos(beta) * cos(dl))")
    }
  }

  /** Sinusoidal (equal-area pseudocylindrical) — Snyder §30: the MODIS
    * land-product grid. Ellipsoidal WGS84 form by default (x =
    * a cos(phi) dl / sqrt(1 - e^2 sin^2 phi), y = meridional arc via
    * the Helmert rectifying-latitude series); `sphereRadius` selects
    * the spherical form (x = R dl cos phi, y = R phi) that the MODIS
    * grid ships as (+proj=sinu +R=6371007.181). */
  final case class Sinusoidal(lon0: Double = 0.0,
                              falseEasting: Double = 0.0,
                              falseNorthing: Double = 0.0,
                              sphereRadius: Option[Double] = None) extends Transform {
    import TransverseMercator.{Ecc => e, SemiMajor => a, RectA, N3}
    private val e2 = e * e
    // meridional arc M(phi) = RectA * mu(phi); mu's forward/inverse
    // series in the third flattening n (Helmert 1880; the same public
    // series family as TransverseMercator.Delta)
    private val n2 = N3 * N3; private val n3 = n2 * N3; private val n4 = n3 * N3
    private val MuC = Array(-3 * N3 / 2 + 9 * n3 / 16, 15 * n2 / 16 - 15 * n4 / 32,
      -35 * n3 / 48, 315 * n4 / 512)
    private val MuD = Array(3 * N3 / 2 - 27 * n3 / 32, 21 * n2 / 16 - 55 * n4 / 32,
      151 * n3 / 96, 1097 * n4 / 512)
    private def mu(phi: Double): Double =
      phi + (1 to 4).map(j => MuC(j - 1) * math.sin(2 * j * phi)).sum
    private def phiOfMu(m: Double): Double =
      m + (1 to 4).map(j => MuD(j - 1) * math.sin(2 * j * m)).sum

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val dl = math.toRadians(normLon(lon - lon0))
      val phi = math.toRadians(lat)
      sphereRadius match {
        case Some(r) =>
          (falseEasting + r * dl * math.cos(phi), falseNorthing + r * phi)
        case None =>
          val s = math.sin(phi)
          (falseEasting + a * math.cos(phi) * dl / math.sqrt(1 - e2 * s * s),
            falseNorthing + RectA * mu(phi))
      }
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseEasting; val dy = y - falseNorthing
      val phi = sphereRadius match {
        case Some(r) => dy / r
        case None    => phiOfMu(dy / RectA)
      }
      val cphi = math.cos(phi)
      val lon =
        if (cphi == 0) lon0
        else sphereRadius match {
          case Some(r) => lon0 + math.toDegrees(dx / (r * cphi))
          case None =>
            val s = math.sin(phi)
            lon0 + math.toDegrees(dx * math.sqrt(1 - e2 * s * s) / (a * cphi))
        }
      (normLon(lon), math.toDegrees(phi))
    }

    /** Forward as shared SQL steps (one-text-two-engines); callers
      * keep |lon - lon0| < 180. */
    def forwardSqlSteps: (Seq[(String, String)], String, String) = {
      val base = Seq("phi" -> "radians(lat)", "dl" -> s"radians(lon - ($lon0))")
      sphereRadius match {
        case Some(r) =>
          (base, s"$falseEasting + $r * dl * cos(phi)", s"$falseNorthing + $r * phi")
        case None =>
          val steps = base ++ Seq(
            "sphi" -> "sin(phi)",
            "mu" -> ((1 to 4).map(j => s"${MuC(j - 1)} * sin(${2 * j} * phi)")
              .mkString("phi + ", " + ", "")))
          (steps, s"$falseEasting + $a * cos(phi) * dl / sqrt(1 - $e2 * sphi * sphi)",
            s"$falseNorthing + $RectA * mu")
      }
    }
  }

  /** Krüger series coefficients for an ARBITRARY ellipsoid (a, f) —
    * the same public 4th-order series as [[TransverseMercator]]
    * (Karney 2011 eq. 35/36), parameterized so national tmerc grids on
    * non-WGS84 ellipsoids (OSGB's Airy 1830, etc.) reuse the math. */
  final class KrugerSeries(val a: Double, val f: Double) extends Serializable {
    val n3: Double = f / (2.0 - f)
    val ecc: Double = math.sqrt(f * (2.0 - f))
    val e2: Double = f * (2.0 - f)
    private val n2 = n3 * n3; private val nn3 = n2 * n3; private val n4 = nn3 * n3
    val rectA: Double = a / (1 + n3) * (1 + n2 / 4 + n4 / 64)
    val alpha: Array[Double] = Array(
      n3 / 2 - 2 * n2 / 3 + 5 * nn3 / 16 + 41 * n4 / 180,
      13 * n2 / 48 - 3 * nn3 / 5 + 557 * n4 / 1440,
      61 * nn3 / 240 - 103 * n4 / 140,
      49561 * n4 / 161280)
    val beta: Array[Double] = Array(
      n3 / 2 - 2 * n2 / 3 + 37 * nn3 / 96 - n4 / 360,
      n2 / 48 + nn3 / 15 - 437 * n4 / 1440,
      17 * nn3 / 480 - 37 * n4 / 840,
      4397 * n4 / 161280)
    val delta: Array[Double] = Array(
      2 * n3 - 2 * n2 / 3 - 2 * nn3 + 116 * n4 / 45,
      7 * n2 / 3 - 8 * nn3 / 5 - 227 * n4 / 45,
      56 * nn3 / 15 - 136 * n4 / 35,
      4279 * n4 / 630)
    /** rectifying-latitude (meridional arc) series: M(phi) = rectA *
      * mu(phi) (Helmert 1880 — the series family Sinusoidal uses). */
    private val muC = Array(-3 * n3 / 2 + 9 * nn3 / 16, 15 * n2 / 16 - 15 * n4 / 32,
      -35 * nn3 / 48, 315 * n4 / 512)
    def mu(phi: Double): Double =
      phi + (1 to 4).map(j => muC(j - 1) * math.sin(2 * j * phi)).sum
  }

  /** Generic ellipsoidal Transverse Mercator (`+proj=tmerc`) with
    * arbitrary central meridian / latitude of origin / scale / false
    * origin / ellipsoid, over the Krüger series — the parameter family
    * proj accepts (lon_0, lat_0, k, x_0, y_0, ellps) plus an optional
    * 7-parameter Helmert datum shift from WGS84 (`+towgs84` reversed:
    * tx ty tz in metres, rx ry rz in arc-seconds, ds in ppm, POSITION
    * VECTOR convention, applied WGS84 -> local datum on forward()).
    * EPSG:27700 (OSGB36 / British National Grid, Airy 1830) registers
    * through this with the published OSTN-free Helmert (±3 m class).
    *
    * Reference surface: layer.py:876 accepts any proj4 target_crs;
    * math is Snyder §8 via Karney 2011 + the OSGB "A guide to
    * coordinate systems in Great Britain" datum equations. */
  final case class Tmerc(lon0: Double, lat0: Double = 0.0, k0: Double = 1.0,
                         falseEasting: Double = 0.0, falseNorthing: Double = 0.0,
                         semiMajor: Double = TransverseMercator.SemiMajor,
                         flattening: Double = TransverseMercator.Flattening,
                         towgs84: Option[Seq[Double]] = None) extends Transform {
    import TransverseMercator.{asinh, atanh}
    private val ks = new KrugerSeries(semiMajor, flattening)
    /** northing offset: y_0 - k0 * M(lat_0) (UTM's lat_0 = 0 makes it y_0) */
    private val nOff = falseNorthing - k0 * ks.rectA * ks.mu(math.toRadians(lat0))
    // WGS84 source-ellipsoid constants for the datum leg
    private val aW = TransverseMercator.SemiMajor
    private val e2W = TransverseMercator.Ecc * TransverseMercator.Ecc
    /** (tx, ty, tz, rx, ry, rz[rad], scale) — WGS84 -> local */
    private val helm: Option[(Double, Double, Double, Double, Double, Double, Double)] =
      towgs84.map { p =>
        require(p.length == 7, s"towgs84 needs 7 params, got ${p.length}")
        (p(0), p(1), p(2), math.toRadians(p(3) / 3600.0),
          math.toRadians(p(4) / 3600.0), math.toRadians(p(5) / 3600.0),
          1.0 + p(6) * 1e-6)
      }
    /** datum-shift iteration rounds — FIXED so the SQL twin can unroll
      * the identical chain (the atan2 fixed point contracts by ~0.14
      * per round; 6 rounds converge far below the ~1e-8-deg floor set
      * by the 2D height-dropping asymmetry, see [[toLocalDatum]]) */
    val DatumIters = 6

    private def geodeticToEcef(lonR: Double, latR: Double, a: Double, e2: Double) = {
      val s = math.sin(latR); val nu = a / math.sqrt(1 - e2 * s * s)
      (nu * math.cos(latR) * math.cos(lonR), nu * math.cos(latR) * math.sin(lonR),
        nu * (1 - e2) * s)
    }
    private def ecefToGeodetic(x: Double, y: Double, z: Double,
                               a: Double, e2: Double): (Double, Double) = {
      val p = math.sqrt(x * x + y * y)
      var phi = math.atan2(z, p * (1 - e2))
      var k = 0
      while (k < DatumIters) {
        val s = math.sin(phi)
        val nu = a / math.sqrt(1 - e2 * s * s)
        phi = math.atan2(z + e2 * nu * s, p)
        k += 1
      }
      (math.atan2(y, x), phi)
    }

    /** WGS84 lon/lat (deg) -> local-datum geodetic (RADIANS).
      *
      * 2D contract (proj's 2D cs2cs behavior): input height is taken
      * as 0 and the TRANSFORMED height is dropped, so forward+inverse
      * round-trips carry an inherent ~|t|·(|t|/R) error (~1e-8 deg for
      * the ~500 m OSGB translation) — the ellipsoid normals of the two
      * datums diverge, and re-seeding h=0 displaces the point along
      * the local normal. This is a property of every 2D datum
      * transform, not an iteration-convergence artifact. */
    private def toLocalDatum(lon: Double, lat: Double): (Double, Double) = helm match {
      case None => (math.toRadians(lon), math.toRadians(lat))
      case Some((tx, ty, tz, rx, ry, rz, sc)) =>
        val (x, y, z) = geodeticToEcef(math.toRadians(lon), math.toRadians(lat), aW, e2W)
        val xh = tx + sc * (x - rz * y + ry * z)
        val yh = ty + sc * (rz * x + y - rx * z)
        val zh = tz + sc * (-ry * x + rx * y + z)
        ecefToGeodetic(xh, yh, zh, semiMajor, ks.e2)
    }
    /** local-datum geodetic (RADIANS) -> WGS84 lon/lat (deg): exact
      * algebraic inverse of the forward Helmert (Cramer 3x3 solve of
      * the linearized rotation — NOT the negated-parameter
      * approximation, so round-trips close to fp precision). */
    private def toWgs84(lonR: Double, latR: Double): (Double, Double) = helm match {
      case None => (math.toDegrees(lonR), math.toDegrees(latR))
      case Some((tx, ty, tz, rx, ry, rz, sc)) =>
        val (xh, yh, zh) = geodeticToEcef(lonR, latR, semiMajor, ks.e2)
        val (bx, by, bz) = ((xh - tx) / sc, (yh - ty) / sc, (zh - tz) / sc)
        // solve R v = b with R = I + skew(rx, ry, rz) (linearized PV)
        val det = 1.0 + rx * rx + ry * ry + rz * rz
        val x = ((1 + rx * rx) * bx + (rz + rx * ry) * by + (rx * rz - ry) * bz) / det
        val y = ((rx * ry - rz) * bx + (1 + ry * ry) * by + (rx + ry * rz) * bz) / det
        val z = ((ry + rx * rz) * bx + (ry * rz - rx) * by + (1 + rz * rz) * bz) / det
        val (lam, phi) = ecefToGeodetic(x, y, z, aW, e2W)
        (math.toDegrees(lam), math.toDegrees(phi))
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val (lamR, phi) = toLocalDatum(lon, lat)
      val dl0 = lamR - math.toRadians(lon0)
      val dl = if (dl0 > math.Pi) dl0 - 2 * math.Pi
               else if (dl0 < -math.Pi) dl0 + 2 * math.Pi else dl0
      val sphi = math.sin(phi)
      val psi = asinh(math.tan(phi)) - ks.ecc * atanh(ks.ecc * sphi)
      val t = math.sinh(psi)
      val xip = math.atan2(t, math.cos(dl))
      val etap = asinh(math.sin(dl) / math.sqrt(t * t + math.cos(dl) * math.cos(dl)))
      var xi = xip; var eta = etap
      var j = 1
      while (j <= 4) {
        xi += ks.alpha(j - 1) * math.sin(2 * j * xip) * math.cosh(2 * j * etap)
        eta += ks.alpha(j - 1) * math.cos(2 * j * xip) * math.sinh(2 * j * etap)
        j += 1
      }
      (falseEasting + k0 * ks.rectA * eta, nOff + k0 * ks.rectA * xi)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - nOff) / (k0 * ks.rectA)
      val eta = (x - falseEasting) / (k0 * ks.rectA)
      var xip = xi; var etap = eta
      var j = 1
      while (j <= 4) {
        xip -= ks.beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etap -= ks.beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xip) / math.cosh(etap))
      var phi = chi
      j = 1
      while (j <= 4) {
        phi += ks.delta(j - 1) * math.sin(2 * j * chi)
        j += 1
      }
      val dl = math.atan2(math.sinh(etap), math.cos(xip))
      val (lonW, latW) = toWgs84(math.toRadians(lon0) + dl, phi)
      (normLon(lonW), latW)
    }

    /** The full forward chain (datum shift + Krüger tmerc) as named
      * SQL formula steps — the one-text-two-engines oracle pattern of
      * [[TransverseMercator.forwardSqlSteps]]; the datum fixed-point is
      * unrolled to the same [[DatumIters]] rounds the Scala path runs.
      * DuckDB lacks hyperbolics, so they are restated via exp/ln. */
    def forwardSqlSteps: (Seq[(String, String)], String, String) = {
      def sinhS(x: String) = s"(exp($x) - exp(-($x))) / 2"
      def coshS(x: String) = s"(exp($x) + exp(-($x))) / 2"
      def asinhS(x: String) = s"ln(($x) + sqrt(($x) * ($x) + 1))"
      val eA = ks.ecc.toString; val e2A = ks.e2.toString; val aA = semiMajor.toString
      val lon0R = math.toRadians(lon0)
      val datum: Seq[(String, String)] = helm match {
        case None => Seq("lam" -> "radians(lon)", "gphi" -> "radians(lat)")
        case Some((tx, ty, tz, rx, ry, rz, sc)) =>
          val ecef = Seq(
            "phiw" -> "radians(lat)", "lamw" -> "radians(lon)",
            "nuw" -> s"$aW / sqrt(1 - $e2W * sin(phiw) * sin(phiw))",
            "xw" -> "nuw * cos(phiw) * cos(lamw)",
            "yw" -> "nuw * cos(phiw) * sin(lamw)",
            "zw" -> s"nuw * (1 - $e2W) * sin(phiw)",
            "xh" -> s"$tx + $sc * (xw - $rz * yw + $ry * zw)",
            "yh" -> s"$ty + $sc * ($rz * xw + yw - $rx * zw)",
            "zh" -> s"$tz + $sc * (-($ry) * xw + $rx * yw + zw)",
            "pp" -> "sqrt(xh * xh + yh * yh)",
            "f0" -> s"atan2(zh, pp * (1 - $e2A))")
          val iters = (1 to DatumIters).map { k =>
            s"f$k" -> (s"atan2(zh + $e2A * ($aA / sqrt(1 - $e2A * " +
              s"sin(f${k - 1}) * sin(f${k - 1}))) * sin(f${k - 1}), pp)")
          }
          ecef ++ iters ++ Seq("lam" -> "atan2(yh, xh)", "gphi" -> s"f$DatumIters")
      }
      val kA = (k0 * ks.rectA).toString
      val tm = Seq(
        "dl" -> s"lam - ($lon0R)",
        "sphi" -> "sin(gphi)",
        "psi" -> (s"${asinhS("tan(gphi)")} - $eA * " +
          s"(0.5 * ln((1 + $eA * sphi) / (1 - $eA * sphi)))"),
        "t" -> sinhS("psi"),
        "xip" -> "atan2(t, cos(dl))",
        "etap" -> asinhS("sin(dl) / sqrt(t * t + cos(dl) * cos(dl))"),
        "xi" -> ((1 to 4).map(j =>
          s"${ks.alpha(j - 1)} * sin(${2 * j} * xip) * ${coshS(s"${2 * j} * etap")}")
          .mkString("xip + ", " + ", "")),
        "eta" -> ((1 to 4).map(j =>
          s"${ks.alpha(j - 1)} * cos(${2 * j} * xip) * ${sinhS(s"${2 * j} * etap")}")
          .mkString("etap + ", " + ", "")))
      (datum ++ tm, s"$falseEasting + $kA * eta", s"$nOff + $kA * xi")
    }
  }

  /** EPSG:27700 OSGB36 / British National Grid: tmerc on Airy 1830
    * with the published WGS84 -> OSGB36 small-angle Helmert (the
    * reverse of the registry's +towgs84=446.448,-125.157,542.06,
    * 0.1502,0.247,0.8421,-20.4894; ±3 m vs the OSTN15 grid shift —
    * the proj4-string fidelity class, not the NTv2 one). */
  def Osgb36: Tmerc = Tmerc(
    lon0 = -2.0, lat0 = 49.0, k0 = 0.9996012717,
    falseEasting = 400000.0, falseNorthing = -100000.0,
    semiMajor = 6377563.396, flattening = 1.0 / 299.3249646,
    towgs84 = Some(Seq(-446.448, 125.157, -542.060,
      -0.1502, -0.2470, -0.8421, 20.4894)))

  /** Shared WGS84 Transverse Mercator constants + series coefficients
    * (public Krüger series; see [[Utm]] scaladoc for the citation). */
  object TransverseMercator {
    val SemiMajor = 6378137.0
    val Flattening = 1.0 / 298.257223563
    val K0 = 0.9996
    val FalseEasting = 500000.0
    /** third flattening n = f / (2 - f) */
    val N3 = Flattening / (2.0 - Flattening)
    /** first eccentricity e = sqrt(f (2 - f)) */
    val Ecc = math.sqrt(Flattening * (2.0 - Flattening))
    /** rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64) */
    val RectA = SemiMajor / (1 + N3) * (1 + N3 * N3 / 4 + N3 * N3 * N3 * N3 / 64)
    private val n2 = N3 * N3; private val n3 = n2 * N3; private val n4 = n3 * N3
    /** forward series (Karney 2011 eq. 35) */
    val Alpha: Array[Double] = Array(
      N3 / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180,
      13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440,
      61 * n3 / 240 - 103 * n4 / 140,
      49561 * n4 / 161280)
    /** inverse series (Karney 2011 eq. 36) */
    val Beta: Array[Double] = Array(
      N3 / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360,
      n2 / 48 + n3 / 15 - 437 * n4 / 1440,
      17 * n3 / 480 - 37 * n4 / 840,
      4397 * n4 / 161280)
    /** conformal -> geodetic latitude series */
    val Delta: Array[Double] = Array(
      2 * N3 - 2 * n2 / 3 - 2 * n3 + 116 * n4 / 45,
      7 * n2 / 3 - 8 * n3 / 5 - 227 * n4 / 45,
      56 * n3 / 15 - 136 * n4 / 35,
      4279 * n4 / 630)

    def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))
    def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

    /** The forward projection as named SQL formula steps — ONE text
      * source consumed by BOTH engines (Spark via expr(), DuckDB via a
      * CTE chain), so the oracle twin can never drift from the query.
      * Hyperbolics are restated through exp/ln because DuckDB has no
      * sinh/cosh/asinh/atanh; outputs are rounded to 0.1 mm by the
      * caller (transcendental libm calls may differ in the last ulp
      * between engines — the q_reproject precedent).
      *
      * Steps reference `lon`/`lat` columns and each other; returns
      * (steps, eastingExpr, northingExpr). */
    def forwardSqlSteps(zone: Int, south: Boolean): (Seq[(String, String)], String, String) = {
      val lon0 = -183.0 + 6.0 * zone
      val n0 = if (south) 10000000.0 else 0.0
      val e = Ecc.toString
      val kA = (K0 * RectA).toString
      def sinhS(x: String) = s"(exp($x) - exp(-($x))) / 2"
      def coshS(x: String) = s"(exp($x) + exp(-($x))) / 2"
      def asinhS(x: String) = s"ln(($x) + sqrt(($x) * ($x) + 1))"
      val steps = Seq(
        "phi" -> "radians(lat)",
        "dl" -> s"radians(lon - ($lon0))",
        "sphi" -> "sin(phi)",
        "psi" -> (s"${asinhS("tan(phi)")} - $e * " +
          s"(0.5 * ln((1 + $e * sphi) / (1 - $e * sphi)))"),
        "t" -> sinhS("psi"),
        "xip" -> "atan2(t, cos(dl))",
        "etap" -> asinhS("sin(dl) / sqrt(t * t + cos(dl) * cos(dl))"),
        "xi" -> ((1 to 4).map(j =>
          s"${Alpha(j - 1)} * sin(${2 * j} * xip) * ${coshS(s"${2 * j} * etap")}")
          .mkString("xip + ", " + ", "")),
        "eta" -> ((1 to 4).map(j =>
          s"${Alpha(j - 1)} * cos(${2 * j} * xip) * ${sinhS(s"${2 * j} * etap")}")
          .mkString("etap + ", " + ", "")))
      (steps, s"$FalseEasting + $kA * eta", s"$n0 + $kA * xi")
    }
  }
}
