package graft.core

/** Minimal CRS transforms, from scratch (the reference delegates arbitrary
  * CRS to the external proj4 library; we implement the two families that
  * cover the common shapefile .prj cases):
  *
  *  - spherical Web-Mercator (EPSG:3857) ↔ WGS84
  *  - UTM (WGS84 ellipsoid) ↔ WGS84 via the classic Krüger series
  *    (public-domain formulas as in Snyder, "Map Projections — A Working
  *    Manual", USGS PP 1395, eqs. 8-9..8-25); round-trip accurate to <1e-9°.
  */
object Proj {

  // WGS84 ellipsoid
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)              // e²
  private val EP2 = E2 / (1 - E2)           // e'²
  private val K0 = 0.9996
  private val E1 = (1 - Math.sqrt(1 - E2)) / (1 + Math.sqrt(1 - E2))

  def utmCentralMeridian(zone: Int): Double = (zone - 1) * 6 - 180 + 3

  /** (lon, lat) → (easting, northing) in the given UTM zone. */
  def wgs84ToUtm(lon: Double, lat: Double, zone: Int, north: Boolean): (Double, Double) = {
    val latR = Math.toRadians(lat)
    val lonR = Math.toRadians(lon)
    val lon0 = Math.toRadians(utmCentralMeridian(zone))
    val sinLat = Math.sin(latR); val cosLat = Math.cos(latR); val tanLat = Math.tan(latR)
    val n = A / Math.sqrt(1 - E2 * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = EP2 * cosLat * cosLat
    val a = cosLat * (lonR - lon0)
    val m = A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * latR
      - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * Math.sin(2 * latR)
      + (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * Math.sin(4 * latR)
      - (35 * E2 * E2 * E2 / 3072) * Math.sin(6 * latR))
    val easting = K0 * n * (a + (1 - t + c) * a * a * a / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * Math.pow(a, 5) / 120) + 500000.0
    var northing = K0 * (m + n * tanLat * (a * a / 2
      + (5 - t + 9 * c + 4 * c * c) * Math.pow(a, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * Math.pow(a, 6) / 720))
    if (!north) northing += 10000000.0
    (easting, northing)
  }

  /** (easting, northing) in a UTM zone → (lon, lat). */
  def utmToWgs84(easting: Double, northing: Double, zone: Int, north: Boolean): (Double, Double) = {
    val x = easting - 500000.0
    val y = if (north) northing else northing - 10000000.0
    val m = y / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val phi1 = mu + (3 * E1 / 2 - 27 * Math.pow(E1, 3) / 32) * Math.sin(2 * mu) +
      (21 * E1 * E1 / 16 - 55 * Math.pow(E1, 4) / 32) * Math.sin(4 * mu) +
      (151 * Math.pow(E1, 3) / 96) * Math.sin(6 * mu) +
      (1097 * Math.pow(E1, 4) / 512) * Math.sin(8 * mu)
    val sin1 = Math.sin(phi1); val cos1 = Math.cos(phi1); val tan1 = Math.tan(phi1)
    val c1 = EP2 * cos1 * cos1
    val t1 = tan1 * tan1
    val n1 = A / Math.sqrt(1 - E2 * sin1 * sin1)
    val r1 = A * (1 - E2) / Math.pow(1 - E2 * sin1 * sin1, 1.5)
    val d = x / (n1 * K0)
    val lat = phi1 - (n1 * tan1 / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * Math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) * Math.pow(d, 6) / 720)
    val lon = Math.toRadians(utmCentralMeridian(zone)) +
      (d - (1 + 2 * t1 + c1) * Math.pow(d, 3) / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * Math.pow(d, 5) / 120) / cos1
    (Math.toDegrees(lon), Math.toDegrees(lat))
  }

  /** Parse a UTM zone from a .prj-ish CRS string, e.g.
    * `PROJCS["WGS_1984_UTM_Zone_17N", ...]` or "UTM zone 33S". */
  def parseUtmZone(prj: String): Option[(Int, Boolean)] = {
    val re = "(?i)UTM[_ ]?Zone[_ ]?(\\d{1,2})([NS])".r
    re.findFirstMatchIn(prj).map(m => (m.group(1).toInt, m.group(2).equalsIgnoreCase("N")))
  }

  // =================================================================
  // Lambert Conformal Conic + Albers Equal-Area inverse (Snyder, USGS
  // PP 1395: LCC eqs 15-1..15-11 + 7-9, Albers 14-1..14-11 + 3-16).
  //
  // Byte-parity contract: the reference reprojects any non-WGS84 .prj
  // through its bundled proj4 (`/root/reference/src/ShapeFile.js:58-65,89`;
  // `lib/proj4.js`), so to reproduce its GeoJSON output bit-for-bit these
  // implementations keep proj4js's GCTP-derived numerics exactly: the same
  // iteration counts and tolerances (phi2z: ≤16 iters @1e-10; Albers phi1z:
  // ≤25 iters @1e-7), the same D2R/R2D decimal literals, the same
  // floating-point operation order, and the same adjust_lon threshold
  // (3.14159265359, not π). All formulas are public-domain Snyder math.
  // =================================================================

  private val HalfPi = Math.PI / 2
  /** proj4's degree↔radian literals (not 180/π — parity matters). */
  final val D2R = 0.017453292519943295
  final val R2D = 57.29577951308232

  private def adjustLon(x: Double): Double =
    if (Math.abs(x) <= 3.14159265359) x
    else x - (if (x < 0) -1.0 else 1.0) * (2 * Math.PI)

  /** Snyder 14-15 / proj4 common/msfnz. */
  private def msfnz(e: Double, sinphi: Double, cosphi: Double): Double = {
    val con = e * sinphi
    cosphi / Math.sqrt(1 - con * con)
  }

  /** Snyder 15-9 / proj4 common/tsfnz. */
  private def tsfnz(e: Double, phi: Double, sinphi: Double): Double = {
    var con = e * sinphi
    val com = 0.5 * e
    con = PowCR.pow((1 - con) / (1 + con), com)
    StrictMath.tan(0.5 * (HalfPi - phi)) / con
  }

  /** Snyder 7-9 iteration / proj4 common/phi2z (16 iters, 1e-10). */
  private def phi2z(e: Double, ts: Double): Double = {
    val eccnth = 0.5 * e
    var phi = HalfPi - 2 * StrictMath.atan(ts)
    var i = 0
    while (i <= 15) {
      val con = e * StrictMath.sin(phi)
      val dphi = HalfPi - 2 * StrictMath.atan(ts * PowCR.pow((1 - con) / (1 + con), eccnth)) - phi
      phi += dphi
      if (Math.abs(dphi) <= 1e-10) return phi
      i += 1
    }
    -9999.0
  }

  /** Snyder 3-12 / proj4 common/qsfnz. */
  private def qsfnz(ecc: Double, sinphi: Double): Double =
    if (ecc > 1.0e-7) {
      val con = ecc * sinphi
      (1 - ecc * ecc) * (sinphi / (1 - con * con) - (0.5 / ecc) * StrictMath.log((1 - con) / (1 + con)))
    } else 2 * sinphi

  private def asinz(x0: Double): Double = {
    val x = if (Math.abs(x0) > 1) (if (x0 > 1) 1.0 else -1.0) else x0
    StrictMath.asin(x)
  }

  /** proj4 common/adjust_lat. */
  private def adjustLat(x: Double): Double =
    if (Math.abs(x) < HalfPi) x else x - (if (x < 0) -1.0 else 1.0) * Math.PI

  // GCTP meridional-arc helpers (proj4 common/e0fn..e3fn, mlfn, imlfn, gN)
  private def e0fn(es: Double): Double = 1 - 0.25 * es * (1 + es / 16 * (3 + 1.25 * es))
  private def e1fn(es: Double): Double = 0.375 * es * (1 + 0.25 * es * (1 + 0.46875 * es))
  private def e2fn(es: Double): Double = 0.05859375 * es * es * (1 + 0.75 * es)
  private def e3fn(es: Double): Double = es * es * es * (35.0 / 3072.0)
  private def mlfn(e0: Double, e1: Double, e2: Double, e3: Double, phi: Double): Double =
    e0 * phi - e1 * StrictMath.sin(2 * phi) + e2 * StrictMath.sin(4 * phi) -
      e3 * StrictMath.sin(6 * phi)
  /** Inverse meridional arc (15 iters, 1e-10; proj4 returns NaN on
    * non-convergence — kept, the callers' outputs go NaN like the bundle). */
  private def imlfn(ml: Double, e0: Double, e1: Double, e2: Double, e3: Double): Double = {
    var f = ml / e0
    var h = 0
    while (h < 15) {
      val g = (ml - (e0 * f - e1 * StrictMath.sin(2 * f) + e2 * StrictMath.sin(4 * f) -
        e3 * StrictMath.sin(6 * f))) /
        (e0 - 2 * e1 * StrictMath.cos(2 * f) + 4 * e2 * StrictMath.cos(4 * f) -
          6 * e3 * StrictMath.cos(6 * f))
      f += g
      if (Math.abs(g) <= 1e-10) return f
      h += 1
    }
    Double.NaN
  }
  private def gN(a: Double, e: Double, sinphi: Double): Double = {
    val d = e * sinphi
    a / Math.sqrt(1 - d * d)
  }

  // Poder/Engsager meridional series (proj4 common/pj_enfn, pj_mlfn,
  // pj_inv_mlfn — the `sinu` family uses these, not e0fn..e3fn)
  private def pjEnfn(es: Double): Array[Double] = {
    val en = new Array[Double](5)
    en(0) = 1 - es * (0.25 + es * (0.046875 + es * (0.01953125 + es * 0.01068115234375)))
    en(1) = es * (0.75 - es * (0.046875 + es * (0.01953125 + es * 0.01068115234375)))
    var t = es * es
    en(2) = t * (0.46875 - es * (0.013020833333333334 + es * 0.007120768229166667))
    t *= es
    en(3) = t * (0.3645833333333333 - es * 0.005696614583333333)
    en(4) = t * es * 0.3076171875
    en
  }
  private def pjMlfn(phi: Double, sphi0: Double, cphi0: Double, en: Array[Double]): Double = {
    val cphi = cphi0 * sphi0
    val sphi = sphi0 * sphi0
    en(0) * phi - cphi * (en(1) + sphi * (en(2) + sphi * (en(3) + sphi * en(4))))
  }
  private def pjInvMlfn(arg: Double, es: Double, en: Array[Double]): Double = {
    val k = 1.0 / (1 - es)
    var phi = arg
    var i = 20
    while (i > 0) {
      val s = StrictMath.sin(phi)
      var t = 1 - es * s * s
      t = (pjMlfn(phi, s, StrictMath.cos(phi), en) - arg) * (t * Math.sqrt(t)) * k
      phi -= t
      if (Math.abs(t) < 1e-10) return phi
      i -= 1
    }
    phi
  }

  /** Lambert Conformal Conic (1SP/2SP) on an a/b ellipsoid; angles in
    * radians; returns (lon, lat) radians. */
  final case class Lcc(a: Double, b: Double, lat0: Double, lat1: Double, lat2raw: Double,
      long0: Double, x0: Double, y0: Double, k0: Double) {
    private val lat2 = if (lat2raw.isNaN) lat1 else lat2raw
    require(Math.abs(lat1 + lat2) >= 1e-10, "lcc: lat1 == -lat2 is degenerate")
    private val e = { val t = b / a; Math.sqrt(1 - t * t) }
    private val ns = {
      val sin1 = StrictMath.sin(lat1); val cos1 = StrictMath.cos(lat1)
      val ms1 = msfnz(e, sin1, cos1); val ts1 = tsfnz(e, lat1, sin1)
      val sin2 = StrictMath.sin(lat2); val cos2 = StrictMath.cos(lat2)
      val ms2 = msfnz(e, sin2, cos2); val ts2 = tsfnz(e, lat2, sin2)
      val n0 = if (Math.abs(lat1 - lat2) > 1e-10) StrictMath.log(ms1 / ms2) / StrictMath.log(ts1 / ts2) else sin1
      if (n0.isNaN) sin1 else n0
    }
    private val f0 = {
      val sin1 = StrictMath.sin(lat1)
      msfnz(e, sin1, StrictMath.cos(lat1)) / (ns * PowCR.pow(tsfnz(e, lat1, sin1), ns))
    }
    private val rh = a * f0 * PowCR.pow(tsfnz(e, lat0, StrictMath.sin(lat0)), ns)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val xx = (px - x0) / k0
      val yy = rh - (py - y0) / k0
      val (rh1, con) =
        if (ns > 0) (Math.sqrt(xx * xx + yy * yy), 1.0)
        else (-Math.sqrt(xx * xx + yy * yy), -1.0)
      val theta = if (rh1 != 0) StrictMath.atan2(con * xx, con * yy) else 0.0
      val lat =
        if (rh1 != 0 || ns > 0) {
          val ts = PowCR.pow(rh1 / (a * f0), 1 / ns)
          val p = phi2z(e, ts)
          require(p != -9999.0, "lcc inverse: phi2z did not converge")
          p
        } else -HalfPi
      (adjustLon(theta / ns + long0), lat)
    }
  }

  /** Param-driven Transverse Mercator (GCTP series, as proj4's `tmerc`) on
    * an a/b ellipsoid; radians in/out. Covers ESRI `Transverse_Mercator`
    * PROJCS (State Plane TM zones, Gauss-Krüger, full ESRI UTM WKT) with
    * byte parity to the reference's proj4 path — the zone-name Krüger code
    * above remains for bare "UTM Zone NN" strings proj4 cannot parse. */
  final case class Tmerc(a: Double, b: Double, lat0: Double,
      long0: Double, x0: Double, y0: Double, k0: Double) {
    private val es = { val a2 = a * a; val b2 = b * b; (a2 - b2) / a2 }
    private val ep2 = { val a2 = a * a; val b2 = b * b; (a2 - b2) / b2 }
    // GCTP meridional-arc coefficients (proj4 common/e0fn..e3fn, mlfn)
    private val e0 = 1 - 0.25 * es * (1 + es / 16 * (3 + 1.25 * es))
    private val e1 = 0.375 * es * (1 + 0.25 * es * (1 + 0.46875 * es))
    private val e2 = 0.05859375 * es * es * (1 + 0.75 * es)
    private val e3c = es * es * es * (35.0 / 3072.0)
    private def mlfn(phi: Double): Double =
      e0 * phi - e1 * StrictMath.sin(2 * phi) + e2 * StrictMath.sin(4 * phi) -
        e3c * StrictMath.sin(6 * phi)
    private val ml0 = a * mlfn(lat0)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = py - y0
      val con = (ml0 + y / k0) / a
      var phi = con
      var i = 0
      var done = false
      while (!done) {
        val delta = (con + e1 * StrictMath.sin(2 * phi) - e2 * StrictMath.sin(4 * phi) +
          e3c * StrictMath.sin(6 * phi)) / e0 - phi
        phi += delta
        if (Math.abs(delta) <= 1e-10) done = true
        else {
          require(i < 6, "tmerc inverse: latitude iteration did not converge")
          i += 1
        }
      }
      if (Math.abs(phi) < HalfPi) {
        val sinPhi = StrictMath.sin(phi); val cosPhi = StrictMath.cos(phi)
        val tanPhi = StrictMath.tan(phi)
        val c = ep2 * StrictMath.pow(cosPhi, 2)
        val cs = StrictMath.pow(c, 2)
        val t = StrictMath.pow(tanPhi, 2)
        val ts = StrictMath.pow(t, 2)
        val conN = 1 - es * StrictMath.pow(sinPhi, 2)
        val n = a / Math.sqrt(conN)
        val r = n * (1 - es) / conN
        val d = x / (n * k0)
        val ds = StrictMath.pow(d, 2)
        val lat = phi - n * tanPhi * ds / r *
          (0.5 - ds / 24 * (5 + 3 * t + 10 * c - 4 * cs - 9 * ep2 -
            ds / 30 * (61 + 90 * t + 298 * c + 45 * ts - 252 * ep2 - 3 * cs)))
        val lon = adjustLon(long0 + d *
          (1 - ds / 6 * (1 + 2 * t + c -
            ds / 20 * (5 - 2 * c + 28 * t - 3 * cs + 8 * ep2 + 24 * ts))) / cosPhi)
        (lon, lat)
      } else {
        (long0, HalfPi * (if (y < 0) -1.0 else 1.0))
      }
    }
  }

  /** South-polar Stereographic on an a/b ellipsoid (proj4 `stere`, polar
    * branch — the ONLY stereographic variant the reference's proj4 maps
    * from WKT: names "Stereographic_South_Pole" / "Polar Stereographic
    * (variant B)"; its WKT path pins lat0 = ±90° from the sign of
    * Standard_Parallel_1 and lat_ts = that parallel). Radians in/out. */
  final case class PolarStereo(a: Double, b: Double, latTs: Double,
      long0: Double, x0: Double, y0: Double, k0In: Double) {
    private val e = { val t = b / a; Math.sqrt(1 - t * t) }
    private val con = if (latTs > 0) 1.0 else -1.0 // lat0 = sign(lat_ts)·90°
    private val lat0 = con * HalfPi
    private val cons = Math.sqrt(PowCR.pow(1 + e, 1 + e) * PowCR.pow(1 - e, 1 - e))
    private val k0 =
      if (k0In == 1.0)
        0.5 * cons * msfnz(e, StrictMath.sin(latTs), StrictMath.cos(latTs)) /
          tsfnz(e, con * latTs, con * StrictMath.sin(latTs))
      else k0In

    def inverse(px: Double, py: Double): (Double, Double) = {
      var x = px - x0
      var y = py - y0
      val k = Math.sqrt(x * x + y * y)
      if (k <= 1e-10) return (long0, lat0)
      x *= con; y *= con
      val ts = k * cons / (2 * a * k0)
      val lat = con * phi2z(e, ts)
      val lon = con * adjustLon(con * long0 + StrictMath.atan2(x, -1 * y))
      (lon, lat)
    }
  }

  /** Double Stereographic via the Gaussian conformal sphere (proj4 `sterea`
    * = gauss + stereographic, GCTP "Oblique Stereographic Alternative").
    * This — NOT the polar `stere` branch — is what the reference's proj4
    * maps for the WKT names `Stereographic_North_Pole`,
    * `Oblique_Stereographic`, and `Polar_Stereographic` (names list in
    * `/root/reference/lib/proj4.js` module 61; `stere` maps only the south
    * pole + variant-B names). Radians in/out; es is the deriveConstants
    * value (a²−b²)/a², exact argument order preserved for byte parity. */
  final case class Sterea(a: Double, es: Double, lat0: Double,
      long0: Double, x0: Double, y0: Double, k0: Double) {
    private val e = Math.sqrt(es)
    private val QuartPi = Math.PI / 4
    // gauss init (module 46): conformal-sphere constants
    private val sinLat0 = StrictMath.sin(lat0)
    private val cos2 = { val c = StrictMath.cos(lat0); c * c }
    private val rc = Math.sqrt(1 - es) / (1 - es * sinLat0 * sinLat0)
    private val cC = Math.sqrt(1 + es * cos2 * cos2 / (1 - es))
    private val phic0 = StrictMath.asin(sinLat0 / cC)
    private val ratexp = 0.5 * cC * e
    private val bigK = StrictMath.tan(0.5 * phic0 + QuartPi) /
      (PowCR.pow(StrictMath.tan(0.5 * lat0 + QuartPi), cC) * srat(e * sinLat0, ratexp))
    private val sinc0 = StrictMath.sin(phic0)
    private val cosc0 = StrictMath.cos(phic0)
    private val r2 = 2 * rc

    /** proj4 common/srat: ((1−esinp)/(1+esinp))^exp — general-exponent pow
      * goes through PowCR like the conics. */
    private def srat(esinp: Double, ex: Double): Double =
      PowCR.pow((1 - esinp) / (1 + esinp), ex)

    def inverse(px: Double, py: Double): (Double, Double) = {
      var x = (px - x0) / a
      var y = (py - y0) / a
      x /= k0; y /= k0
      val h = Math.sqrt(x * x + y * y)
      var gx = 0.0
      var gy = phic0
      if (h != 0) {
        val rho = 2 * StrictMath.atan2(h, r2)
        val sinRho = StrictMath.sin(rho); val cosRho = StrictMath.cos(rho)
        gy = StrictMath.asin(cosRho * sinc0 + y * sinRho * cosc0 / h)
        gx = StrictMath.atan2(x * sinRho, h * cosc0 * cosRho - y * sinc0 * sinRho)
      }
      // gauss inverse: fixed point on the conformal latitude (20 iters, 1e-14)
      val lon = gx / cC
      val i0 = PowCR.pow(StrictMath.tan(0.5 * gy + QuartPi) / bigK, 1 / cC)
      var ay = gy
      var h2 = gy
      var j = 20
      var converged = false
      while (j > 0 && !converged) {
        h2 = 2 * StrictMath.atan(i0 * srat(e * StrictMath.sin(ay), -0.5 * e)) - HalfPi
        if (Math.abs(h2 - ay) < 1e-14) converged = true
        else { ay = h2; j -= 1 }
      }
      require(converged, "sterea inverse: gauss iteration did not converge")
      (adjustLon(lon + long0), h2)
    }
  }

  /** Lambert Azimuthal Equal-Area, ellipsoidal path (proj4 `laea`, module
    * 49: Snyder 24-x/3-18 with the authalic-latitude series). Modes derived
    * from lat0 exactly as the reference (pole/equatorial/oblique); radians
    * in/out; es is the deriveConstants value. */
  final case class Laea(a: Double, es: Double, lat0: Double,
      long0: Double, x0: Double, y0: Double) {
    require(es > 0, "laea: spherical path unreachable from .prj SPHEROID input")
    private val e = Math.sqrt(es)
    private val Eps10 = 1e-10
    // modes (proj4 constants): 1=S_POLE 2=N_POLE 3=EQUIT 4=OBLIQ
    private val mode =
      if (Math.abs(Math.abs(lat0) - HalfPi) < Eps10) { if (lat0 < 0) 1 else 2 }
      else if (Math.abs(lat0) < Eps10) 3
      else 4
    private val qp = qsfnz(e, 1.0)
    // authset (module 49 P00..P20): authalic→geodetic series coefficients
    private val apa = {
      val c = new Array[Double](3)
      c(0) = es * 0.3333333333333333
      var b = es * es
      c(0) += b * 0.17222222222222222
      c(1) = b * 0.06388888888888888
      b *= es
      c(0) += b * 0.10257936507936508
      c(1) += b * 0.0664021164021164
      c(2) = b * 0.016415012942191543
      c
    }
    private val (rq, dd, sinb1, cosb1) = mode match {
      case 1 | 2 => (0.0, 1.0, 0.0, 0.0)
      case 3 =>
        val r = Math.sqrt(0.5 * qp); (r, 1 / r, 0.0, 0.0)
      case _ =>
        val r = Math.sqrt(0.5 * qp)
        val b = StrictMath.sin(lat0)
        val sb = qsfnz(e, b) / qp
        val cb = Math.sqrt(1 - sb * sb)
        (r, StrictMath.cos(lat0) / (Math.sqrt(1 - es * b * b) * r * cb), sb, cb)
    }

    private def authlat(beta: Double): Double = {
      val t = beta + beta
      beta + apa(0) * StrictMath.sin(t) + apa(1) * StrictMath.sin(t + t) +
        apa(2) * StrictMath.sin(t + t + t)
    }

    def inverse(px: Double, py: Double): (Double, Double) = {
      var l = (px - x0) / a
      var m = (py - y0) / a
      var k = 0.0
      if (mode == 3 || mode == 4) {
        l /= dd; m *= dd
        val j = Math.sqrt(l * l + m * m)
        // proj4 early-return at the exact projection center: a.x=0 (NOT
        // long0) and a.y=this.phi0 which the ellipsoidal init never sets —
        // undefined → NaN. Sub-nanometer-from-origin input only; mirrored.
        if (j < Eps10) return (0.0, Double.NaN)
        val ce = 2 * StrictMath.asin(0.5 * j / rq)
        val cosCe = StrictMath.cos(ce); val sinCe = StrictMath.sin(ce)
        l *= sinCe
        if (mode == 4) {
          k = cosCe * sinb1 + m * sinCe * cosb1 / j
          m = j * cosb1 * cosCe - m * sinb1 * sinCe
        } else {
          k = m * sinCe / j
          m = j * cosCe
        }
      } else {
        if (mode == 2) m = -m
        val i = l * l + m * m
        if (i == 0) return (0.0, Double.NaN)
        k = 1 - i / qp
        if (mode == 1) k = -k
      }
      val b = StrictMath.atan2(l, m)
      (adjustLon(long0 + b), authlat(StrictMath.asin(k)))
    }
  }

  /** Mercator (proj4 `merc`): ellipsoidal via phi2z, or the auxiliary-sphere
    * branch (ESRI `Mercator_Auxiliary_Sphere` on a WGS-1984 datum — the only
    * way the reference's WKT path sets `sphere`). NOTE the module recomputes
    * es = 1 − (b/a)² locally (bit-different from deriveConstants' (a²−b²)/a²)
    * and the ESRI WKT path never maps Standard_Parallel_1 to lat_ts, so
    * k0 = Scale_Factor or 1 — both quirks preserved. Radians in/out. */
  final case class Merc(a: Double, b: Double, long0: Double,
      x0: Double, y0: Double, k0: Double, sphere: Boolean) {
    private val es = { val t = b / a; 1 - t * t }
    private val e = Math.sqrt(es)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = py - y0
      val lat =
        if (sphere) HalfPi - 2 * StrictMath.atan(StrictMath.exp(-y / (a * k0)))
        else {
          val ts = StrictMath.exp(-y / (a * k0))
          val p = phi2z(e, ts)
          require(p != -9999.0, "merc inverse: phi2z did not converge")
          p
        }
      (adjustLon(long0 + x / (a * k0)), lat)
    }
  }

  /** Azimuthal Equidistant (proj4 `aeqd`, module 41), ellipsoidal path —
    * polar branches via the meridional arc, general oblique via the GCTP
    * geodesic series. Radians in/out. */
  final case class Aeqd(a: Double, es: Double, lat0: Double,
      long0: Double, x0: Double, y0: Double) {
    require(es > 0, "aeqd: spherical path unreachable from .prj SPHEROID input")
    private val e = Math.sqrt(es)
    private val Eps10 = 1e-10
    private val sinP12 = StrictMath.sin(lat0)
    private val cosP12 = StrictMath.cos(lat0)
    private val e0 = e0fn(es); private val e1 = e1fn(es)
    private val e2 = e2fn(es); private val e3 = e3fn(es)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = py - y0
      if (Math.abs(sinP12 - 1) <= Eps10) {
        val mlp = a * mlfn(e0, e1, e2, e3, HalfPi)
        val rh = Math.sqrt(x * x + y * y)
        val lat = imlfn((mlp - rh) / a, e0, e1, e2, e3)
        (adjustLon(long0 + StrictMath.atan2(x, -1 * y)), lat)
      } else if (Math.abs(sinP12 + 1) <= Eps10) {
        val mlp = a * mlfn(e0, e1, e2, e3, HalfPi)
        val rh = Math.sqrt(x * x + y * y)
        val lat = imlfn((rh - mlp) / a, e0, e1, e2, e3)
        (adjustLon(long0 + StrictMath.atan2(x, y)), lat)
      } else {
        val rh = Math.sqrt(x * x + y * y)
        val bAz = StrictMath.atan2(x, y)
        val n1 = gN(a, e, sinP12)
        val cosAz = StrictMath.cos(bAz)
        val dd = e * cosP12 * cosAz
        val ee = -dd * dd / (1 - es)
        val ff = 3 * es * (1 - ee) * sinP12 * cosP12 * cosAz / (1 - es)
        val gg = rh / n1
        val hh = gg - ee * (1 + ee) * PowCR.pow(gg, 3) / 6 -
          ff * (1 + 3 * ee) * PowCR.pow(gg, 4) / 24
        val ii = 1 - ee * hh * hh / 2 - gg * hh * hh * hh / 6
        val psi = StrictMath.asin(sinP12 * StrictMath.cos(hh) + cosP12 * StrictMath.sin(hh) * cosAz)
        val lon = adjustLon(long0 + StrictMath.asin(
          StrictMath.sin(bAz) * StrictMath.sin(hh) / StrictMath.cos(psi)))
        val lat = StrictMath.atan(
          (1 - es * ii * sinP12 / StrictMath.sin(psi)) * StrictMath.tan(psi) / (1 - es))
        (lon, lat)
      }
    }
  }

  /** Cassini-Soldner (proj4 `cass`, module 42), ellipsoidal path. */
  final case class Cass(a: Double, es: Double, lat0: Double,
      long0: Double, x0: Double, y0: Double) {
    require(es > 0, "cass: spherical path unreachable from .prj SPHEROID input")
    private val e = Math.sqrt(es)
    private val e0 = e0fn(es); private val e1 = e1fn(es)
    private val e2 = e2fn(es); private val e3 = e3fn(es)
    private val ml0 = a * mlfn(e0, e1, e2, e3, lat0)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = (px - x0) / a
      val y = (py - y0) / a
      val ph1 = imlfn(ml0 / a + y, e0, e1, e2, e3)
      if (Math.abs(Math.abs(ph1) - HalfPi) <= 1e-10)
        return (long0, if (y < 0) -HalfPi else HalfPi)
      val n1 = gN(a, e, StrictMath.sin(ph1))
      val r1 = n1 * n1 * n1 / a / a * (1 - es)
      val t1 = { val t = StrictMath.tan(ph1); t * t } // pow(x,2) == x*x under CR
      val d = x * a / n1
      val ds = d * d
      val lat = ph1 - n1 * StrictMath.tan(ph1) / r1 * d * d * (0.5 - (1 + 3 * t1) * d * d / 24)
      val dlon = d * (1 - ds * (t1 / 3 + (1 + 3 * t1) * t1 * ds / 15)) / StrictMath.cos(ph1)
      (adjustLon(dlon + long0), adjustLat(lat))
    }
  }

  /** Equirectangular / Equidistant Cylindrical (proj4 `eqc`, module 44).
    * NOTE the bundle's WKT path never sets lat_ts (only the south-polar
    * stereo rule does), so rc = cos(0) = 1 for every .prj — the ESRI
    * Standard_Parallel_1 lands in lat0, which the inverse ADDS to y/a
    * (bundle quirk, preserved). */
  final case class Eqc(a: Double, lat0: Double, long0: Double, x0: Double, y0: Double) {
    private val rc = StrictMath.cos(0.0) // lat_ts is never set from WKT
    def inverse(px: Double, py: Double): (Double, Double) =
      (adjustLon(long0 + (px - x0) / (a * rc)), adjustLat(lat0 + (py - y0) / a))
  }

  /** Equidistant Conic (proj4 `eqdc`, module 45). es recomputed from b/a as
    * the module does. lat2 falls back to lat1 when absent OR ZERO (the
    * bundle's falsy ||). Degenerate lat1 = −lat2 throws loudly (the bundle
    * silently skips init and emits NaN). */
  final case class Eqdc(a: Double, b: Double, lat0: Double, lat1: Double, lat2raw: Double,
      long0: Double, x0: Double, y0: Double) {
    private val lat2 = if (lat2raw.isNaN || lat2raw == 0.0) lat1 else lat2raw
    require(Math.abs(lat1 + lat2) >= 1e-10, "eqdc: lat1 == -lat2 is degenerate")
    private val es = { val t = b / a; 1 - t * t } // pow(x,2) == x*x under CR
    private val e = Math.sqrt(es)
    private val e0 = e0fn(es); private val e1 = e1fn(es)
    private val e2 = e2fn(es); private val e3 = e3fn(es)
    private val (ns, g) = {
      val sin1 = StrictMath.sin(lat1); val cos1 = StrictMath.cos(lat1)
      val ms1 = msfnz(e, sin1, cos1)
      val ml1 = mlfn(e0, e1, e2, e3, lat1)
      val n =
        if (Math.abs(lat1 - lat2) < 1e-10) sin1
        else {
          val sin2 = StrictMath.sin(lat2); val cos2 = StrictMath.cos(lat2)
          val ms2 = msfnz(e, sin2, cos2)
          val ml2 = mlfn(e0, e1, e2, e3, lat2)
          (ms1 - ms2) / (ml2 - ml1)
        }
      (n, ml1 + ms1 / n)
    }
    private val ml0 = mlfn(e0, e1, e2, e3, lat0)
    private val rh = a * (g - ml0)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = rh - py + y0
      val (c, sgn) =
        if (ns >= 0) (Math.sqrt(x * x + y * y), 1.0)
        else (-Math.sqrt(x * x + y * y), -1.0)
      val theta = if (c != 0) StrictMath.atan2(sgn * x, sgn * y) else 0.0
      val lat = imlfn(g - c / a, e0, e1, e2, e3)
      (adjustLon(long0 + theta / ns), lat)
    }
  }

  /** Krovak (proj4 module 48): the module FORCES the Bessel ellipsoid
    * (a = 6377397.155, es = 0.006674372230614) and defaults lat0/long0/k0
    * when absent or zero (JS falsy ||); false easting/northing are IGNORED
    * by both directions in the bundle; output x/y arrive swapped and
    * negated (czech flag unset from WKT). All preserved. */
  final case class Krovak(lat0In: Double, long0In: Double, k0In: Double) {
    private val a = 6377397.155
    private val es = 0.006674372230614
    private val e = Math.sqrt(es)
    private val lat0 = if (lat0In == 0.0) 0.863937979737193 else lat0In
    private val long0 = if (long0In == 0.0) 0.4334234309119251 else long0In
    // deriveConstants runs k0||(k0=1) BEFORE the module init, so the
    // module's own 0.9999 fallback is dead code for WKT input: absent or
    // zero Scale_Factor means 1 (verified against the live bundle)
    private val k0 = if (k0In == 0.0) 1.0 else k0In
    private val s45 = 0.785398163397448
    private val s90 = 2 * s45
    private val fi0 = lat0
    private val alfa = Math.sqrt(1 + es * PowCR.pow(StrictMath.cos(fi0), 4) / (1 - es))
    private val uq = 1.04216856380474
    private val u0 = StrictMath.asin(StrictMath.sin(fi0) / alfa)
    private val gC = PowCR.pow(
      (1 + e * StrictMath.sin(fi0)) / (1 - e * StrictMath.sin(fi0)), alfa * e / 2)
    private val kC = StrictMath.tan(u0 / 2 + s45) /
      PowCR.pow(StrictMath.tan(fi0 / 2 + s45), alfa) * gC
    private val n0 = { val s = StrictMath.sin(fi0); a * Math.sqrt(1 - es) / (1 - es * (s * s)) }
    private val s0 = 1.37008346281555
    private val n = StrictMath.sin(s0)
    private val ro0 = k0 * n0 / StrictMath.tan(s0)
    private val ad = s90 - uq

    def inverse(px: Double, py: Double): (Double, Double) = {
      // swap x/y, then negate both (czech unset)
      var x = py; var y = px
      y = -y; x = -x
      val ro = Math.sqrt(x * x + y * y)
      val fi = StrictMath.atan2(y, x)
      val deltav = fi / StrictMath.sin(s0)
      val d2 = 2 * (StrictMath.atan(
        PowCR.pow(ro0 / ro, 1 / n) * StrictMath.tan(s0 / 2 + s45)) - s45)
      val u = StrictMath.asin(StrictMath.cos(ad) * StrictMath.sin(d2) -
        StrictMath.sin(ad) * StrictMath.cos(d2) * StrictMath.cos(deltav))
      val dlon = StrictMath.asin(StrictMath.cos(d2) * StrictMath.sin(deltav) / StrictMath.cos(u))
      val lon = long0 - dlon / alfa
      // latitude fixed point (15 iters, 1e-10); the bundle returns null when
      // the budget runs out — loud here
      var h = u
      var lat = u
      var converged = false
      var k = 0
      while (!converged && k < 15) {
        lat = 2 * (StrictMath.atan(
          PowCR.pow(kC, -1 / alfa) * PowCR.pow(StrictMath.tan(u / 2 + s45), 1 / alfa) *
            PowCR.pow((1 + e * StrictMath.sin(h)) / (1 - e * StrictMath.sin(h)), e / 2)) - s45)
        if (Math.abs(h - lat) < 1e-10) converged = true
        h = lat
        k += 1
      }
      require(converged, "krovak inverse: latitude iteration did not converge")
      (lon, lat)
    }
  }

  /** Miller Cylindrical (proj4 `mill`, module 53). */
  final case class Mill(a: Double, long0: Double, x0: Double, y0: Double) {
    def inverse(px: Double, py: Double): (Double, Double) =
      (adjustLon(long0 + (px - x0) / a),
        2.5 * (StrictMath.atan(StrictMath.exp(0.8 * (py - y0) / a)) - Math.PI / 4))
  }

  /** Mollweide (proj4 `moll`, module 54). The bundle clamps BOTH sine
    * arguments to the positive bound regardless of sign — preserved. */
  final case class Moll(a: Double, long0: Double, x0: Double, y0: Double) {
    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = py - y0
      var c = y / (1.4142135623731 * a)
      if (Math.abs(c) > 0.999999999999) c = 0.999999999999
      val theta = StrictMath.asin(c)
      var lon = adjustLon(long0 + x / (0.900316316158 * a * StrictMath.cos(theta)))
      if (lon < -Math.PI) lon = -Math.PI
      if (lon > Math.PI) lon = Math.PI
      var c2 = (2 * theta + StrictMath.sin(2 * theta)) / Math.PI
      if (Math.abs(c2) > 1) c2 = 1
      (lon, StrictMath.asin(c2))
    }
  }

  /** New Zealand Map Grid (proj4 `nzmg`, module 55): fixed published
    * complex-series coefficients, one Newton iteration on the inverse. */
  final case class Nzmg(a: Double, lat0: Double, long0: Double, x0: Double, y0: Double) {
    private val Sec5 = 4.84813681109536e-6 // 484813681109536e-20 (sec2rad)
    private val A = Array(0.0, 0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
      0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
    private val Bre = Array(0.0, 0.7557853228, 0.249204646, -0.001541739, -0.10162907,
      -0.26623489, -0.6870983)
    private val Bim = Array(0.0, 0.0, 0.003371507, 0.04105856, 0.01727609,
      -0.36249218, -1.1651967)
    private val Cre = Array(0.0, 1.3231270439, -0.577245789, 0.508307513, -0.15094762,
      1.01418179, 1.9660549)
    private val Cim = Array(0.0, 0.0, -0.007809598, -0.112208952, 0.18200602,
      1.64497696, 2.5127645)
    private val D = Array(0.0, 1.5627014243, 0.5185406398, -0.03333098, -0.1052906,
      -0.0368594, 0.007317, 0.0122, 0.00394, -0.0013)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val h = px - x0
      val i = py - y0
      val zR = i / a
      val zI = h / a
      var l = 1.0; var m = 0.0
      var nR = 0.0; var nI = 0.0
      var b = 1
      while (b <= 6) {
        val c = l * zR - m * zI
        val e2 = m * zR + l * zI
        l = c; m = e2
        nR = nR + Cre(b) * l - Cim(b) * m
        nI = nI + Cim(b) * l + Cre(b) * m
        b += 1
      }
      // 1 Newton iteration (module constant)
      var p = 0
      while (p < 1) {
        var sR = nR; var sI = nI
        var uR = zR; var uI = zI
        b = 2
        while (b <= 6) {
          val q = sR * nR - sI * nI
          val r = sI * nR + sR * nI
          sR = q; sI = r
          uR += (b - 1) * (Bre(b) * sR - Bim(b) * sI)
          uI += (b - 1) * (Bim(b) * sR + Bre(b) * sI)
          b += 1
        }
        sR = 1.0; sI = 0.0
        var wR = Bre(1); var wI = Bim(1)
        b = 2
        while (b <= 6) {
          val q = sR * nR - sI * nI
          val r = sI * nR + sR * nI
          sR = q; sI = r
          wR += b * (Bre(b) * sR - Bim(b) * sI)
          wI += b * (Bim(b) * sR + Bre(b) * sI)
          b += 1
        }
        val y2 = wR * wR + wI * wI
        val newR = (uR * wR + uI * wI) / y2
        val newI = (uI * wR - uR * wI) / y2
        nR = newR; nI = newI
        p += 1
      }
      var acc = 1.0; var dPhi = 0.0
      b = 1
      while (b <= 9) {
        acc *= nR
        dPhi += D(b) * acc
        b += 1
      }
      (long0 + nI, lat0 + dPhi * Sec5 * 1e5)
    }
  }

  /** Polyconic (proj4 `poly`, module 57), ellipsoidal path; es recomputed
    * from b/a as the module does; 20-iteration Newton (the bundle leaves
    * the latitude undefined/NaN on non-convergence — loud here). */
  final case class Poly(a: Double, b: Double, lat0: Double,
      long0: Double, x0: Double, y0: Double) {
    private val es = { val t = b / a; 1 - t * t } // pow(x,2) == x*x under CR
    private val e = Math.sqrt(es)
    private val e0 = e0fn(es); private val e1 = e1fn(es)
    private val e2c = e2fn(es); private val e3c = e3fn(es)
    private val ml0 = a * mlfn(e0, e1, e2c, e3c, lat0)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = py - y0
      if (Math.abs(y + ml0) <= 1e-10) (adjustLon(long0 + x / a), 0.0)
      else {
        val arg = (ml0 + y) / a
        val i2 = x * x / a / a + arg * arg
        var l = arg
        var lat = 0.0
        var converged = false
        var f = 20
        while (f > 0 && !converged) {
          val t = e * StrictMath.sin(l)
          val p = Math.sqrt(1 - t * t) * StrictMath.tan(l)
          val q = a * mlfn(e0, e1, e2c, e3c, l)
          val r = e0 - 2 * e1 * StrictMath.cos(2 * l) + 4 * e2c * StrictMath.cos(4 * l) -
            6 * e3c * StrictMath.cos(6 * l)
          val s = q / a
          val delta = (arg * (p * s + 1) - s - 0.5 * p * (s * s + i2)) /
            (es * StrictMath.sin(2 * l) * (s * s + i2 - 2 * arg * s) / (4 * p) +
              (arg - s) * (p * r - 2 / StrictMath.sin(2 * l)) - r)
          l -= delta
          if (Math.abs(delta) <= 1e-10) { lat = l; converged = true }
          f -= 1
        }
        require(converged, "poly inverse: latitude iteration did not converge")
        val s2 = StrictMath.sin(lat)
        val p2 = Math.sqrt(1 - es * (s2 * s2)) * StrictMath.tan(lat) // pow(x,2) == x*x
        (adjustLon(long0 + StrictMath.asin(x * p2 / a) / StrictMath.sin(lat)), lat)
      }
    }
  }

  /** Sinusoidal (proj4 `sinu`, module 58), ellipsoidal path via the
    * Poder/Engsager meridional series. Beyond-the-pole y leaves the bundle's
    * longitude undefined → NaN; preserved. */
  final case class Sinu(a: Double, es: Double, long0: Double, x0: Double, y0: Double) {
    require(es > 0, "sinu: spherical path unreachable from .prj SPHEROID input")
    private val en = pjEnfn(es)

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = py - y0
      val lat = pjInvMlfn(y / a, es, en)
      val g = Math.abs(lat)
      val lon =
        if (g < HalfPi) {
          val s = StrictMath.sin(lat)
          adjustLon(long0 + x * Math.sqrt(1 - es * s * s) / (a * StrictMath.cos(lat)))
        } else if (g - 1e-10 < HalfPi) long0
        else Double.NaN // bundle leaves it undefined
      (lon, lat)
    }
  }

  /** Van der Grinten I (proj4 `vandg`, module 64): closed-form cubic
    * inverse, operation order preserved (sequential divisions). */
  final case class Vandg(a: Double, long0: Double, x0: Double, y0: Double) {
    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = py - y0
      val piR = Math.PI * a
      val xx = x / piR
      val yy = y / piR
      val xys = xx * xx + yy * yy
      val c1 = -Math.abs(yy) * (1 + xys)
      val c2 = c1 - 2 * yy * yy + xx * xx
      val c3 = -2 * c1 + 1 + 2 * yy * yy + xys * xys
      val d = yy * yy / c3 + (2 * c2 * c2 * c2 / c3 / c3 / c3 - 9 * c1 * c2 / c3 / c3) / 27
      val a1 = (c1 - c2 * c2 / 3 / c3) / c3
      val m1 = 2 * Math.sqrt(-a1 / 3)
      var con = 3 * d / a1 / m1
      if (Math.abs(con) > 1) con = if (con >= 0) 1.0 else -1.0
      val th1 = StrictMath.acos(con) / 3
      val lat =
        if (y >= 0) (-m1 * StrictMath.cos(th1 + Math.PI / 3) - c2 / 3 / c3) * Math.PI
        else -(-m1 * StrictMath.cos(th1 + Math.PI / 3) - c2 / 3 / c3) * Math.PI
      val lon =
        if (Math.abs(xx) < 1e-10) long0
        else adjustLon(long0 + Math.PI * (xys - 1 +
          Math.sqrt(1 + 2 * (xx * xx - yy * yy) + xys * xys)) / 2 / xx)
      (lon, lat)
    }
  }

  /** Albers Conic Equal-Area on an a/b ellipsoid; radians in/out. */
  final case class Aea(a: Double, b: Double, lat0: Double, lat1: Double, lat2: Double,
      long0: Double, x0: Double, y0: Double) {
    require(Math.abs(lat1 + lat2) >= 1e-10, "aea: lat1 == -lat2 is degenerate")
    private val es = { val t = b / a; 1 - StrictMath.pow(t, 2) }
    private val e3 = Math.sqrt(es)
    private val (ns0, c, rh) = {
      val sin1 = StrictMath.sin(lat1); val cos1 = StrictMath.cos(lat1)
      val ms1 = msfnz(e3, sin1, cos1); val qs1 = qsfnz(e3, sin1)
      val sin2 = StrictMath.sin(lat2); val cos2 = StrictMath.cos(lat2)
      val ms2 = msfnz(e3, sin2, cos2); val qs2 = qsfnz(e3, sin2)
      val qs0 = qsfnz(e3, StrictMath.sin(lat0))
      val n = if (Math.abs(lat1 - lat2) > 1e-10) (ms1 * ms1 - ms2 * ms2) / (qs2 - qs1) else sin1
      val cc = ms1 * ms1 + n * qs1
      (n, cc, a * Math.sqrt(cc - n * qs0) / n)
    }

    /** Snyder 3-16 iteration (proj4 aea-local phi1z: 25 iters, 1e-7). */
    private def phi1z(ecc: Double, qs: Double): Double = {
      var phi = asinz(0.5 * qs)
      if (ecc < 1e-10) return phi
      val eccsq = ecc * ecc
      var i = 1
      while (i <= 25) {
        val sinphi = StrictMath.sin(phi); val cosphi = StrictMath.cos(phi)
        val con = ecc * sinphi
        val com = 1 - con * con
        val dphi = 0.5 * com * com / cosphi *
          (qs / (1 - eccsq) - sinphi / com + 0.5 / ecc * StrictMath.log((1 - con) / (1 + con)))
        phi += dphi
        if (Math.abs(dphi) <= 1e-7) return phi
        i += 1
      }
      throw new IllegalArgumentException("aea inverse: phi1z did not converge")
    }

    def inverse(px: Double, py: Double): (Double, Double) = {
      val x = px - x0
      val y = rh - py + y0
      val (rh1, d) =
        if (ns0 >= 0) (Math.sqrt(x * x + y * y), 1.0)
        else (-Math.sqrt(x * x + y * y), -1.0)
      val theta = if (rh1 != 0) StrictMath.atan2(d * x, d * y) else 0.0
      val con = rh1 * ns0 / a
      val lat = phi1z(e3, (c - con * con) / ns0)
      (adjustLon(theta / ns0 + long0), lat)
    }
  }
}
