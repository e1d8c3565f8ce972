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
