package graft.core

/** Minimal ESRI .prj (WKT1) reader for the conic CRS gate.
  *
  * Mirrors the parameter aliasing of the reference's proj4 WKT path
  * (`/root/reference/lib/proj4.js` wkt module): parameter names matched
  * case-insensitively; angles converted with the D2R literal; false
  * easting/northing scaled by the projected UNIT factor at parse time; the
  * linear unit factor also pre-multiplies input coordinates before the
  * inverse projection; b derived from the SPHEROID's inverse flattening as
  * (1 − 1/rf)·a.
  *
  * Datum guard: the reference's proj4 performs NO datum shift when
  * compare_datums holds (same a, |Δes| ≤ 5e-11 — true for WGS84 vs
  * NAD83/GRS80, the common LCC/Albers government case). CRS outside that
  * envelope would need a real geocentric datum transform, so the gate
  * rejects them loudly rather than silently mis-projecting.
  */
object PrjWkt {

  final case class Parsed(
      projection: String,
      params: Map[String, Double],   // lowercased PARAMETER name → value
      a: Double, rf: Double,
      toMeter: Double)

  private val projRe = """PROJECTION\["([^"]+)"\]""".r
  private val paramRe = """PARAMETER\["([^"]+)"\s*,\s*([-+0-9.eE]+)\]""".r
  private val sphRe = """SPHEROID\["[^"]*"\s*,\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)""".r
  private val unitRe = """UNIT\["([^"]*)"\s*,\s*([-+0-9.eE]+)""".r

  def parse(prj: String): Option[Parsed] =
    projRe.findFirstMatchIn(prj).map { pm =>
      val params = paramRe.findAllMatchIn(prj)
        .map(m => m.group(1).toLowerCase -> m.group(2).toDouble).toMap
      val (a, rf) = sphRe.findFirstMatchIn(prj)
        .map(m => (m.group(1).toDouble, m.group(2).toDouble))
        .getOrElse((6378137.0, 298.257223563))
      // the PROJCS-level UNIT is the LAST one (the GEOGCS's angular UNIT
      // comes first inside the nested block). With only one UNIT present it
      // is the angular one — proj4 then has no to_meter and applies no
      // scaling, so fall back to 1.0 rather than 0.01745…
      val units = unitRe.findAllMatchIn(prj).toSeq
      val toMeter =
        if (units.size >= 2) units.last.group(2).toDouble else 1.0
      Parsed(pm.group(1), params, a, rf, toMeter)
    }

  /** WGS84 reference es, computed exactly as proj4's deriveConstants does. */
  private val wgs84Es = es(6378137.0, 298.257223563)

  private def es(a: Double, rf: Double): Double = {
    val b = (1 - 1 / rf) * a
    val a2 = a * a; val b2 = b * b
    (a2 - b2) / a2
  }

  /** proj4 compare_datums envelope: no datum shift needed/applied. */
  def datumIsWgs84Compatible(p: Parsed): Boolean =
    p.a == 6378137.0 && Math.abs(es(p.a, p.rf) - wgs84Es) <= 5e-11

  /** (x, y) in CRS units → (lon, lat) degrees, for the LCC / Albers /
    * Transverse-Mercator families; None when the PROJECTION isn't one of
    * them. Throws (loud, not wrong) when the datum would need a real
    * shift. */
  def projcsTransform(prj: String): Option[(Double, Double) => (Double, Double)] =
    parse(prj).flatMap { p =>
      val name = p.projection.toLowerCase
      val isLcc = name.contains("lambert_conformal_conic") ||
        name.contains("lambert tangential conformal conic")
      val isAea = name.contains("albers")
      val isTm = name == "transverse_mercator" || name == "transverse mercator" ||
        name.contains("gauss_kruger")
      val isPolarStereo = name == "stereographic_south_pole" ||
        name == "polar stereographic (variant b)"
      if (!isLcc && !isAea && !isTm && !isPolarStereo) None
      else {
        require(datumIsWgs84Compatible(p),
          s"conic CRS needs a datum shift (a=${p.a}, rf=${p.rf}) — unsupported (reference's proj4 " +
            "would shift through geocentric; only WGS84/GRS80-compatible datums are bit-stable)")
        def deg(n: String): Option[Double] = p.params.get(n)
        val b = (1 - 1 / p.rf) * p.a
        val lat0 = deg("latitude_of_center").orElse(deg("latitude_of_origin"))
          .orElse(deg("standard_parallel_1")).getOrElse(0.0) * Proj.D2R
        val long0 = deg("central_meridian").orElse(deg("longitude_of_center"))
          .getOrElse(0.0) * Proj.D2R
        val x0 = deg("false_easting").getOrElse(0.0) * p.toMeter
        val y0 = deg("false_northing").getOrElse(0.0) * p.toMeter
        val k0 = deg("scale_factor").getOrElse(1.0)
        def lat1 = deg("standard_parallel_1").getOrElse(
          throw new IllegalArgumentException("conic .prj missing Standard_Parallel_1")) * Proj.D2R
        val inv: (Double, Double) => (Double, Double) =
          if (isPolarStereo) Proj.PolarStereo(p.a, b, lat1, long0, x0, y0, k0).inverse
          else if (isTm) Proj.Tmerc(p.a, b, lat0, long0, x0, y0, k0).inverse
          else if (isLcc) {
            val lat2 = deg("standard_parallel_2").map(_ * Proj.D2R).getOrElse(Double.NaN)
            Proj.Lcc(p.a, b, lat0, lat1, lat2, long0, x0, y0, k0).inverse
          } else {
            val lat2 = deg("standard_parallel_2").getOrElse(
              throw new IllegalArgumentException("albers .prj missing Standard_Parallel_2")) * Proj.D2R
            Proj.Aea(p.a, b, lat0, lat1, lat2, long0, x0, y0).inverse
          }
        Some { (x, y) =>
          // proj4 transform: projected input × to_meter, inverse, rad → deg
          val (lonR, latR) = inv(x * p.toMeter, y * p.toMeter)
          (lonR * Proj.R2D, latR * Proj.R2D)
        }
      }
    }
}
