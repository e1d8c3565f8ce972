package graft.core

/** Minimal ESRI .prj (WKT1) reader for the CRS gate.
  *
  * Mirrors the parameter aliasing of the reference's proj4 WKT path
  * (`/root/reference/lib/proj4.js` wkt module): parameter names matched
  * case-insensitively with first-mapping-wins precedence (latitude_of_center
  * → latitude_of_origin → standard_parallel_1 for lat0); angles converted
  * with the D2R literal; false easting/northing scaled by the projected UNIT
  * factor at parse time; the linear unit factor also pre-multiplies input
  * coordinates before the inverse projection; b derived from the SPHEROID's
  * inverse flattening as (1 − 1/rf)·a.
  *
  * Datum handling mirrors the bundle end-to-end (core.Datum): datums inside
  * the compare_datums envelope (a == 6378137, |Δes| ≤ 5e-11 — WGS84 vs
  * NAD83/GRS80) shift nothing; every other datum goes through the bundle's
  * geocentric round-trip with the 3/7-parameter Helmert when the WKT DATUM
  * name reaches a towgs84 table entry (OSGB 1936, Potsdam, CH1903, …) and a
  * pure ellipsoid swap otherwise (e.g. NAD27/Clarke 1866 — its table key is
  * unreachable from the ESRI name, so the reference itself applies no
  * parameter shift; verified against the live bundle).
  */
object PrjWkt {

  final case class Parsed(
      projection: String,
      params: Map[String, Double],   // lowercased PARAMETER name → value
      a: Double, rf: Double,
      toMeter: Double,
      datumName: Option[String])

  private val projRe = """PROJECTION\["([^"]+)"\]""".r
  private val paramRe = """PARAMETER\["([^"]+)"\s*,\s*([-+0-9.eE]+)\]""".r
  private val sphRe = """SPHEROID\["[^"]*"\s*,\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)""".r
  private val unitRe = """UNIT\["([^"]*)"\s*,\s*([-+0-9.eE]+)""".r
  private val datumRe = """DATUM\["([^"]+)"""".r

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
      Parsed(pm.group(1), params, a, rf, toMeter,
        datumRe.findFirstMatchIn(prj).map(_.group(1)))
    }

  /** proj4 compare_datums envelope: no datum shift needed/applied (kept for
    * callers that want the cheap check; projcsTransform now shifts the rest
    * through core.Datum instead of throwing). */
  def datumIsWgs84Compatible(p: Parsed): Boolean =
    p.a == 6378137.0 && Math.abs(Datum.derivedEs(p.a, p.rf) - Datum.derivedEs(6378137.0, 298.257223563)) <= 5e-11

  /** (x, y) in CRS units → (lon, lat) degrees for EVERY PROJECTION family
    * the reference's proj4 WKT path can map to finite output: LCC, Albers,
    * Transverse Mercator, polar `stere` (south pole / variant B), double
    * stereographic `sterea` (Stereographic_North_Pole / Oblique_Stereographic
    * / Polar_Stereographic), Lambert Azimuthal Equal-Area, Mercator (incl.
    * the ESRI auxiliary-sphere branch), Azimuthal Equidistant,
    * Cassini-Soldner, Equirectangular/Equidistant Cylindrical, Equidistant
    * Conic, Krovak, Miller Cylindrical, Mollweide, New Zealand Map Grid,
    * Polyconic, Sinusoidal, and Van der Grinten I. None when the PROJECTION
    * isn't one of them (callers throw loudly — e.g. Hotine, whose WKT path
    * is BROKEN in the live bundle: azimuth never maps to alpha, long0 stays
    * NaN, output is NaN — a loud error beats replicating NaN; `cea`, `gnom`,
    * `somerc`, and proj-string-only `utm` have no WKT names in the bundle). */
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
      val isSterea = name == "stereographic_north_pole" ||
        name == "oblique_stereographic" || name == "polar_stereographic" ||
        name == "oblique stereographic alternative"
      val isLaea = name == "lambert_azimuthal_equal_area" ||
        name == "lambert azimuthal equal area"
      val isMerc = name == "mercator" || name == "mercator_1sp" ||
        name == "mercator_auxiliary_sphere" ||
        name == "popular visualisation pseudo mercator"
      val isAeqd = name == "azimuthal_equidistant"
      val isCass = name == "cassini" || name == "cassini_soldner"
      val isEqc = name == "equirectangular" || name == "equidistant_cylindrical"
      val isEqdc = name == "equidistant_conic"
      val isKrovak = name == "krovak"
      val isMill = name == "miller_cylindrical"
      val isMoll = name == "mollweide"
      val isNzmg = name == "new_zealand_map_grid"
      val isPoly = name == "polyconic"
      val isSinu = name == "sinusoidal"
      val isVandg = name == "van_der_grinten_i" || name == "vandergrinten"
      val known = isLcc || isAea || isTm || isPolarStereo || isSterea || isLaea ||
        isMerc || isAeqd || isCass || isEqc || isEqdc || isKrovak || isMill ||
        isMoll || isNzmg || isPoly || isSinu || isVandg
      if (!known) None
      else {
        def deg(n: String): Option[Double] = p.params.get(n)
        val a = p.a
        val b = (1 - 1 / p.rf) * a
        val es = Datum.derivedEs(a, p.rf)
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
          if (isPolarStereo) Proj.PolarStereo(a, b, lat1, long0, x0, y0, k0).inverse
          else if (isSterea) Proj.Sterea(a, es, lat0, long0, x0, y0, k0).inverse
          else if (isLaea) Proj.Laea(a, es, lat0, long0, x0, y0).inverse
          else if (isMerc) {
            // the wkt module sets `sphere` ONLY for an exact-case
            // Mercator_Auxiliary_Sphere PROJECTION on a wgs_1984 datum (the
            // ESRI Web-Mercator contract); the ESRI path never maps
            // Standard_Parallel_1 → lat_ts, so k0 = Scale_Factor or 1
            val sphere = p.projection == "Mercator_Auxiliary_Sphere" &&
              p.datumName.exists(Datum.isWgs1984Name)
            Proj.Merc(a, b, long0, x0, y0, k0, sphere).inverse
          }
          else if (isAeqd) Proj.Aeqd(a, es, lat0, long0, x0, y0).inverse
          else if (isCass) Proj.Cass(a, es, lat0, long0, x0, y0).inverse
          else if (isEqc) Proj.Eqc(a, lat0, long0, x0, y0).inverse
          else if (isEqdc) {
            val lat2 = deg("standard_parallel_2").map(_ * Proj.D2R).getOrElse(Double.NaN)
            Proj.Eqdc(a, b, lat0, lat1, lat2, long0, x0, y0).inverse
          }
          else if (isKrovak) {
            // the bundle maps Longitude_Of_Center to longc, which feeds
            // long0 ONLY for Albers/LAEA — krovak gets its built-in Ferro
            // default unless Central_Meridian is present (verified live)
            val kLong0 = deg("central_meridian").getOrElse(0.0) * Proj.D2R
            Proj.Krovak(lat0, kLong0, k0).inverse
          }
          else if (isMill) Proj.Mill(a, long0, x0, y0).inverse
          else if (isMoll) Proj.Moll(a, long0, x0, y0).inverse
          else if (isNzmg) Proj.Nzmg(a, lat0, long0, x0, y0).inverse
          else if (isPoly) Proj.Poly(a, b, lat0, long0, x0, y0).inverse
          else if (isSinu) Proj.Sinu(a, es, long0, x0, y0).inverse
          else if (isVandg) Proj.Vandg(a, long0, x0, y0).inverse
          else if (isTm) Proj.Tmerc(a, b, lat0, long0, x0, y0, k0).inverse
          else if (isLcc) {
            val lat2 = deg("standard_parallel_2").map(_ * Proj.D2R).getOrElse(Double.NaN)
            Proj.Lcc(a, b, lat0, lat1, lat2, long0, x0, y0, k0).inverse
          } else {
            val lat2 = deg("standard_parallel_2").getOrElse(
              throw new IllegalArgumentException("albers .prj missing Standard_Parallel_2")) * Proj.D2R
            Proj.Aea(a, b, lat0, lat1, lat2, long0, x0, y0).inverse
          }
        // datum step (no-op inside the compare_datums envelope): the
        // bundle's geocentric round-trip + optional Helmert
        val shift = Datum.shiftToWgs84(
          Datum.spec(p.datumName.map(Datum.datumCode).getOrElse("wgs84"), a, p.rf))
        Some { (x, y) =>
          // proj4 transform: projected input × to_meter, inverse, datum, rad → deg
          val (lonR0, latR0) = inv(x * p.toMeter, y * p.toMeter)
          val (lonR, latR) = shift match {
            case Some(f) => f(lonR0, latR0)
            case None => (lonR0, latR0)
          }
          (lonR * Proj.R2D, latR * Proj.R2D)
        }
      }
    }
}
