package graft.codecs

import scala.collection.mutable
import graft.core._

/** GPX ↔ GeoJSON, reproducing `/root/reference/src/GPX.js` document-level
  * semantics over the JSON tree form (JValue), including its quirks:
  *
  *  - wpt → Point with properties name/cmt/desc/time copied when present
  *    (`GPX.js:57-73`; absent keys are dropped by JSON.stringify)
  *  - trk → LineString over trkseg.trkpt; single trkpt → Point
  *    (`GPX.js:75-100`); multiple trksegs (array) → `geometry: {}` with no
  *    type/coordinates (the reference reads `contain.trkseg.trkpt` which is
  *    undefined on arrays — quirk)
  *  - rte → LineString over rtept; single → Point (`GPX.js:102-127`)
  *  - reverse: Point→wpt, LineString→rte, Multi-geometries/collections recurse,
  *    Polygon/MultiPolygon silently dropped (quirk Q10, `GPX.js:180-216`)
  */
object GpxCodec {

  def gpx2Geojson(gpx: String): JValue = {
    val json = XmlJson.xml2Json(gpx)
    val features = mutable.ArrayBuffer.empty[JValue]
    json match {
      case o: JObj =>
        o.get("gpx").foreach {
          case root: JObj =>
            root.fields.foreach { case (tag, contain) => handle(tag, contain, features) }
          case _ => ()
        }
      case _ => ()
    }
    JObj.of("type" -> JStr("FeatureCollection"), "features" -> JArr(features.toVector))
  }

  def gpx2GeojsonString(gpx: String): String = gpx2Geojson(gpx).render

  private def handle(tag: String, contain: JValue, out: mutable.ArrayBuffer[JValue]): Unit = {
    val fn: Option[JValue => JValue] = tag match {
      case "wpt" => Some(waypoint2Feature)
      case "trk" => Some(track2Feature)
      case "rte" => Some(route2Feature)
      case _     => None
    }
    fn.foreach { f =>
      contain match {
        case JArr(items) => items.foreach(c => out += f(c))
        case single      => out += f(single)
      }
    }
  }

  /** properties include only present keys (undefined dropped at stringify). */
  private def props(contain: JValue, keys: String*): Vector[(String, JValue)] =
    contain match {
      case o: JObj => keys.flatMap(k => o.get(k).map(k -> _)).toVector
      case _       => Vector.empty
    }

  private def lonLat(o: JValue): Option[(JValue, JValue)] = o match {
    case obj: JObj =>
      for { lon <- obj.get("@lon"); lat <- obj.get("@lat") } yield (lon, lat)
    case _ => None
  }

  private def waypoint2Feature(contain: JValue): JValue = {
    val coords = lonLat(contain) match {
      case Some((lon, lat)) => JArr.of(lon, lat)
      case None             => JArr.of(JNull, JNull) // undefined attrs → null in JSON
    }
    JObj.of(
      "type" -> JStr("Feature"),
      "properties" -> JObj(props(contain, "name", "cmt", "desc", "time")),
      "geometry" -> JObj.of("type" -> JStr("Point"), "coordinates" -> coords))
  }

  private def pointsGeometry(pts: JValue): Vector[(String, JValue)] = pts match {
    case JArr(items) =>
      val coords = items.map { p =>
        lonLat(p) match {
          case Some((lon, lat)) => JArr.of(lon, lat)
          case None             => JArr.of(JNull, JNull)
        }
      }
      Vector("type" -> JStr("LineString"), "coordinates" -> JArr(coords))
    case single =>
      lonLat(single) match {
        case Some((lon, lat)) =>
          Vector("type" -> JStr("Point"), "coordinates" -> JArr.of(lon, lat))
        case None =>
          Vector("type" -> JStr("Point"), "coordinates" -> JArr.of(JNull, JNull))
      }
  }

  private def track2Feature(contain: JValue): JValue = {
    val geometry: JValue = contain match {
      case o: JObj =>
        o.get("trkseg") match {
          case Some(seg: JObj) =>
            seg.get("trkpt") match {
              case Some(pts) => JObj(pointsGeometry(pts))
              case None      => JObj(Vector.empty) // quirk: geometry {}
            }
          // trkseg is an array (multi-seg) or scalar → `.trkpt` undefined → {}
          case _ => JObj(Vector.empty)
        }
      case _ => JObj(Vector.empty)
    }
    JObj.of(
      "type" -> JStr("Feature"),
      "properties" -> JObj(props(contain, "name")),
      "geometry" -> geometry)
  }

  private def route2Feature(contain: JValue): JValue = {
    val geometry: JValue = contain match {
      case o: JObj =>
        o.get("rtept") match {
          case Some(pts) => JObj(pointsGeometry(pts))
          case None      => JObj(Vector.empty)
        }
      case _ => JObj(Vector.empty)
    }
    JObj.of(
      "type" -> JStr("Feature"),
      "properties" -> JObj(props(contain, "name")),
      "geometry" -> geometry)
  }

  // ---------- geojson -> gpx ----------

  def geojson2Gpx(json: JValue): String = {
    val wpt = mutable.ArrayBuffer.empty[JValue]
    val rte = mutable.ArrayBuffer.empty[JValue]
    val root = json match {
      case o: JObj if o("type") == JStr("Feature") || o("type") == JStr("FeatureCollection") => o
      case g => JObj.of("type" -> JStr("Feature"), "geometry" -> g, "properties" -> JObj(Vector.empty))
    }
    walk(root, wpt, rte, JObj(Vector.empty))
    val gpxjson = JObj.of(
      "@xmlns" -> JStr("http://www.topografix.com/GPX/1/1"),
      "@version" -> JStr("1.1"),
      "@creator" -> JStr("GeoConvert"),
      "metadata" -> JObj.of("name" -> JStr("Geojson to GPX")),
      "wpt" -> JArr(wpt.toVector),
      "rte" -> JArr(rte.toVector))
    XmlJson.json2XmlString(gpxjson, "gpx")
  }

  def geojson2Gpx(geojsonString: String): String = geojson2Gpx(Json.parse(geojsonString))

  private def walk(g: JValue, wpt: mutable.ArrayBuffer[JValue],
      rte: mutable.ArrayBuffer[JValue], properties: JValue): Unit = g match {
    case o: JObj =>
      o("type") match {
        case JStr("Point") =>
          val c = o("coordinates").asInstanceOf[JArr]
          val name: JValue = properties match {
            case p: JObj => p.get("name").filter(truthy).getOrElse(JStr(""))
            case _       => JStr("")
          }
          wpt += JObj.of("@lon" -> c(0), "@lat" -> c(1), "name" -> name)
        case JStr("LineString") =>
          val pts = o("coordinates") match {
            case JArr(items) => items.map {
              case JArr(xy) => JObj.of("@lon" -> xy(0), "@lat" -> xy(1))
              case _        => JObj(Vector.empty)
            }
            case _ => Vector.empty[JValue]
          }
          val name: JValue = properties match {
            case p: JObj => p.get("name").filter(truthy).getOrElse(JStr(""))
            case _       => JStr("")
          }
          rte += JObj.of("rtept" -> JArr(pts), "name" -> name)
        case JStr("MultiPoint") | JStr("MultiLineString") =>
          val sub = if (o("type") == JStr("MultiPoint")) "Point" else "LineString"
          o("coordinates") match {
            case JArr(items) => items.foreach { c =>
              walk(JObj.of("type" -> JStr(sub), "coordinates" -> c), wpt, rte, properties)
            }
            case _ => ()
          }
        case JStr("GeometryCollection") =>
          o("geometries") match {
            case JArr(items) => items.foreach(walk(_, wpt, rte, properties))
            case _           => ()
          }
        case JStr("Feature") =>
          walk(o("geometry"), wpt, rte, o("properties"))
        case JStr("FeatureCollection") =>
          o("features") match {
            // note: the reference drops `properties` here (passes undefined)
            case JArr(items) => items.foreach(walk(_, wpt, rte, JObj(Vector.empty)))
            case _           => ()
          }
        case _ => () // Polygon / MultiPolygon silently dropped (Q10)
      }
    case _ => ()
  }

  private def truthy(v: JValue): Boolean = v match {
    case JNull          => false
    case JBool(b)       => b
    case JNum(d)        => d != 0 && !d.isNaN
    case JStr(s)        => s.nonEmpty
    case _              => true
  }
}
