package graft.codecs

import scala.collection.mutable
import graft.core._

/** KML ↔ GeoJSON, reproducing `/root/reference/src/KML.js` over the JSON
  * tree form, including the quirk contract (SURVEY.md §5.3 Q1–Q6, Q13):
  *
  *  - Style hoisted before other keys, StyleMap processed at its document
  *    position (Q1 net behavior, `KML.js:38-55`)
  *  - 2-hop style lookup join: styleUrl → Style | StyleMap→Pair[normal]
  *    → Style; merged with inline Style — inline wins for scalar keys,
  *    referenced style wins inside object-valued keys (`KML.js:177-206`)
  *  - Leaflet-ish style projection (`KML.js:208-261`): LineStyle/PolyStyle
  *    colors default to #000/1 when absent; PolyStyle `fill` never emitted
  *    (Q2); IconStyle hotSpot → iconAnchor
  *  - geometry recursion incl. MultiGeometry 1-type collapse (`KML.js:348-371`)
  *    and gx:Track / gx:MultiTrack (`KML.js:142-172`)
  *  - GroundOverlay → geometry-less feature; latLngBounds pairs are
  *    [lat,lng]-ordered (Q13, `KML.js:117-124`)
  *  - reverse: style dedup with one-directional key comparison (Q5,
  *    `KML.js:530-553`), only the last inner ring survives (Q4,
  *    `KML.js:574-579`), `stroke` falls through to `fill` (Q3,
  *    `KML.js:639-643`), unpadded alpha hex (Q6, `KML.js:656-662`)
  */
object KmlCodec {

  // =========================================================================
  // forward: kml -> geojson
  // =========================================================================

  def kml2Geojson(kml: String): JValue = {
    // `kml.replace(/\kml:/gi, "")` — strip every case-insensitive "kml:"
    // (`KML.js:8-10`)
    val cleaned =
      if (kml.contains("kml:")) kml.replaceAll("(?i)kml:", "") else kml
    val json = XmlJson.xml2Json(cleaned)
    val features = mutable.ArrayBuffer.empty[JValue]
    val style = mutable.LinkedHashMap.empty[String, JValue]
    json match {
      case o: JObj => o.get("kml").foreach(handle("kml", _, features, style))
      case _       => ()
    }
    JObj.of("type" -> JStr("FeatureCollection"), "features" -> JArr(features.toVector))
  }

  def kml2GeojsonString(kml: String): String = kml2Geojson(kml).render

  private def handle(tag: String, contain: JValue,
      features: mutable.ArrayBuffer[JValue],
      style: mutable.LinkedHashMap[String, JValue]): Unit = tag match {
    case "kml" | "Document" | "Folder" =>
      contain match {
        case JArr(items) => items.foreach(handle(tag, _, features, style))
        case o: JObj =>
          // Style hoisted first; StyleMap stays at its key position (Q1 net)
          o.get("Style").foreach(handle("Style", _, features, style))
          o.fields.foreach {
            case ("Style", _) => ()
            case (k, v)       => handle(k, v, features, style)
          }
        case _ => ()
      }
    case "Placemark" =>
      contain match {
        case JArr(items) => items.foreach(p => features += placemark2Feature(p, style))
        case p           => features += placemark2Feature(p, style)
      }
    case "Style" | "StyleMap" =>
      contain match {
        case JArr(items) => items.foreach {
          case s: JObj => s.get("@id").foreach(id => style(scalarStr(id)) = s)
          case _       => ()
        }
        case s: JObj => s.get("@id").foreach(id => style(scalarStr(id)) = s)
        case _       => ()
      }
    case "GroundOverlay" =>
      contain match {
        case JArr(items) => items.foreach(g => features += groundOverlay2Feature(g))
        case g           => features += groundOverlay2Feature(g)
      }
    case _ => ()
  }

  private def scalarStr(v: JValue): String = XmlJson.scalarText(v)

  private def truthy(v: JValue): Boolean = v match {
    case JNull    => false
    case JBool(b) => b
    case JNum(d)  => d != 0 && !d.isNaN
    case JStr(s)  => s.nonEmpty
    case _        => true
  }

  private def get(v: JValue, k: String): Option[JValue] = v match {
    case o: JObj => o.get(k)
    case _       => None
  }
  private def getT(v: JValue, k: String): Option[JValue] = get(v, k).filter(truthy)

  /** JS parseFloat over a JValue (numbers pass through). */
  private def pf(v: JValue): Double = v match {
    case JNum(d) => d
    case JStr(s) => XmlJson.jsParseFloat(s)
    case _       => Double.NaN
  }
  private def jnumOrNull(d: Double): JValue = if (d.isNaN || d.isInfinite) JNull else JNum(d)

  private def groundOverlay2Feature(g: JValue): JValue = {
    val props = mutable.ArrayBuffer.empty[(String, JValue)]
    getT(g, "name").foreach(v => props += ("name" -> v))
    getT(g, "description").foreach(v => props += ("description" -> v))
    get(g, "Icon").flatMap(getT(_, "href")).foreach(v => props += ("iconUrl" -> v))
    getT(g, "visibility").foreach(v => props += ("opacity" -> jnumOrNull(pf(v))))
    get(g, "LatLonBox").foreach { box =>
      // [lat,lng]-ordered pairs (Q13): [[south,west],[north,east]]
      val sw = JArr.of(jnumOrNull(pf(get(box, "south").getOrElse(JNull))),
        jnumOrNull(pf(get(box, "west").getOrElse(JNull))))
      val ne = JArr.of(jnumOrNull(pf(get(box, "north").getOrElse(JNull))),
        jnumOrNull(pf(get(box, "east").getOrElse(JNull))))
      props += ("latLngBounds" -> JArr.of(sw, ne))
    }
    JObj.of("type" -> JStr("Feature"), "properties" -> JObj(props.toVector),
      "geometry" -> JNull)
  }

  private def asArray(v: JValue): Vector[JValue] = v match {
    case JArr(items) => items
    case single      => Vector(single)
  }

  private def placemark2Feature(placemark: JValue,
      style: mutable.LinkedHashMap[String, JValue]): JValue = {
    val props = mutable.ArrayBuffer.empty[(String, JValue)]
    val styleOut = mutable.ArrayBuffer.empty[(String, JValue)]

    getT(placemark, "name").foreach(v => props += ("name" -> v))
    getT(placemark, "description").foreach(v => props += ("description" -> v))

    val geometry: JValue =
      if (get(placemark, "gx:Track").isDefined || get(placemark, "gx:MultiTrack").isDefined) {
        val track = get(placemark, "gx:MultiTrack") match {
          case Some(mt) => get(mt, "gx:Track").getOrElse(JObj(Vector.empty))
          case None     => get(placemark, "gx:Track").get
        }
        val coords = mutable.ArrayBuffer.empty[JValue]
        get(track, "gx:coord").foreach {
          case JArr(items) => items.foreach { ps =>
            val s = scalarStr(ps)
            if (s.trim.nonEmpty) {
              val parts = s.split(" ", -1)
              val x = if (parts.length > 0) XmlJson.jsParseFloat(parts(0)) else Double.NaN
              val y = if (parts.length > 1) XmlJson.jsParseFloat(parts(1)) else Double.NaN
              coords += JArr.of(jnumOrNull(x), jnumOrNull(y))
            }
          }
          case single => // single gx:coord leaf — treat as one entry (lenient)
            val s = scalarStr(single)
            if (s.trim.nonEmpty) {
              val parts = s.split(" ", -1)
              val x = if (parts.length > 0) XmlJson.jsParseFloat(parts(0)) else Double.NaN
              val y = if (parts.length > 1) XmlJson.jsParseFloat(parts(1)) else Double.NaN
              coords += JArr.of(jnumOrNull(x), jnumOrNull(y))
            }
        }
        get(track, "when").foreach(w => props += ("when" -> w))
        get(track, "ExtendedData").flatMap(get(_, "SchemaData"))
          .flatMap(get(_, "gx:SimpleArrayData")).foreach { sad =>
            asArray(sad).foreach { data =>
              for (n <- get(data, "@name"); v <- get(data, "gx:value"))
                props += (scalarStr(n) -> v)
            }
          }
        JObj.of("type" -> JStr("LineString"), "coordinates" -> JArr(coords.toVector))
      } else placemark2Geometry(placemark)

    // ---- style resolution (2-hop lookup join, `KML.js:177-206`) ----
    var geojsonStyle: Vector[(String, JValue)] = get(placemark, "Style") match {
      case Some(o: JObj) => o.fields
      case _             => Vector.empty
    }
    getT(placemark, "styleUrl").foreach { su =>
      val styleId = scalarStr(su).replaceFirst("#", "")
      style.get(styleId).foreach { entry =>
        val mStyle: Option[JValue] = get(entry, "Pair") match {
          case Some(pair) =>
            var styleId2: Option[String] = None
            asArray(pair).foreach { p =>
              if (getT(p, "key").exists(k => scalarStr(k) == "normal"))
                get(p, "styleUrl").foreach(s2 => styleId2 = Some(scalarStr(s2).replaceFirst("#", "")))
            }
            styleId2.flatMap(style.get)
          case None => Some(entry)
        }
        mStyle.foreach { ms =>
          val inline = mutable.LinkedHashMap(geojsonStyle: _*)
          val merged = mutable.LinkedHashMap(geojsonStyle: _*)
          val msFields = ms match { case o: JObj => o.fields; case _ => Vector.empty }
          // tempKeys = keys of assign({}, inline, mStyle): inline order first
          val tempKeys = (inline.keys ++ msFields.map(_._1)).toSeq.distinct
          tempKeys.foreach { tk =>
            inline.get(tk) match {
              case Some(o: JObj) =>
                // object-valued: mStyle wins per inner key
                val over = msFields.collectFirst { case (`tk`, v: JObj) => v.fields }
                  .getOrElse(msFields.collectFirst { case (`tk`, v) => Vector("#" -> v) }.getOrElse(Vector.empty))
                val m2 = mutable.LinkedHashMap(o.fields: _*)
                over.foreach { case (k, v) => m2(k) = v }
                merged(tk) = JObj(m2.toVector)
              case Some(_) => () // scalar inline wins
              case None =>
                msFields.collectFirst { case (`tk`, v) => v }.foreach(v => merged(tk) = v)
            }
          }
          geojsonStyle = merged.toVector
        }
      }
    }

    // ---- style projection (`KML.js:208-261`) ----
    geojsonStyle.foreach {
      case ("IconStyle", is) =>
        get(is, "Icon").flatMap(get(_, "href")).filter(truthy)
          .foreach(v => styleOut += ("iconUrl" -> v))
        getT(is, "scale").foreach(v => styleOut += ("scale" -> jnumOrNull(pf(v))))
        getT(is, "color").foreach { c =>
          val (hex, op) = abgr2Color(c)
          styleOut += ("color" -> JStr(hex))
          styleOut += ("opacity" -> op)
        }
        get(is, "hotSpot").foreach { hs =>
          val x = pf(get(hs, "@x").getOrElse(JNull))
          val y = pf(get(hs, "@y").getOrElse(JNull))
          styleOut += ("iconAnchor" -> JArr.of(jnumOrNull(x), jnumOrNull(y)))
        }
      case ("LineStyle", ls) =>
        // color always emitted — missing color → default #000 / 1 (`KML.js:233-239`)
        val (hex, op) = abgr2Color(get(ls, "color").getOrElse(JNull))
        styleOut += ("color" -> JStr(hex))
        styleOut += ("opacity" -> op)
        val width = pf(get(ls, "width").getOrElse(JNull))
        if (!width.isNaN && width != 0) styleOut += ("weight" -> JNum(width))
      case ("PolyStyle", ps) =>
        val (hex, op) = abgr2Color(get(ps, "color").getOrElse(JNull))
        styleOut += ("fillColor" -> JStr(hex))
        styleOut += ("fillOpacity" -> op)
        // Q2: `fill` is never emitted (parseInt of an undefined self-reference)
        val stroke = jsParseInt(get(ps, "outline").getOrElse(JNull))
        if (stroke != 0 && stroke != Long.MinValue)
          styleOut += ("stroke" -> JNum(stroke.toDouble))
      case _ => ()
    }

    JObj.of(
      "type" -> JStr("Feature"),
      "properties" -> JObj(props.toVector),
      "style" -> JObj(styleOut.toVector),
      "geometry" -> geometry)
  }

  /** JS parseInt (radix 10) over a JValue; Long.MinValue marks NaN. */
  private def jsParseInt(v: JValue): Long = {
    val s = v match {
      case JNum(d)  => Json.num(d)
      case JStr(t)  => t
      case _        => return Long.MinValue
    }
    val t = s.dropWhile(_.isWhitespace)
    val neg = t.startsWith("-")
    val body = t.dropWhile(c => c == '+' || c == '-').takeWhile(_.isDigit)
    if (body.isEmpty) Long.MinValue
    else {
      val n = try body.toLong catch { case _: NumberFormatException => return Long.MinValue }
      if (neg) -n else n
    }
  }

  /** `abgr2Color` (`KML.js:412-422`). Returns (hex, opacity JValue). */
  def abgr2Color(v: JValue): (String, JValue) = v match {
    case JStr(s) if s.length == 8 =>
      val hex = "#" + s.substring(6, 8) + s.substring(4, 6) + s.substring(2, 4)
      val a = try Integer.parseInt(s.substring(0, 2), 16).toDouble
        catch { case _: NumberFormatException => Double.NaN }
      val op = if (a.isNaN) JNull else JNum(Math.round(a / 255.0 * 100.0).toDouble / 100.0)
      (hex, op)
    case _ => ("#000", JNum(1))
  }

  private def placemark2Geometry(placemark: JValue): JValue = {
    def coordScalar(v: JValue): String = scalarStr(v)

    def pointCoords(p: JValue): JValue = {
      val s = get(p, "coordinates").map(coordScalar).getOrElse("")
        .replaceAll("[\\t\\n]", "")
      if (s.trim.nonEmpty) {
        val parts = s.split(",", -1)
        val x = if (parts.length > 0) XmlJson.jsParseFloat(parts(0)) else Double.NaN
        val y = if (parts.length > 1) XmlJson.jsParseFloat(parts(1)) else Double.NaN
        JArr.of(jnumOrNull(x), jnumOrNull(y))
      } else JArr(Vector.empty)
    }

    def lineCoords(l: JValue): JValue = {
      val s = get(l, "coordinates").map(coordScalar).getOrElse("").trim
      val out = mutable.ArrayBuffer.empty[JValue]
      s.split("[\\t\\n\\s]", -1).foreach { ps =>
        if (ps.trim.nonEmpty) {
          val parts = ps.split(",", -1)
          val x = if (parts.length > 0) XmlJson.jsParseFloat(parts(0)) else Double.NaN
          val y = if (parts.length > 1) XmlJson.jsParseFloat(parts(1)) else Double.NaN
          out += JArr.of(jnumOrNull(x), jnumOrNull(y))
        }
      }
      JArr(out.toVector)
    }

    def boundary2Coordinates(b: JValue): JValue =
      lineCoords(get(b, "LinearRing").getOrElse(JObj(Vector.empty)))

    def boundarys2Coordinates(poly: JValue): JValue = {
      val out = mutable.ArrayBuffer.empty[JValue]
      Seq("outerBoundaryIs", "innerBoundaryIs").foreach { bi =>
        get(poly, bi).foreach { bs =>
          asArray(bs).foreach(b => out += boundary2Coordinates(b))
        }
      }
      JArr(out.toVector)
    }

    get(placemark, "Point") match {
      case Some(JArr(items)) =>
        JObj.of("type" -> JStr("MultiPoint"),
          "coordinates" -> JArr(items.map(pointCoords)))
      case Some(p) =>
        JObj.of("type" -> JStr("Point"), "coordinates" -> pointCoords(p))
      case None => get(placemark, "LineString") match {
        case Some(JArr(items)) =>
          JObj.of("type" -> JStr("MultiLineString"),
            "coordinates" -> JArr(items.map(lineCoords)))
        case Some(l) =>
          JObj.of("type" -> JStr("LineString"), "coordinates" -> lineCoords(l))
        case None => get(placemark, "Polygon") match {
          case Some(JArr(items)) =>
            JObj.of("type" -> JStr("MultiPolygon"),
              "coordinates" -> JArr(items.map(boundarys2Coordinates)))
          case Some(p) =>
            JObj.of("type" -> JStr("Polygon"), "coordinates" -> boundarys2Coordinates(p))
          case None => get(placemark, "MultiGeometry") match {
            case Some(mg: JObj) =>
              if (mg.fields.length > 1) {
                val geoms = mutable.ArrayBuffer.empty[JValue]
                mg.fields.foreach { case (tpe, v) =>
                  asArray(v).foreach { g =>
                    geoms += placemark2Geometry(JObj.of(tpe -> g))
                  }
                }
                JObj.of("type" -> JStr("GeometryCollection"),
                  "geometries" -> JArr(geoms.toVector))
              } else placemark2Geometry(mg)
            case _ => JObj(Vector.empty) // no geometry keys → {} (quirk)
          }
        }
      }
    }
  }

  // =========================================================================
  // reverse: geojson -> kml
  // =========================================================================

  def geojson2Kml(geojsonString: String): String = geojson2Kml(Json.parse(geojsonString))

  def geojson2Kml(json: JValue): String = {
    val placemarks = mutable.ArrayBuffer.empty[JValue]
    val styles = mutable.ArrayBuffer.empty[Vector[(String, JValue)]]
    val root = json match {
      case o: JObj if o("type") == JStr("Feature") || o("type") == JStr("FeatureCollection") => o
      case g => JObj.of("type" -> JStr("Feature"), "geometry" -> g,
        "properties" -> JObj(Vector.empty))
    }
    walkFeature(root, placemarks, styles)
    val kmljson = JObj.of(
      "@xmlns" -> JStr("http://www.opengis.net/kml/2.2"),
      "@xmlns:gx" -> JStr("http://www.google.com/kml/ext/2.2"),
      "@xmlns:kml" -> JStr("http://www.opengis.net/kml/2.2"),
      "@xmlns:atom" -> JStr("http://www.w3.org/2005/Atom"),
      "Document" -> JObj.of(
        "Style" -> JArr(styles.toVector.zipWithIndex.map { case (s, i) => style2KmlStyle(s, i) }),
        "Placemark" -> JArr(placemarks.toVector)))
    XmlJson.json2XmlString(kmljson, "kml")
  }

  /** Geometry into a placemark-shaped mutable object (`KML.js:473-527`). */
  private def geomInto(g: JValue, pm: mutable.LinkedHashMap[String, JValue]): Unit = g match {
    case o: JObj =>
      o("type") match {
        case JStr(t @ ("Point" | "LineString" | "Polygon")) =>
          val newPm = geometry2Placemark(t, o("coordinates"))
          pm.get(t) match {
            case Some(JArr(items)) => pm(t) = JArr(items :+ newPm)
            case Some(single)      => pm(t) = JArr.of(single, newPm)
            case None              => pm(t) = newPm
          }
        case JStr(t @ ("MultiPoint" | "MultiLineString" | "MultiPolygon")) =>
          val sub = t.replace("Multi", "")
          // `placemark.MultiGeometry = {}` — unconditional overwrite (a second
          // Multi* sibling in a GeometryCollection clobbers the first; quirk)
          val mg = mutable.LinkedHashMap.empty[String, JValue]
          o("coordinates") match {
            case JArr(items) => items.foreach { c =>
              geomInto(JObj.of("type" -> JStr(sub), "coordinates" -> c), mg)
            }
            case _ => ()
          }
          pm("MultiGeometry") = JObj(mg.toVector)
        case JStr("GeometryCollection") =>
          val mg = mutable.LinkedHashMap.empty[String, JValue]
          o("geometries") match {
            case JArr(items) => items.foreach(geomInto(_, mg))
            case _           => ()
          }
          pm("MultiGeometry") = JObj(mg.toVector)
        case _ => ()
      }
    case _ => ()
  }

  private def walkFeature(g: JValue, placemarks: mutable.ArrayBuffer[JValue],
      styles: mutable.ArrayBuffer[Vector[(String, JValue)]]): Unit = g match {
    case o: JObj =>
      o("type") match {
        case JStr("Feature") =>
          val pm = mutable.LinkedHashMap.empty[String, JValue]
          geomInto(o("geometry"), pm)
          val props = o("properties")
          getT(props, "name").foreach(v => pm("name") = v)
          getT(props, "description").foreach(v => pm("description") = v)
          pm("styleUrl") = JStr(featureStyle(o, styles))
          placemarks += JObj(pm.toVector)
        case JStr("FeatureCollection") =>
          o("features") match {
            case JArr(items) => items.foreach(walkFeature(_, placemarks, styles))
            case _           => ()
          }
        case _ => ()
      }
    case _ => ()
  }

  /** Style dedup-or-assign (`KML.js:530-553`): one-directional comparison over
    * the NEW style's keys only; object/array values never compare equal
    * (JS reference inequality); LAST matching index wins; ids 1-based. */
  private def featureStyle(feature: JObj,
      styles: mutable.ArrayBuffer[Vector[(String, JValue)]]): String = {
    val tempStyle: Vector[(String, JValue)] = feature.get("style") match {
      case Some(o: JObj) => o.fields
      case _             => Vector.empty
    }
    def scalarEq(a: JValue, b: JValue): Boolean = (a, b) match {
      case (JNum(x), JNum(y))   => x == y
      case (JStr(x), JStr(y))   => x == y
      case (JBool(x), JBool(y)) => x == y
      case (JNull, JNull)       => true
      case _                    => false // arrays/objects: reference inequality
    }
    var styleId = 0
    styles.zipWithIndex.foreach { case (s, index) =>
      val sMap = s.toMap
      val addStyle = tempStyle.exists { case (t, v) =>
        !sMap.get(t).exists(scalarEq(v, _))
      }
      if (!addStyle) styleId = index + 1
    }
    if (styleId == 0) {
      styles += tempStyle
      styleId = styles.length
    }
    "custom" + styleId
  }

  /** `geometry2Placemark` (`KML.js:555-583`). */
  private def geometry2Placemark(tpe: String, coordinates: JValue): JValue = {
    def jsJoin(v: JValue, sep: String): String = v match {
      case JArr(items) => items.map {
        case JArr(inner) => inner.map(scalarStr).mkString(",") // nested stringify
        case s           => scalarStr(s)
      }.mkString(sep)
      case other => scalarStr(other)
    }
    tpe match {
      case "Point" =>
        JObj.of("coordinates" -> JStr(jsJoin(coordinates, ",")))
      case "LineString" =>
        JObj.of("tessellate" -> JNum(1), "coordinates" -> JStr(jsJoin(coordinates, " ")))
      case "Polygon" =>
        val rings = coordinates match { case JArr(items) => items; case _ => Vector.empty[JValue] }
        val fields = mutable.ArrayBuffer[(String, JValue)]("tessellate" -> JNum(1))
        if (rings.nonEmpty) {
          fields += ("outerBoundaryIs" -> JObj.of("LinearRing" ->
            JObj.of("coordinates" -> JStr(jsJoin(rings.head, " ")))))
          // Q4: each hole overwrites `innerBoundaryIs` — only the last survives
          rings.tail.foreach { ring =>
            val inner = ("innerBoundaryIs" -> (JObj.of("LinearRing" ->
              JObj.of("coordinates" -> JStr(jsJoin(ring, " ")))): JValue))
            val idx = fields.indexWhere(_._1 == "innerBoundaryIs")
            if (idx >= 0) fields(idx) = inner else fields += inner
          }
        }
        JObj(fields.toVector)
      case _ => JObj(Vector.empty)
    }
  }

  /** `geojsonStyle2KmlStyle` (`KML.js:585-654`) incl. Q3 fall-through. */
  private def style2KmlStyle(style1: Vector[(String, JValue)], index: Int): JValue = {
    val temp = mutable.LinkedHashMap[String, JValue]("@id" -> JStr("custom" + (index + 1)))
    val styleMap = style1.toMap
    def sub(name: String): mutable.LinkedHashMap[String, JValue] = {
      temp.get(name) match {
        case Some(o: JObj) =>
          val m = mutable.LinkedHashMap(o.fields: _*)
          m
        case _ => mutable.LinkedHashMap.empty[String, JValue]
      }
    }
    def put(name: String, m: mutable.LinkedHashMap[String, JValue]): Unit =
      temp(name) = JObj(m.toVector)

    style1.foreach { case (s, v) =>
      // shell creation (first switch, `KML.js:594-616`)
      s match {
        case "iconUrl" | "iconAnchor" | "scale" =>
          if (!temp.contains("IconStyle")) temp("IconStyle") = JObj(Vector.empty)
        case "color" | "weight" =>
          if (!temp.contains("LineStyle")) temp("LineStyle") = JObj(Vector.empty)
        case "stroke" | "fill" | "fillColor" =>
          if (!temp.contains("PolyStyle")) temp("PolyStyle") = JObj(Vector.empty)
        case _ => ()
      }
      // value mapping (second switch, `KML.js:618-647`)
      s match {
        case "iconUrl" =>
          val m = sub("IconStyle"); m("Icon") = JObj.of("href" -> v); put("IconStyle", m)
        case "iconAnchor" =>
          val m = sub("IconStyle")
          val (x, y) = v match {
            case JArr(items) if items.length >= 2 => (items(0), items(1))
            case _ => (JNull, JNull)
          }
          m("hotSpot") = JObj.of("@x" -> x, "@y" -> y,
            "@xunits" -> JStr("pixels"), "@yunits" -> JStr("pixels"))
          put("IconStyle", m)
        case "scale" =>
          val m = sub("IconStyle"); m("scale") = v; put("IconStyle", m)
        case "color" =>
          val m = sub("LineStyle")
          m("color") = JStr(color2Abgr(v, styleMap.getOrElse("opacity", JNull)))
          put("LineStyle", m)
        case "weight" =>
          val m = sub("LineStyle"); m("width") = v; put("LineStyle", m)
        case "stroke" =>
          // Q3: missing break — sets outline AND falls through to fill
          val m = sub("PolyStyle")
          m("outline") = v
          m("fill") = styleMap.getOrElse("fill", XmlJson.UndefinedText)
          put("PolyStyle", m)
        case "fill" =>
          val m = sub("PolyStyle"); m("fill") = v; put("PolyStyle", m)
        case "fillColor" =>
          val m = sub("PolyStyle")
          m("color") = JStr(color2Abgr(v, styleMap.getOrElse("fillOpacity", JNull)))
          put("PolyStyle", m)
        case _ => ()
      }
    }
    JObj(temp.toVector)
  }

  /** `color2Abgr` (`KML.js:656-662`): unpadded alpha hex (Q6), #-strip,
    * RGB→BGR by JS slice semantics. */
  def color2Abgr(colorV: JValue, opacityV: JValue): String = {
    val color = XmlJson.scalarText(colorV).replaceFirst("#", "")
    val opacity = opacityV match {
      case JNum(d) if d != 0 && !d.isNaN => d
      case JStr(s) if s.nonEmpty =>
        val d = XmlJson.jsNumber(s).getOrElse(Double.NaN)
        if (!d.isNaN && d != 0) d else 1.0
      case _ => 1.0
    }
    val a = (opacity * 255).toLong // JS parseInt truncation
    def slice(s: String, a: Int, b: Int): String = {
      val from = Math.min(Math.max(a, 0), s.length)
      val to = Math.min(Math.max(b, 0), s.length)
      if (to <= from) "" else s.substring(from, to)
    }
    java.lang.Long.toString(a, 16) + slice(color, 4, 6) + slice(color, 2, 4) + slice(color, 0, 2)
  }
}
