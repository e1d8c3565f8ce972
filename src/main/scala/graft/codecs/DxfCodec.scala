package graft.codecs

import scala.collection.mutable
import graft.core._

/** DXF → GeoJSON, mirroring `/root/reference/src/DXF.js` line-for-line
  * behavior over the split-line representation:
  *
  *  - sections located by exact value lines HEADER/TABLES/BLOCKS/ENTITIES
  *    (`DXF.js:71-100`); entities framed by literal "  0" code lines,
  *    POLYLINE runs to SEQEND (`DXF.js:469-495`)
  *  - group-code value typing table (`DXF.js:497-547`)
  *  - codes 39/48/50 all set startAngle AND endAngle AND their named field
  *    (stray `case "ARC":` labels + missing breaks — Q12, `DXF.js:418-427`);
  *    code 51 sets endAngle + textOblique
  *  - codes 60/62/70 all decode bit0 OR bit5 of the binary string
  *    (`DXF.js:439-446`)
  *  - LWPOLYLINE bulge → arc via bulge2arc/segmentize at 10° steps
  *    (`DXF.js:28,574-618`); CIRCLE = segmentize(0,360)+close+closed=1
  *  - HATCH rings via 91/93/72/10/11; consecutive points dropped only when
  *    BOTH coordinates repeat (`&&` quirk, `DXF.js:362`)
  *  - INSERT and unknown entity types yield no feature (P6,
  *    `DXF.js:633-634,660-661`); blocks' entities emitted before top-level
  *    entities (`DXF.js:688-714`)
  */
object DxfCodec {

  private val segStep = 10.0 // `DXF.js:28`

  private val codeIndex = Map(
    "1" -> "text", "2" -> "name", "5" -> "handle", "6" -> "linetypeName",
    "7" -> "textStyleName", "8" -> "layerName", "39" -> "thickness",
    "48" -> "linetypeScale", "50" -> "textRotation", "51" -> "textOblique",
    "60" -> "visibility", "62" -> "colorNumber", "70" -> "closed")

  // ---------------- entity model ----------------

  private final class Entity {
    var entityType: Option[String] = None
    val strings = mutable.LinkedHashMap.empty[String, String] // text/handle/...
    var point: Option[(Double, Double)] = None
    var startPoint: Option[(Double, Double)] = None
    var endPoint: Option[(Double, Double)] = None
    var vertices: Option[mutable.ArrayBuffer[(Double, Double)]] = None
    var radius: Double = Double.NaN
    var startAngle: Double = Double.NaN
    var endAngle: Double = Double.NaN
    var textHeight: Double = Double.NaN
    val numProps = mutable.LinkedHashMap.empty[String, Double] // thickness etc
    val flagProps = mutable.LinkedHashMap.empty[String, Int]   // visibility/colorNumber/closed
    var multiVertices: Option[mutable.ArrayBuffer[mutable.ArrayBuffer[(Double, Double)]]] = None
    var verticesNumber: Int = 0
    var closedOverride: Boolean = false // CIRCLE sets closed = 1
  }

  def dxf2Geojson(dxfText: String, prj: Option[String] = None): JValue = {
    val trans = ShpCodec.transformFor(prj)
    val lines = dxfText.split("\r\n|\r|\n", -1)
    val blocks = readBlocks(section(lines, "BLOCKS"))
    val entities = readEntities(section(lines, "ENTITIES"))
    val features = Vector.newBuilder[JValue]
    blocks.foreach { blockEntities =>
      blockEntities.foreach(e => entity2Feature(e, trans).foreach(features += _))
    }
    entities.foreach(e => entity2Feature(e, trans).foreach(features += _))
    JObj.of("type" -> JStr("FeatureCollection"), "features" -> JArr(features.result()))
  }

  def dxf2GeojsonString(dxfText: String, prj: Option[String] = None): String =
    dxf2Geojson(dxfText, prj).render

  private def section(lines: Array[String], name: String): Array[String] = {
    val start = lines.indexOf(name)
    if (start < 0) return Array.empty
    val end = lines.indexOf("ENDSEC", start)
    if (end < 0) Array.empty else lines.slice(start, end + 1)
  }

  // ---------------- blocks ----------------

  /** Returns each block's entities, in block insertion order (`DXF.js:302-323`). */
  private def readBlocks(arr: Array[String]): Vector[Vector[Entity]] = {
    val out = Vector.newBuilder[Vector[Entity]]
    var i = 0
    while (i < arr.length) {
      val blockStart = arr.indexOf("BLOCK", i)
      if (blockStart < 0) { i = arr.length + 1 }
      else {
        val endblk = arr.indexOf("ENDBLK", blockStart)
        if (endblk < 0) { i = arr.length + 1 }
        else {
          val blockArray = arr.slice(blockStart, endblk + 1)
          out += readBlockEntities(blockArray)
          i = endblk + 1
        }
      }
    }
    out.result()
  }

  /** `readDxfBlock` (`DXF.js:252-300`): entities framed by "  0" lines. */
  private def readBlockEntities(blockArray: Array[String]): Vector[Entity] = {
    val length = blockArray.length - 2
    val entities = Vector.newBuilder[Entity]
    var index = 1
    while (index < length) {
      val code = blockArray(index).trim
      if (code == "0") {
        val zeroIdx = blockArray.indexOf("  0", index + 2)
        val end = if (zeroIdx < 0) length else zeroIdx + 1
        val children = blockArray.slice(index, end - 1)
        entities += readEntity(children)
        index = end - 3
      }
      index += 2
    }
    entities.result()
  }

  // ---------------- entities ----------------

  /** `readDxfEntities` (`DXF.js:469-495`). */
  private def readEntities(arr: Array[String]): Vector[Entity] = {
    val out = Vector.newBuilder[Entity]
    var i = 0
    while (i < arr.length) {
      val entityStart = arr.indexOf("  0", i)
      if (entityStart < 0) { i = arr.length + 1 }
      else {
        val entityEnd =
          if (entityStart + 1 < arr.length && arr(entityStart + 1) == "POLYLINE") {
            val se = arr.indexOf("SEQEND", entityStart + 1)
            se - 1
          } else arr.indexOf("  0", entityStart + 1)
        if (entityEnd < 0) { i = arr.length + 1 } // incl. SEQEND missing → -2 <0
        else {
          out += readEntity(arr.slice(entityStart, entityEnd))
          i = entityEnd
        }
      }
    }
    out.result().filter(_.entityType.isDefined)
  }

  private def pf(s: String): Double = XmlJson.jsParseFloat(s)

  /** JS parseInt base 10 (NaN → Int.MinValue marker). */
  private def pi(s: String): Long = {
    val t = s.dropWhile(_.isWhitespace)
    val neg = t.startsWith("-")
    val body = t.dropWhile(c => c == '+' || c == '-').takeWhile(_.isDigit)
    if (body.isEmpty) Long.MinValue else { val n = body.toLong; if (neg) -n else n }
  }

  /** loose `==` of a raw line against a numeric code (`DXF.js:109`). */
  private def looseEq(line: String, code: Int): Boolean =
    XmlJson.jsNumber(line).contains(code.toDouble)

  /** `readDxfEntity` (`DXF.js:325-467`). */
  private def readEntity(entityArray: Array[String]): Entity = {
    val e = new Entity
    var tpe: String = null
    var bypassCoords = false
    var edgeType = false
    var vertxPrev: Option[(Double, Double, Double)] = None // x, y, bulge

    val length = entityArray.length
    var index = 0
    def at(i: Int): String = if (i >= 0 && i < length) entityArray(i) else ""
    while (index < length) {
      val code = at(index).trim
      val value = at(index + 1).trim
      code match {
        case "0" =>
          if (value != "VERTEX") {
            tpe = value
            e.entityType = Some(value)
            bypassCoords = true
          } else tpe = "POLYLINE"
        case "1" | "5" | "6" | "7" | "8" =>
          e.strings(codeIndex(code)) = value
        case "10" =>
          val start = index + 1
          tpe match {
            case "HATCH" =>
              if (edgeType) e.multiVertices.foreach { mv =>
                if (mv.nonEmpty) {
                  val vertices = mv.last
                  if (e.verticesNumber > vertices.length) {
                    val px = pf(at(start)); val py = pf(at(start + 2))
                    val last = vertices.lastOption
                    // `&&` quirk: dropped only when BOTH coords repeat
                    if (last.isEmpty || (last.get._1 != px && last.get._2 != py))
                      vertices += ((px, py))
                  }
                }
              }
            case "POLYLINE" | "LWPOLYLINE" =>
              val isPolylineHeader = tpe == "POLYLINE" && bypassCoords
              if (isPolylineHeader) {
                bypassCoords = false
              } else {
                val vs = e.vertices.getOrElse {
                  val b = mutable.ArrayBuffer.empty[(Double, Double)]
                  e.vertices = Some(b); b
                }
                val vx = pf(at(start)); val vy = pf(at(start + 2))
                // bulge read like z with code 42 (`DXF.js:375`)
                val bulge =
                  if (looseEq(at(start + 3), 42)) pf(at(start + 4)) else Double.NaN
                vertxPrev match {
                  case Some((px, py, pb)) =>
                    vs ++= bulge2arc(px, py, pb, vx, vy, segStep)
                  case None =>
                    vs += ((vx, vy))
                }
                vertxPrev =
                  if (!bulge.isNaN && bulge != 0) Some((vx, vy, bulge)) else None
              }
            case "ARC" | "CIRCLE" | "POINT" | "MTEXT" | "XLINE" =>
              e.point = Some((pf(at(start)), pf(at(start + 2))))
            case "TEXT" | "LINE" =>
              e.startPoint = Some((pf(at(start)), pf(at(start + 2))))
            case _ => ()
          }
        case "11" =>
          val start = index + 1
          tpe match {
            case "HATCH" =>
              if (edgeType) e.multiVertices.foreach { mv =>
                if (mv.nonEmpty) mv.last += ((pf(at(start)), pf(at(start + 2))))
              }
              edgeType = false
            case "TEXT" | "LINE" =>
              e.endPoint = Some((pf(at(start)), pf(at(start + 2))))
            case _ => ()
          }
        case "39" | "48" | "50" =>
          // Q12 fall-through: startAngle AND endAngle AND the named field
          e.startAngle = pf(value)
          e.endAngle = pf(value)
          e.numProps(codeIndex(code)) = pf(value)
        case "51" =>
          e.endAngle = pf(value)
          e.numProps(codeIndex(code)) = pf(value)
        case "40" =>
          tpe match {
            case "TEXT"           => e.textHeight = pf(value)
            case "ARC" | "CIRCLE" => e.radius = pf(value)
            case _                => ()
          }
        case "60" | "62" | "70" =>
          // bit0 OR bit5 of the JS binary string (`DXF.js:439-446`)
          val n = pi(value)
          val flags = if (n == Long.MinValue) "NaN" else java.lang.Long.toString(n, 2)
          def bitAt(fromEnd: Int): Int = {
            val idx = flags.length - fromEnd
            if (idx < 0 || idx >= flags.length) 0
            else { val c = flags.charAt(idx); if (c.isDigit) c - '0' else 0 }
          }
          val closed = if (bitAt(1) != 0) bitAt(1) else bitAt(6)
          e.flagProps(codeIndex(code)) = closed
        case "72" =>
          if (value == "1" || value == "0") edgeType = true
        case "91" =>
          e.multiVertices = Some(mutable.ArrayBuffer.empty)
        case "93" =>
          e.verticesNumber = pi(value).toInt
          e.multiVertices.foreach(_ += mutable.ArrayBuffer.empty)
        case _ => ()
      }
      index += 2
    }
    e
  }

  // ---------------- arc math (`DXF.js:566-618`) ----------------

  // StrictMath == fdlibm == the algorithms V8 uses for Math.cos/sin/atan —
  // gives bit-identical arc vertices to the reference under node
  private def polar(x1: Double, y1: Double, phi: Double, dist: Double): (Double, Double) =
    (x1 + dist * StrictMath.cos(phi), y1 + dist * StrictMath.sin(phi))

  private def getSegment(cx: Double, cy: Double, angleDeg: Double, r: Double): (Double, Double) =
    (cx + StrictMath.cos(angleDeg * Math.PI / 180) * r, cy + StrictMath.sin(angleDeg * Math.PI / 180) * r)

  /** `segmentize` — float-accumulating loop mirrored exactly. */
  def segmentize(cx: Double, cy: Double, r: Double,
      startAngle: Double, endAngle: Double, stepAngle0: Double): Vector[(Double, Double)] = {
    val out = Vector.newBuilder[(Double, Double)]
    var stepAngle = stepAngle0
    val ascending = !(endAngle < startAngle)
    if (!ascending) stepAngle = -stepAngle
    var a = startAngle
    while (if (ascending) a < endAngle else a > endAngle) {
      out += getSegment(cx, cy, a, r)
      a += stepAngle
    }
    out += getSegment(cx, cy, endAngle, r)
    out.result()
  }

  /** `bulge2arc` (`DXF.js:574-595`). */
  def bulge2arc(x1: Double, y1: Double, bulge: Double,
      x2: Double, y2: Double, stepAngle: Double): Vector[(Double, Double)] = {
    val dist = StrictMath.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
    val a = StrictMath.atan(bulge) * 4.0
    val theta = 4.0 * StrictMath.atan(Math.abs(bulge))
    val radius = (dist / 2) / StrictMath.sin(theta / 2)
    val gamma = (Math.PI - theta) / 2.0
    val phi = StrictMath.atan2(y2 - y1, x2 - x1) + gamma * Math.signum(bulge)
    val (cx, cy) = polar(x1, y1, phi, radius)
    var startAngle = StrictMath.acos((x1 - cx) / radius)
    if (Math.signum(y1 - cy) < 0) startAngle = 2.0 * Math.PI - startAngle
    val endAngle = startAngle + a
    segmentize(cx, cy, radius, 180 * startAngle / Math.PI, 180 * endAngle / Math.PI, stepAngle)
  }

  // ---------------- feature assembly (`DXF.js:620-686`) ----------------

  private def pointJ(p: (Double, Double), trans: Option[ShpCodec.Transform]): JValue = {
    val (x, y) = trans.map(_(p._1, p._2)).getOrElse(p)
    JArr.of(JNum(x), JNum(y))
  }

  private def lineJ(pts: Seq[(Double, Double)], trans: Option[ShpCodec.Transform]): Vector[JValue] =
    pts.map(p => pointJ(p, trans)).toVector

  private def entity2Feature(e: Entity, trans: Option[ShpCodec.Transform]): Option[JValue] = {
    var closedOut: Option[Int] = e.flagProps.get("closed")
    val geometry: Option[JObj] = e.entityType.getOrElse("") match {
      case "ARC" =>
        val p = e.point.getOrElse((Double.NaN, Double.NaN))
        Some(JObj.of("type" -> JStr("LineString"), "coordinates" ->
          JArr(lineJ(segmentize(p._1, p._2, e.radius, e.startAngle, e.endAngle, segStep), trans))))
      case "CIRCLE" =>
        val p = e.point.getOrElse((Double.NaN, Double.NaN))
        val coords = lineJ(segmentize(p._1, p._2, e.radius, 0, 360, segStep), trans)
        closedOut = Some(1) // `entity.closed = 1` (`DXF.js:631`)
        Some(JObj.of("type" -> JStr("LineString"), "coordinates" ->
          JArr(coords :+ coords.head)))
      case "TEXT" =>
        Some(JObj.of("type" -> JStr("Point"), "coordinates" ->
          pointJ(e.startPoint.getOrElse((Double.NaN, Double.NaN)), trans)))
      case "LINE" =>
        Some(JObj.of("type" -> JStr("LineString"), "coordinates" -> JArr(lineJ(
          Seq(e.startPoint.getOrElse((Double.NaN, Double.NaN)),
            e.endPoint.getOrElse((Double.NaN, Double.NaN))), trans))))
      case "POLYLINE" | "LWPOLYLINE" =>
        val coords = lineJ(e.vertices.map(_.toSeq).getOrElse(Seq.empty), trans)
        val cs = if (closedOut.contains(1) && coords.nonEmpty) coords :+ coords.head else coords
        Some(JObj.of("type" -> JStr("LineString"), "coordinates" -> JArr(cs)))
      case "HATCH" =>
        val rings = e.multiVertices.map(_.toVector).getOrElse(Vector.empty).map { vs =>
          val c = lineJ(vs.toSeq, trans)
          JArr(if (c.nonEmpty) c :+ c.head else c)
        }
        Some(JObj.of("type" -> JStr("Polygon"), "coordinates" -> JArr(rings)))
      case _ => None // INSERT, SEQEND, unknown → dropped (P6)
    }
    geometry.map { g =>
      val props = Vector.newBuilder[(String, JValue)]
      e.strings.get("text").foreach(v => props += ("text" -> JStr(v)))
      if (!e.textHeight.isNaN) props += ("textHeight" -> JNum(e.textHeight))
      e.strings.get("textStyleName").foreach(v => props += ("textStyleName" -> JStr(v)))
      e.strings.get("layerName").foreach(v => props += ("layerName" -> JStr(v)))
      e.entityType.foreach(v => props += ("entityType" -> JStr(v)))
      closedOut.foreach(v => props += ("closed" -> JNum(v)))
      // feature key order: type, geometry, properties, style (`DXF.js:664-669`)
      JObj.of("type" -> JStr("Feature"), "geometry" -> g,
        "properties" -> JObj(props.result()), "style" -> JObj(Vector.empty))
    }
  }
}
