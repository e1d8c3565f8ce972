package graft.codecs

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import scala.collection.mutable
import graft.core._

/** ESRI Shapefile (.shp + .dbf [+ .prj]) → GeoJSON, mirroring
  * `/root/reference/src/ShapeFile.js`:
  *
  *  - mixed-endian header/record framing (file length BE `:73`, shape type
  *    LE `:76`, record number/content length BE `:107-110`)
  *  - bbox copied from headers, never recomputed (`:90,160`)
  *  - PointZ/PointM routed through the plain point reader — XY at the same
  *    offset (Q9, `:122-126`)
  *  - null/MultiPointM/MultiPatch records → feature with NO geometry key at
  *    all (P7, `:119-120,145-151,154-164`)
  *  - polygon rings grouped by the reference's shoelace accumulator with its
  *    `!prevX || !prevY` falsy reset (a vertex at exactly x=0 or y=0 restarts
  *    the pair — reproduced bit-for-bit, `:337-341`); CW (acc ≥ 0) starts a
  *    polygon, CCW appends to the previous one (`:346-350`)
  *  - single-part → Polygon/LineString; multi-part → Multi* even when only
  *    one polygon results (Q7, `:362-368`)
  *  - dbf: dBase III only (`:395-397`), LDID 0x4F → Big5 else UTF-8
  *    (`:383-393`), all values decoded as trimmed strings (`:420-425`),
  *    positional join `features[i].properties = record` (J1, `:413-427`)
  *  - .prj gate (Q8): WGS84-matching prj → no transform (`:89`); we support
  *    Web-Mercator→WGS84 natively; other CRS require a proj4-equivalent and
  *    throw (the reference delegates to the external proj4 library)
  */
object ShpCodec {

  final case class ShapeInput(
      shp: Array[Byte], dbf: Array[Byte],
      prj: Option[String] = None, encoding: Option[Int] = None)

  type Transform = (Double, Double) => (Double, Double)

  def shapefile2Geojson(in: ShapeInput): JValue = {
    val features = mutable.ArrayBuffer.empty[mutable.LinkedHashMap[String, JValue]]
    val trans = transformFor(in.prj)
    val bbox = readShp(in.shp, features, trans)
    readDbf(in.dbf, features, in.encoding)
    JObj.of(
      "type" -> JStr("FeatureCollection"),
      "features" -> JArr(features.toVector.map(f => JObj(f.toVector))),
      "bbox" -> bbox)
  }

  def shapefile2GeojsonString(in: ShapeInput): String = shapefile2Geojson(in).render

  /** Q8 gate: prj absent or matching /GCS_WGS_1984|WGS84/ → identity.
    * Supported reprojections (from scratch; the reference delegates to
    * proj4): parity-exact against the reference's proj4 path — Lambert
    * Conformal Conic, Albers Equal-Area, param-driven Transverse Mercator
    * (State Plane TM / Gauss-Krüger / full ESRI UTM WKT), polar + double
    * stereographic, Lambert Azimuthal Equal-Area, and Mercator (incl. the
    * ESRI auxiliary-sphere branch) with the bundle's 3/7-param Helmert
    * datum shifts (core.Proj, core.Datum, core.PrjWkt); plus zone-name UTM
    * (Krüger, WGS84 ellipsoid — bare "UTM Zone NN" strings proj4 cannot
    * parse) and Web-Mercator for non-WKT CRS strings. */
  def transformFor(prj: Option[String]): Option[Transform] = prj match {
    case None => None
    // intentional divergence from the reference's regex (documented, like
    // the round-1 UTM carve-out): a WGS84-datum PROJCS (UTM/State Plane on
    // GCS_WGS_1984) holds PROJECTED coordinates — identity would silently
    // emit meters as degrees. The regex-identity applies to GEOGCS-style
    // strings only, which is what the reference's check is FOR.
    case Some(p) if "GCS_WGS_1984|WGS84".r.findFirstIn(p).isDefined &&
      graft.core.Proj.parseUtmZone(p).isEmpty &&
      graft.core.PrjWkt.parse(p).isEmpty => None
    case Some(p) if graft.core.PrjWkt.parse(p).isDefined =>
      // a parseable PROJCS either maps to a supported family or fails
      // LOUDLY — never the web-mercator substring fallback (a Hotine .prj
      // contains "Mercator" but is a different projection; the live bundle
      // itself emits NaN for it because its WKT path never maps the azimuth)
      Some(graft.core.PrjWkt.projcsTransform(p).getOrElse(
        throw new UnsupportedOperationException(
          s"unsupported PROJECTION (reference's proj4 WKT path cannot produce " +
            s"finite output for it either, or it is unimplemented): ${p.take(80)}")))
    case Some(p) if p.trim.startsWith("GEOGCS") =>
      // GEOGCS-ROOT .prj (lat/lon shapefile): the bundle's wkt mapper reads
      // the datum from a.GEOGCS.DATUM, which for a root-level GEOGCS does
      // not exist — a/rf stay unset, deriveConstants defaults to WGS84, and
      // the datum is silently IGNORED (verified live: NAD27/OSGB GEOGCS
      // pass through unshifted). What remains of the proj4 longlat round
      // trip is x·D2R·R2D per coordinate — which wobbles the last ulp
      // (121.5654 → 121.56540000000003) and is therefore part of the
      // byte-parity contract.
      Some((x: Double, y: Double) =>
        (x * graft.core.Proj.D2R * graft.core.Proj.R2D,
          y * graft.core.Proj.D2R * graft.core.Proj.R2D))
    case Some(p) =>
      graft.core.Proj.parseUtmZone(p).map { case (zone, north) =>
        (x: Double, y: Double) => graft.core.Proj.utmToWgs84(x, y, zone, north)
      }.orElse(
        if (p.contains("3857") || p.toLowerCase.contains("mercator"))
          Some(webMercatorToWgs84)
        else throw new UnsupportedOperationException(
          s"unsupported CRS (reference delegates to proj4): ${p.take(60)}"))
  }

  /** EPSG:3857 → WGS84 (spherical mercator inverse). */
  val webMercatorToWgs84: Transform = (x, y) => {
    val R = 6378137.0
    (x / R * 180.0 / Math.PI,
      (2.0 * Math.atan(Math.exp(y / R)) - Math.PI / 2.0) * 180.0 / Math.PI)
  }

  // ---------------- .shp ----------------

  private def readShp(bytes: Array[Byte],
      features: mutable.ArrayBuffer[mutable.LinkedHashMap[String, JValue]],
      trans: Option[Transform]): JValue = {
    val buf = ByteBuffer.wrap(bytes)
    val byteLength = bytes.length
    // header bbox at offset 36, LE (`ShapeFile.js:79-90`)
    val bbox = readBox(buf, 36, trans)
    var byteOffset = 100
    while (byteOffset < byteLength) {
      byteOffset = readRecord(buf, byteOffset, features, trans)
    }
    bbox
  }

  private def getIntBE(buf: ByteBuffer, off: Int): Int =
    buf.order(ByteOrder.BIG_ENDIAN).getInt(off)
  private def getIntLE(buf: ByteBuffer, off: Int): Int =
    buf.order(ByteOrder.LITTLE_ENDIAN).getInt(off)
  private def getF64(buf: ByteBuffer, off: Int): Double =
    buf.order(ByteOrder.LITTLE_ENDIAN).getDouble(off)

  private def pointJ(x: Double, y: Double, trans: Option[Transform]): JValue = {
    val (tx, ty) = trans.map(_(x, y)).getOrElse((x, y))
    JArr.of(JNum(tx), JNum(ty))
  }

  private def readBox(buf: ByteBuffer, off: Int, trans: Option[Transform]): JValue = {
    val xmin = getF64(buf, off); val ymin = getF64(buf, off + 8)
    val xmax = getF64(buf, off + 16); val ymax = getF64(buf, off + 24)
    trans match {
      case Some(t) =>
        val (a, b) = t(xmin, ymin); val (c, d) = t(xmax, ymax)
        JArr.of(JNum(a), JNum(b), JNum(c), JNum(d))
      case None => JArr.of(JNum(xmin), JNum(ymin), JNum(xmax), JNum(ymax))
    }
  }

  /** One record; returns the next record offset (`ShapeFile.js:101-171`). */
  private def readRecord(buf: ByteBuffer, recordStart: Int,
      features: mutable.ArrayBuffer[mutable.LinkedHashMap[String, JValue]],
      trans: Option[Transform]): Int = {
    val contentLength = getIntBE(buf, recordStart + 4)
    val shapeType = getIntLE(buf, recordStart + 8)
    val byteOffset = recordStart + 12

    val feature = mutable.LinkedHashMap[String, JValue]("type" -> JStr("Feature"))

    val rec: Option[(String, JValue, Option[JValue])] = shapeType match {
      case 1 | 11 | 21 => Some(readPoint(buf, byteOffset, trans))     // Q9: Z/M via plain reader
      case 3 | 13 | 23 => Some(readPolyline(buf, byteOffset, trans))
      case 5 | 15 | 25 => Some(readPolygon(buf, byteOffset, trans))
      case 8 | 18      => Some(readMultiPoint(buf, byteOffset, trans))
      case _           => None // 0 null, 28 MultiPointM, 31 MultiPatch, unknown
    }
    rec.foreach { case (tpe, coords, box) =>
      box.foreach(b => feature("bbox") = b)
      feature("geometry") = JObj.of("type" -> JStr(tpe), "coordinates" -> coords)
    }
    features += feature
    byteOffset + contentLength * 2 - 4
  }

  private def readPoint(buf: ByteBuffer, off: Int, trans: Option[Transform]) = {
    ("Point", pointJ(getF64(buf, off), getF64(buf, off + 8), trans), None)
  }

  private def readMultiPoint(buf: ByteBuffer, off: Int, trans: Option[Transform]) = {
    val box = readBox(buf, off, trans)
    val numPoints = getIntLE(buf, off + 32)
    var o = off + 36
    val pts = Vector.newBuilder[JValue]
    (0 until numPoints).foreach { _ =>
      pts += pointJ(getF64(buf, o), getF64(buf, o + 8), trans)
      o += 16
    }
    ("MultiPoint", JArr(pts.result()), Some(box))
  }

  private def readParts(buf: ByteBuffer, off: Int, numParts: Int, numPoints: Int): Set[Int] = {
    // part end indices: start(next)-1, plus numPoints-1 (`ShapeFile.js:269-273`)
    val ends = mutable.Set.empty[Int]
    (0 until numParts).foreach { i =>
      ends += getIntLE(buf, off + 40 + 4 * i) - 1
    }
    ends += numPoints - 1
    ends.toSet
  }

  private def readPolyline(buf: ByteBuffer, off: Int, trans: Option[Transform]) = {
    val box = readBox(buf, off, trans)
    val numParts = getIntLE(buf, off + 32)
    val numPoints = getIntLE(buf, off + 36)
    val partEnds = readParts(buf, off, numParts, numPoints)
    var o = off + 40 + 4 * numParts
    val lines = Vector.newBuilder[JValue]
    var pts = Vector.newBuilder[JValue]
    (0 until numPoints).foreach { i =>
      pts += pointJ(getF64(buf, o), getF64(buf, o + 8), trans)
      o += 16
      if (partEnds.contains(i)) {
        lines += JArr(pts.result())
        pts = Vector.newBuilder[JValue]
      }
    }
    val coords = lines.result()
    if (numParts == 1) ("LineString", coords.head, Some(box))
    else ("MultiLineString", JArr(coords), Some(box))
  }

  private def readPolygon(buf: ByteBuffer, off: Int, trans: Option[Transform]) = {
    val box = readBox(buf, off, trans)
    val numParts = getIntLE(buf, off + 32)
    val numPoints = getIntLE(buf, off + 36)
    val partEnds = readParts(buf, off, numParts, numPoints)
    var o = off + 40 + 4 * numParts

    // polygons: Vector of polygons, each a Vector of rings (`:314,343-356`)
    val polys = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[JValue]]
    var pts = Vector.newBuilder[JValue]
    var prevX = 0.0; var prevY = 0.0
    var havePrev = false
    var acc = 0.0

    (0 until numPoints).foreach { i =>
      val x = getF64(buf, o); val y = getF64(buf, o + 8)
      pts += pointJ(x, y, trans)
      o += 16
      // reference accumulator with its falsy-zero reset (`:337-341`):
      // `if (!prevX || !prevY)` — JS falsy means null OR exactly 0
      if (!havePrev || prevX == 0.0 || prevY == 0.0) { prevX = x; prevY = y; havePrev = true }
      acc += (x - prevX) * (y + prevY)
      prevX = x; prevY = y
      if (partEnds.contains(i)) {
        val ring = JArr(pts.result())
        if (acc >= 0) {
          polys += mutable.ArrayBuffer[JValue](ring)
        } else if (polys.nonEmpty) {
          polys.last += ring
        } else {
          // reference would crash here (rings[-1].concat); keep the data
          polys += mutable.ArrayBuffer[JValue](ring)
        }
        pts = Vector.newBuilder[JValue]
        acc = 0.0
        havePrev = false
      }
    }
    val rings = polys.map(p => JArr(p.toVector)).toVector
    if (numParts == 1) ("Polygon", rings.head, Some(box))
    else ("MultiPolygon", JArr(rings), Some(box)) // Q7: Multi even if 1 poly
  }

  // ---------------- .dbf ----------------

  private def decoder(cs: Charset) = (bytes: Array[Byte]) => {
    val d = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    d.decode(ByteBuffer.wrap(bytes)).toString
  }

  private def readDbf(bytes: Array[Byte],
      features: mutable.ArrayBuffer[mutable.LinkedHashMap[String, JValue]],
      encoding: Option[Int]): Unit = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val tpe = buf.get(0)
    val numRecords = buf.getInt(4)
    val headerLength = buf.getShort(8).toInt
    val recordLength = buf.getShort(10).toInt
    val codePage = encoding.getOrElse(buf.get(29).toInt)
    val decode = codePage match {
      case 0x4F => decoder(Charset.forName("Big5"))
      case _    => decoder(StandardCharsets.UTF_8)
    }
    if (tpe != 0x03)
      throw new IllegalArgumentException(s"File has unknown/unsupported dBase version:$tpe")

    // field descriptors: 32-byte blocks until 0x0D (`ShapeFile.js:399-411`)
    var off = 32
    val fields = mutable.ArrayBuffer.empty[(String, Int)]
    while ((buf.get(off) & 0xFF) != 0x0D) {
      val name = decode(bytes.slice(off, off + 10)).replace("\u0000", "")
      val fieldLength = buf.get(off + 16) & 0xFF
      fields += ((name, fieldLength))
      off += 32
    }

    (0 until numRecords).foreach { i =>
      val record = mutable.LinkedHashMap.empty[String, JValue]
      var o = headerLength + i * recordLength + 1 // skip delete flag
      fields.foreach { case (name, len) =>
        record(name) = JStr(decode(bytes.slice(o, o + len)).trim)
        o += len
      }
      // positional join (J1): i-th record → i-th feature's properties
      if (i < features.length) features(i)("properties") = JObj(record.toVector)
      else throw new IndexOutOfBoundsException(
        s"dbf record $i has no matching shp feature (reference crashes here too)")
    }
  }
}
