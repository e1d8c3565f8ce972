package graft.codecs

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream
import scala.collection.mutable
import graft.core._

/** KMZ → list of GeoJSON documents, mirroring `/root/reference/src/KMZ.js`:
  * unzip, take `.kml` entries as text and `.png`/`.jpg` entries as base64
  * data URIs (`KMZ.js:18-37`), other entries ignored; then per kml document
  * run the KML codec and rewrite any `feature.style.iconUrl` that names a
  * zipped image to its data URI (the broadcast-map icon join, `KMZ.js:50-58`).
  * The reference's promise fan-in barrier (`KMZ.js:46-63`) is a plain
  * sequential loop here — same entry order, no async.
  */
object KmzCodec {

  def kmz2Geojsons(kmz: Array[Byte]): Vector[JValue] = {
    val kmls = mutable.ArrayBuffer.empty[String]
    val imgs = mutable.LinkedHashMap.empty[String, String]

    val zin = new ZipInputStream(new ByteArrayInputStream(kmz))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val name = entry.getName
          val ext = name.split("\\.").last
          ext match {
            case "kml" =>
              kmls += new String(zin.readAllBytes(), StandardCharsets.UTF_8)
            case "png" | "jpg" =>
              val b64 = java.util.Base64.getEncoder.encodeToString(zin.readAllBytes())
              imgs(name) = s"data:image/$ext;base64,$b64"
            case _ => () // ignored (`KMZ.js:38-40`)
          }
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()

    kmls.toVector.map { kml =>
      val geojson = KmlCodec.kml2Geojson(kml)
      rewriteIcons(geojson, imgs)
    }
  }

  private def rewriteIcons(geojson: JValue, imgs: mutable.LinkedHashMap[String, String]): JValue =
    geojson match {
      case o: JObj =>
        val fields = o.fields.map {
          case ("features", JArr(feats)) =>
            "features" -> JArr(feats.map {
              case f: JObj =>
                JObj(f.fields.map {
                  case ("style", s: JObj) =>
                    "style" -> JObj(s.fields.map {
                      case ("iconUrl", JStr(u)) if imgs.contains(u) =>
                        "iconUrl" -> JStr(imgs(u))
                      case kv => kv
                    })
                  case kv => kv
                })
              case f => f
            })
          case kv => kv
        }
        JObj(fields)
      case other => other
    }
}
