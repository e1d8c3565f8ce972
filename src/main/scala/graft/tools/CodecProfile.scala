package graft.tools

import graft.codecs.{KmlCodec, XmlJson}
import graft.core.Json

/** Single-thread phase profile of the KML→GeoJSON path.
  * runMain graft.tools.CodecProfile [n]
  */
object CodecProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val docs = (0 until n).map { i =>
      val lon = ((i.toLong * 7919) % 360000).toDouble / 1000.0 - 180.0
      val lat = ((i.toLong * 104729) % 170000).toDouble / 1000.0 - 85.0
      s"<kml><Document><Placemark><name>p$i</name><Point><coordinates>$lon,$lat</coordinates></Point></Placemark></Document></kml>"
    }.toArray
    def time[T](name: String, reps: Int)(f: => T): T = {
      var r: T = f // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => r = f)
      println(f"[codec] $name: ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s/rep (${n / ((System.nanoTime() - t0) / 1e9 / reps)}%.0f docs/s)")
      r
    }
    time("parse only (XEl scanner)", 3) { var s = 0L; docs.foreach { d => s += XmlJson.parseXmlFast(d).children.length }; s }
    time("fused xml2Json (string -> JValue)", 3) { var s = 0; docs.foreach { d => s += XmlJson.xml2Json(d).hashCode }; s }
    time("full kml2Geojson (no render)", 3) { var s = 0; docs.foreach { d => s += KmlCodec.kml2Geojson(d).hashCode }; s }
    time("full kml2GeojsonString", 3) { var s = 0L; docs.foreach { d => s += KmlCodec.kml2GeojsonString(d).length }; s }
    // apples-to-apples with the node bench loop (doc built inside the loop)
    time("gen + kml2GeojsonString", 3) {
      var s = 0L
      var i = 0
      while (i < n) {
        val lon = ((i.toLong * 7919) % 360000).toDouble / 1000.0 - 180.0
        val lat = ((i.toLong * 104729) % 170000).toDouble / 1000.0 - 85.0
        val d = s"<kml><Document><Placemark><name>p$i</name><Point><coordinates>$lon,$lat</coordinates></Point></Placemark></Document></kml>"
        s += KmlCodec.kml2GeojsonString(d).length
        i += 1
      }
      s
    }
  }
}
