package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core._

/** Typed Dataset surface for the canonical Feature table (SURVEY §1.3:
  * `Dataset[FeatureRow]` for codec round-trips; geometry as WKB binary,
  * open properties/style maps as string→string with the reference's
  * JS value rendering).
  */
final case class FeatureRow(
    geometry: Array[Byte],            // WKB; null for geometry-less features
    properties: Map[String, String],
    style: Map[String, String],
    bbox: Array[Double])              // null when absent

object Features {

  /** One GeoJSON feature (JValue form) → typed row. Geometry that is absent,
    * null, or the reference's `{}` quirk maps to null WKB; property values
    * render with JS semantics (numbers shortest-form, arrays as JSON). */
  def fromJson(feature: JValue): FeatureRow = feature match {
    case o: JObj =>
      val geom = o.get("geometry") match {
        case Some(g: JObj) if g.get("type").isDefined =>
          try Wkb.write(GeoJson.geomFromJson(g)) catch { case _: Exception => null }
        case _ => null
      }
      def toMap(key: String): Map[String, String] = o.get(key) match {
        case Some(JObj(fs)) => fs.map { case (k, v) => k -> scalarRender(v) }.toMap
        case _              => Map.empty
      }
      val bbox = o.get("bbox") match {
        case Some(JArr(items)) if items.length == 4 =>
          items.map { case JNum(d) => d; case _ => Double.NaN }.toArray
        case _ => null
      }
      FeatureRow(geom, toMap("properties"), toMap("style"), bbox)
    case _ => FeatureRow(null, Map.empty, Map.empty, null)
  }

  private def scalarRender(v: JValue): String = v match {
    case JStr(s)  => s
    case JNum(d)  => Json.num(d)
    case JBool(b) => b.toString
    case JNull    => "null"
    case other    => other.render
  }

  /** GeoJSON document strings → typed feature rows (the engine-side table
    * extraction after any codec). */
  def fromGeojson(docs: Dataset[String]): Dataset[FeatureRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[FeatureRow]
    docs.flatMap { doc =>
      Json.parseOpt(doc) match {
        case Some(o: JObj) => o.get("features") match {
          case Some(JArr(items)) => items.map(fromJson)
          case _                 => Vector.empty
        }
        case _ => Vector.empty
      }
    }
  }
}
