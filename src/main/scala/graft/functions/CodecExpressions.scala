package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.codecs._

/** Format-conversion expressions — GeoConvert's whole-document converters as
  * columnar string↔string functions (SURVEY.md §2.1 S1–S11). Document
  * parsing is row-local and stateful-within-row, so these are plain
  * CodegenFallback expressions (cold path; the hot spatial kernels live in
  * StExpressions).
  */

private[functions] object Str2Str {
  /** Malformed input → null; genuine codec bugs (NPE, arithmetic, stack
    * overflow…) must propagate — a blanket catch made them
    * indistinguishable from bad data in pipelines. The codecs signal
    * malformed input with IAE (incl. NumberFormat), slice/index errors on
    * truncated documents, and cast/match errors on structurally-invalid
    * JSON trees (e.g. "coordinates": 7). */
  def isMalformedInput(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException | _: IndexOutOfBoundsException |
         _: NoSuchElementException | _: UnsupportedOperationException |
         _: ClassCastException | _: MatchError => true
    case _ => false
  }
}

private[functions] trait Str2Str extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def convert(s: String): String
  override def nullSafeEval(v: Any): Any =
    try UTF8String.fromString(convert(v.asInstanceOf[UTF8String].toString))
    catch { case t: Throwable if Str2Str.isMalformedInput(t) => null }
}

case class KmlToGeojson(child: Expression) extends Str2Str {
  override def convert(s: String): String = KmlCodec.kml2GeojsonString(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "kml_to_geojson"
}

case class GeojsonToKml(child: Expression) extends Str2Str {
  override def convert(s: String): String = KmlCodec.geojson2Kml(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "geojson_to_kml"
}

case class GpxToGeojson(child: Expression) extends Str2Str {
  override def convert(s: String): String = GpxCodec.gpx2GeojsonString(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "gpx_to_geojson"
}

case class GeojsonToGpx(child: Expression) extends Str2Str {
  override def convert(s: String): String = GpxCodec.geojson2Gpx(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "geojson_to_gpx"
}

case class DxfToGeojson(child: Expression) extends Str2Str {
  override def convert(s: String): String = DxfCodec.dxf2GeojsonString(s)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "dxf_to_geojson"
}

/** wkt_to_geojson_gc(str) — GeoConvert's full wkt2Geojson entry point
  * (FeatureCollection string; unsupported tags → empty collection, Q11). */
case class WktToGeojsonGc(child: Expression) extends Str2Str {
  override def convert(s: String): String =
    graft.core.GeoJson.collectionToJson(graft.core.Wkt.wktToFeatureCollection(s)).render
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "wkt_to_geojson_gc"
}

/** shapefile_to_geojson(shp, dbf, prj) → GeoJSON string. */
case class ShapefileToGeojson(shp: Expression, dbf: Expression, prj: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def first: Expression = shp
  override def second: Expression = dbf
  override def third: Expression = prj
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = shp.eval(input); val d = dbf.eval(input); val p = prj.eval(input)
    if (s == null || d == null) null
    else try UTF8String.fromString(ShpCodec.shapefile2GeojsonString(ShpCodec.ShapeInput(
      s.asInstanceOf[Array[Byte]], d.asInstanceOf[Array[Byte]],
      Option(p).map(_.asInstanceOf[UTF8String].toString))))
    catch { case t: Throwable if Str2Str.isMalformedInput(t) => null }
  }
  override protected def withNewChildrenInternal(f: Expression, se: Expression, t: Expression): Expression =
    copy(shp = f, dbf = se, prj = t)
  override def prettyName: String = "shapefile_to_geojson"
}

/** kmz_to_geojsons(bytes) → array of GeoJSON strings (one per .kml entry). */
case class KmzToGeojsons(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    try new GenericArrayData(
      KmzCodec.kmz2Geojsons(v.asInstanceOf[Array[Byte]])
        .map(j => UTF8String.fromString(j.render)).toArray[Any])
    catch {
      // zip framing errors surface as ZipException/IOException — malformed
      // bytes, not codec bugs
      case t: Throwable if Str2Str.isMalformedInput(t) => null
      case _: java.io.IOException => null
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "kmz_to_geojsons"
}

/** geojson_features(str) → array of per-feature JSON strings. */
case class GeojsonFeatures(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    import graft.core._
    try Json.parse(v.asInstanceOf[UTF8String].toString) match {
      case o: JObj => o.get("features") match {
        case Some(JArr(items)) =>
          new GenericArrayData(items.map(f => UTF8String.fromString(f.render)).toArray[Any])
        case _ => null
      }
      case _ => null
    } catch { case t: Throwable if Str2Str.isMalformedInput(t) => null }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "geojson_features"
}

object codecs {
  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  def kmlToGeojson(c: Column): Column = col(KmlToGeojson(ex(c)))
  def geojsonToKml(c: Column): Column = col(GeojsonToKml(ex(c)))
  def gpxToGeojson(c: Column): Column = col(GpxToGeojson(ex(c)))
  def geojsonToGpx(c: Column): Column = col(GeojsonToGpx(ex(c)))
  def dxfToGeojson(c: Column): Column = col(DxfToGeojson(ex(c)))
  def wktToGeojsonGc(c: Column): Column = col(WktToGeojsonGc(ex(c)))
  def shapefileToGeojson(shp: Column, dbf: Column, prj: Column): Column =
    col(ShapefileToGeojson(ex(shp), ex(dbf), ex(prj)))
  def kmzToGeojsons(c: Column): Column = col(KmzToGeojsons(ex(c)))
  def geojsonFeatures(c: Column): Column = col(GeojsonFeatures(ex(c)))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    one("kml_to_geojson") { e => KmlToGeojson(e(0)) }
    one("geojson_to_kml") { e => GeojsonToKml(e(0)) }
    one("gpx_to_geojson") { e => GpxToGeojson(e(0)) }
    one("geojson_to_gpx") { e => GeojsonToGpx(e(0)) }
    one("dxf_to_geojson") { e => DxfToGeojson(e(0)) }
    one("wkt_to_geojson_gc") { e => WktToGeojsonGc(e(0)) }
    one("shapefile_to_geojson") { e =>
      ShapefileToGeojson(e(0), e(1), if (e.length > 2) e(2) else Literal(null, StringType))
    }
    one("kmz_to_geojsons") { e => KmzToGeojsons(e(0)) }
    one("geojson_features") { e => GeojsonFeatures(e(0)) }
  }
}
