package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Wkb, Wkt, GeomOps}
import graft.sources.Features

class GeomAccessorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val wkts = Seq(
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
    "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((10 10, 20 10, 15 18, 10 10)))",
    "LINESTRING (0 0, 3 4, 3 10)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 5 6))",
    "POINT (3.5 -2)")

  test("st_area / st_length / st_centroid match JTS (oracle)") {
    import org.locationtech.jts.io.WKTReader
    val rd = new WKTReader()
    wkts.foreach { w =>
      val g = Wkt.parse(w)
      val jts = rd.read(w)
      assert(Math.abs(GeomOps.area(g) - jts.getArea) < 1e-9, s"area $w")
      assert(Math.abs(GeomOps.length(g) - jts.getLength) < 1e-9, s"length $w")
      val (cx, cy) = GeomOps.centroid(g)
      val jc = jts.getCentroid
      assert(Math.abs(cx - jc.getX) < 1e-9 && Math.abs(cy - jc.getY) < 1e-9, s"centroid $w got ($cx,$cy) want (${jc.getX},${jc.getY})")
    }
  }

  test("accessor expressions through SQL") {
    st.registerAll(spark)
    val r = spark.sql(
      """SELECT st_area(g) a, st_length(g) l, st_numpoints(g) n, st_geomtype(g) t,
        |       st_bbox(g) b, st_x(st_centroid(g)) cx
        |FROM (SELECT st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))') g)""".stripMargin).head()
    assert(r.getDouble(0) == 100.0)
    assert(r.getDouble(1) == 40.0)
    assert(r.getInt(2) == 5)
    assert(r.getString(3) == "Polygon")
    assert(r.getSeq[Double](4) == Seq(0.0, 0.0, 10.0, 10.0))
    assert(r.getDouble(5) == 5.0)
  }

  test("typed Dataset[FeatureRow] extraction from codec output") {
    import graft.codecs.KmlCodec
    val kml = """<kml><Document><Placemark><name>A</name><Point><coordinates>1,2</coordinates></Point></Placemark><Placemark><name>empty</name></Placemark></Document></kml>"""
    val docs = Seq(KmlCodec.kml2GeojsonString(kml)).toDS()
    val rows = Features.fromGeojson(docs).collect()
    assert(rows.length == 2)
    val withGeom = rows.filter(_.geometry != null)
    assert(withGeom.length == 1)
    assert(Wkb.read(withGeom.head.geometry) == graft.core.GPoint(1, 2))
    assert(withGeom.head.properties("name") == "A")
    assert(rows.exists(r => r.geometry == null && r.properties("name") == "empty"))
  }
}
