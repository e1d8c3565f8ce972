package graft.codecs

import org.scalatest.funsuite.AnyFunSuite

/** DXF parity vs the live reference (node oracle). Code lines use standard
  * right-aligned padding ("  0", " 10"); entity framing depends on the
  * literal "  0" lines (`DXF.js:476-481`).
  */
class DxfParitySpec extends AnyFunSuite {

  private def dxf(entities: String, blocks: String = ""): String = {
    Seq(
      "  0", "SECTION", "  2", "HEADER",
      "  9", "$ACADVER", "  1", "AC1014",
      "  0", "ENDSEC",
      "  0", "SECTION", "  2", "TABLES",
      "  0", "ENDSEC",
      "  0", "SECTION", "  2", "BLOCKS",
      blocks,
      "  0", "ENDSEC",
      "  0", "SECTION", "  2", "ENTITIES",
      entities,
      "  0", "ENDSEC",
      "  0", "EOF").filter(_.nonEmpty).mkString("\n")
  }

  private def check(doc: String): Unit = {
    val ours = DxfCodec.dxf2GeojsonString(doc)
    val ref = RefOracle("dxf2geojson", doc)
    assert(ours == ref, doc.take(200))
  }

  test("LINE + TEXT + POINT(dropped) + INSERT(dropped)") {
    check(dxf(Seq(
      "  0", "LINE", "  8", "roads", " 10", "1.5", " 20", "2.5", " 11", "3.5", " 21", "4.5",
      "  0", "TEXT", "  8", "labels", "  7", "Standard", "  1", "Hello DXF",
      " 10", "10.25", " 20", "-3.5", " 30", "0", " 40", "2.5", " 50", "45",
      "  0", "POINT", "  8", "pts", " 10", "7", " 20", "8",
      "  0", "INSERT", "  2", "blk", " 10", "0", " 20", "0").mkString("\n")))
  }

  test("ARC (codes 50/51 incl. Q12 fall-through) and CIRCLE (closed=1)") {
    check(dxf(Seq(
      "  0", "ARC", "  8", "arcs", " 10", "5", " 20", "5", " 30", "0",
      " 40", "3", " 50", "30", " 51", "120",
      "  0", "CIRCLE", "  8", "circles", " 10", "-2", " 20", "4", " 30", "0", " 40", "1.5").mkString("\n")))
  }

  test("LWPOLYLINE with bulge vertex and closed flag (bit0)") {
    check(dxf(Seq(
      "  0", "LWPOLYLINE", "  8", "poly", " 70", "1",
      " 10", "0", " 20", "0",
      " 10", "4", " 20", "0", " 42", "0.5",
      " 10", "4", " 20", "4",
      " 10", "0", " 20", "4").mkString("\n")))
  }

  test("LWPOLYLINE closed via bit5 (70 = 32)") {
    check(dxf(Seq(
      "  0", "LWPOLYLINE", "  8", "poly", " 70", "32",
      " 10", "0", " 20", "0", " 10", "2", " 20", "2", " 10", "4", " 20", "0").mkString("\n")))
  }

  test("POLYLINE with VERTEX entries and SEQEND") {
    check(dxf(Seq(
      "  0", "POLYLINE", "  8", "pl", " 66", "1", " 70", "0", " 10", "0", " 20", "0",
      "  0", "VERTEX", "  8", "pl", " 10", "1", " 20", "1",
      "  0", "VERTEX", "  8", "pl", " 10", "2", " 20", "3",
      "  0", "VERTEX", "  8", "pl", " 10", "4", " 20", "3",
      "  0", "SEQEND",
      "  0", "LINE", "  8", "after", " 10", "9", " 20", "9", " 11", "10", " 21", "10").mkString("\n")))
  }

  test("HATCH multiVertices incl. the && same-point quirk") {
    check(dxf(Seq(
      "  0", "HATCH", "  8", "hatch", " 91", "1", " 72", "0", " 93", "5",
      " 10", "0", " 20", "0",
      " 10", "4", " 20", "0",
      " 10", "4", " 20", "0", // exact dup → dropped
      " 10", "4", " 20", "3", // same x, new y → kept (&& quirk)
      " 10", "0", " 20", "3").mkString("\n")))
  }

  test("entity inside BLOCK emitted before top-level entities") {
    check(dxf(
      entities = Seq("  0", "LINE", "  8", "top", " 10", "0", " 20", "0", " 11", "1", " 21", "1").mkString("\n"),
      blocks = Seq(
        "  0", "BLOCK", "  8", "0", "  2", "b1", "  3", "b1", " 10", "0", " 20", "0", " 30", "0",
        "  0", "LINE", "  8", "inblock", " 10", "5", " 20", "5", " 11", "6", " 21", "7",
        "  0", "ENDBLK").mkString("\n")))
  }

  test("segmentize float-accumulation parity on descending angles") {
    check(dxf(Seq(
      "  0", "ARC", "  8", "a", " 10", "0", " 20", "0", " 40", "2",
      " 50", "300", " 51", "20").mkString("\n")))
  }

  test("DXF with conic .prj reprojects byte-identically (shared CRS gate, live proj4)") {
    // DXF.js:42-57 applies the same Transitions gate as the shapefile path;
    // the arc segmentization runs BEFORE reprojection, so every segment
    // vertex goes through the LCC inverse — a dense parity surface
    val prj =
      """PROJCS["Custom_LCC_NAD83",GEOGCS["GCS_North_American_1983",""" +
        """DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Lambert_Conformal_Conic"],PARAMETER["False_Easting",700000.0],""" +
        """PARAMETER["False_Northing",300000.0],PARAMETER["Central_Meridian",-100.0],""" +
        """PARAMETER["Standard_Parallel_1",27.5],PARAMETER["Standard_Parallel_2",35.0],""" +
        """PARAMETER["Latitude_Of_Origin",31.166666666666668],UNIT["Meter",1.0]]"""
    val doc = dxf(Seq(
      "  0", "LINE", "  8", "r", " 10", "700000", " 20", "300000",
      " 11", "712345.25", " 21", "309876.5",
      "  0", "ARC", "  8", "a", " 10", "800000", " 20", "500000", " 30", "0",
      " 40", "12500", " 50", "30", " 51", "120",
      "  0", "LWPOLYLINE", "  8", "p", " 70", "1",
      " 10", "650000", " 20", "450000", " 10", "660000", " 20", "450000",
      " 10", "660000", " 20", "460000").mkString("\n"))
    val ours = DxfCodec.dxf2GeojsonString(doc, Some(prj))
    val ref = RefOracle.call("dxf2geojson", "input" -> graft.core.JStr(doc),
      "prj" -> graft.core.JStr(prj))
    assert(ours == ref)
    assert(ours.contains("-100.") || ours.contains("-99.")) // actually reprojected
  }

  test("DXF with round-3 CRS (LAEA + datum-shifted Potsdam TM) reprojects byte-identically") {
    // the new families + the Helmert datum path flow through the same
    // shared gate the shapefile path uses — arc segment vertices make a
    // dense surface through the LAEA inverse
    val laeaPrj =
      """PROJCS["Custom_LAEA_Europe",GEOGCS["GCS_North_American_1983",""" +
        """DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Lambert_Azimuthal_Equal_Area"],PARAMETER["False_Easting",4321000.0],""" +
        """PARAMETER["False_Northing",3210000.0],PARAMETER["Central_Meridian",10.0],""" +
        """PARAMETER["Latitude_Of_Origin",52.0],UNIT["Meter",1.0]]"""
    val doc1 = dxf(Seq(
      "  0", "LINE", "  8", "r", " 10", "4321000", " 20", "3210000",
      " 11", "4500000.5", " 21", "3300000.25",
      "  0", "ARC", "  8", "a", " 10", "4000000", " 20", "2800000", " 30", "0",
      " 40", "25000", " 50", "45", " 51", "200").mkString("\n"))
    val ours1 = DxfCodec.dxf2GeojsonString(doc1, Some(laeaPrj))
    val ref1 = RefOracle.call("dxf2geojson", "input" -> graft.core.JStr(doc1),
      "prj" -> graft.core.JStr(laeaPrj))
    assert(ours1 == ref1)
    val dhdnPrj =
      """PROJCS["DHDN_GK4",GEOGCS["GCS_Deutsches_Hauptdreiecksnetz",""" +
        """DATUM["D_Potsdam",SPHEROID["Bessel_1841",6377397.155,299.1528128]],""" +
        """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],""" +
        """PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",4500000.0],""" +
        """PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",12.0],""" +
        """PARAMETER["Scale_Factor",1.0],PARAMETER["Latitude_Of_Origin",0.0],""" +
        """UNIT["Meter",1.0]]"""
    val doc2 = dxf(Seq(
      "  0", "LINE", "  8", "r", " 10", "4591193", " 20", "5819432.5",
      " 11", "4350000.125", " 21", "5300000").mkString("\n"))
    val ours2 = DxfCodec.dxf2GeojsonString(doc2, Some(dhdnPrj))
    val ref2 = RefOracle.call("dxf2geojson", "input" -> graft.core.JStr(doc2),
      "prj" -> graft.core.JStr(dhdnPrj))
    assert(ours2 == ref2)
  }
}
