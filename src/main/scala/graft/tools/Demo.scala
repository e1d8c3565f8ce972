package graft.tools

import graft.core._

/** Sample consumer of the core library surface — also the runtime drive used
  * for verification (runMain graft.tools.Demo).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val g = Wkt.parse("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    println("parsed: " + g.kind + " pts=" + g.numPoints)
    val wkb = Wkb.write(g)
    println("wkb len: " + wkb.length + " roundtrip ok: " + (Wkb.read(wkb) == g))
    println("geojson: " + GeoJson.write(g))
    println("wkt back: " + Wkt.write(Wkb.read(wkb)))
    println("pip(5,5)=" + GeomOps.contains(g, 5, 5) + " pip(3,3 in hole)=" + GeomOps.contains(g, 3, 3))
    val c = CellIndex.encode(121.5, 25.0, 12)
    println("cell=" + c + " res=" + CellIndex.res(c) + " bounds=" + CellIndex.bounds(c))
    println("parent=" + CellIndex.parent(c) + " ring1=" + CellIndex.ring(c, 1).mkString(","))
    println("cover n=" + CellIndex.cover(g, 8).length)
    // probes: malformed input behavior at the public surface
    println("bad wkt -> " + Wkt.parseOpt("POLYGON ((0 0, 10"))
    println("unknown tag parity (Q11) -> features=" + Wkt.wktToFeatureCollection("MULTIPOINT ((1 2))").features.length)
    println("bad json -> " + Json.parseOpt("{\"a\": }"))
    println("empty wkb -> " + Wkb.readOpt(Array[Byte]()))
    println("res out of range -> " + (try { CellIndex.encode(0, 0, 40); "NO ERROR" }
      catch { case e: IllegalArgumentException => "IAE: " + e.getMessage }))
  }
}
