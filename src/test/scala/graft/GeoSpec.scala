package graft

import graft.engine.Graft
import graft.geo.Geo
import graft.sources.Turtle

/** Unit coverage for the geometry module beyond the fixture suite: parsing
  * edge cases, line/line relations, and geof:distance. */
class GeoSpec extends SparkSpec {

  test("WKT parse: CRS prefix, case-insensitivity, auto-close, malformed") {
    assert(Geo.parseWkt("POINT(1 2)").contains(Geo.GPoint(Geo.Pt(1, 2), Geo.DefaultCrs)))
    assert(Geo.parseWkt("<http://crs> Point(1 2)").exists(_.crs == "http://crs"))
    val p = Geo.parseWkt("polygon((0 0, 0 1, 1 1, 0 0))") // closed ring given
    assert(p.exists { case Geo.GPolygon(r, _) => r.size == 3; case _ => false })
    assert(Geo.parseWkt("POINT(1)").isEmpty)
    assert(Geo.parseWkt("MULTIPOINT((1 2))").isEmpty)
    assert(Geo.parseWkt("garbage").isEmpty)
  }

  test("GeoJSON parse: Point / LineString / Polygon") {
    assert(Geo.parseGeoJson("""{"type":"Point","coordinates":[1,2]}""")
      .contains(Geo.GPoint(Geo.Pt(1, 2), Geo.DefaultCrs)))
    assert(Geo.parseGeoJson("""{"type":"LineString","coordinates":[[0,0],[1,1]]}""")
      .exists { case Geo.GLine(ps, _) => ps.size == 2; case _ => false })
    assert(Geo.parseGeoJson("""{"type":"Polygon","coordinates":[[[0,0],[0,1],[1,1],[0,0]]]}""")
      .exists { case Geo.GPolygon(r, _) => r.size == 3; case _ => false })
    assert(Geo.parseGeoJson("not json").isEmpty)
  }

  test("line/line relations: crossing, touching, disjoint, equal") {
    def line(s: String) = Geo.parseWkt(s).get
    def pred(n: String, a: Geo.Geom, b: Geo.Geom) = Geo.predicate(n, a, b).get
    val x1 = line("LINESTRING(0 0, 2 2)")
    val x2 = line("LINESTRING(0 2, 2 0)") // crosses x1 at (1,1)
    val x3 = line("LINESTRING(2 2, 3 0)") // touches x1 at its endpoint
    val x4 = line("LINESTRING(5 5, 6 6)")
    assert(pred("sfCrosses", x1, x2))
    assert(!pred("sfCrosses", x1, x3))
    assert(pred("sfTouches", x1, x3))
    assert(pred("sfDisjoint", x1, x4))
    assert(pred("sfEquals", x1, line("LINESTRING(0 0, 2 2)")))
    assert(pred("sfIntersects", x1, x2))
  }

  test("geof:distance end-to-end with unit IRIs") {
    val g = Graft(Turtle.quadsToDF(spark, Nil))
    val res = g.select(
      """PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        |PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
        |PREFIX uom: <http://www.opengis.net/def/uom/OGC/1.0/>
        |SELECT ?m ?deg WHERE {
        |  BIND(geof:distance("Point(0 0)"^^geo:wktLiteral,
        |                     "Point(0 1)"^^geo:wktLiteral, uom:metre) AS ?m)
        |  BIND(geof:distance("Point(0 0)"^^geo:wktLiteral,
        |                     "Point(0 1)"^^geo:wktLiteral, uom:degree) AS ?deg)
        |}""".stripMargin)
    val row = res.select("m.num", "deg.num").collect()(0)
    assert(math.abs(row.getDouble(0) - 111195.0) < 100.0) // one degree of latitude
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
  }

  test("CRS mismatch and non-geometry inputs are errors") {
    val g = Graft(Turtle.quadsToDF(spark, Nil))
    val res = g.select(
      """PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        |PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
        |SELECT ?a ?b WHERE {
        |  BIND(geof:sfEquals("<http://other/crs> Point(0 0)"^^geo:wktLiteral,
        |                     "Point(0 0)"^^geo:wktLiteral) AS ?a)
        |  BIND(geof:sfEquals("notwkt"^^geo:wktLiteral,
        |                     "Point(0 0)"^^geo:wktLiteral) AS ?b)
        |}""".stripMargin)
    val row = res.collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
