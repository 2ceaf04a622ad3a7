package graft

import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.geo.Geo
import graft.model._
import graft.ops.{Similarity, TextAnalysis}
import graft.sources.{RdfXml, Turtle}

/** Regression pins for the round-2 review findings. */
class ReviewFixesSpec extends SparkSpec {

  test("AVG(DISTINCT) divides by distinct-value cardinality (both dispatch paths)") {
    // values {2.0, 2.0, 4.0} → Avg(Distinct) = (2+4)/2 = 3.0, not 6/3
    val nt =
      """<urn:s1> <urn:v> "2.0"^^<http://www.w3.org/2001/XMLSchema#double> .
        |<urn:s2> <urn:v> "2.0"^^<http://www.w3.org/2001/XMLSchema#double> .
        |<urn:s3> <urn:v> "4.0"^^<http://www.w3.org/2001/XMLSchema#double> .""".stripMargin
    val g = Graft(graft.sources.NTriples.fromString(spark, nt))
    val res = g.select("SELECT (AVG(DISTINCT ?v) AS ?a) WHERE { ?s <urn:v> ?v }")
    assert(res.select(col("a.num")).collect()(0).getDouble(0) == 3.0)
  }

  test("line/line: collinear overlap is sfOverlaps, X-crossing is sfCrosses — not both") {
    def line(s: String) = Geo.parseWkt(s).get
    def pred(n: String, a: Geo.Geom, b: Geo.Geom) = Geo.predicate(n, a, b).get
    val collinearA = line("LINESTRING(0 0, 2 0)")
    val collinearB = line("LINESTRING(1 0, 3 0)") // 1-dim shared run
    assert(pred("sfOverlaps", collinearA, collinearB))
    assert(!pred("sfCrosses", collinearA, collinearB))
    val xA = line("LINESTRING(0 0, 2 2)")
    val xB = line("LINESTRING(0 2, 2 0)") // 0-dim crossing point
    assert(pred("sfCrosses", xA, xB))
    assert(!pred("sfOverlaps", xA, xB))
  }

  test("carriage returns survive Turtle and RDF/XML dump round-trips") {
    val store = QuadStore.empty(spark).insert(Seq(
      RdfQuad(None, Iri("http://e/s"), Iri("http://e/p"),
        Lit("a\rb\nc", Xsd.string, None))))
    val td = java.nio.file.Files.createTempDirectory("cr").toString
    store.dumpTurtle(td + "/ttl")
    val backT = Turtle.readAll(spark, td + "/ttl/part-*")
    assert(backT.select("object.v").collect()(0).getString(0) == "a\rb\nc")
    store.dumpRdfXml(td + "/xml")
    val backX = RdfXml.readAll(spark, td + "/xml/part-*")
    assert(backX.select("object.v").collect()(0).getString(0) == "a\rb\nc")
  }

  test("rollingFingerprints supports bandSize > 16") {
    val df = spark.createDataFrame(Seq(
      (1L, "one two three four five six seven eight nine ten eleven twelve " * 8)))
      .toDF("doc_id", "text")
    val bands = TextAnalysis.rollingFingerprints(df, "doc_id", "text", bandSize = 32)
      .select("band").collect().map(_.getInt(0)).toSet
    assert(bands.exists(_ >= 16), s"expected bands above 15, got $bands")
    intercept[IllegalArgumentException](
      TextAnalysis.rollingFingerprints(df, "doc_id", "text", bandSize = 500))
  }

  test("ANN ops return empty results on an empty corpus (no crash)") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    assert(Similarity.annTopK(empty, "vec_id", "embedding", 0L, 5).count() == 0)
    assert(Similarity.nearDupPairs(empty, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("geof functions work via `new Graft` direct construction") {
    val g = new Graft(Turtle.quadsToDF(spark, Nil))
    val res = g.select(
      """PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        |PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
        |SELECT ?r WHERE { BIND(geof:sfEquals("Point(1 1)"^^geo:wktLiteral,
        |                                     "Point(1 1)"^^geo:wktLiteral) AS ?r) }""".stripMargin)
    assert(res.select("r.v").collect()(0).getString(0) == "true")
  }
}
