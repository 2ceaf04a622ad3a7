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

  // ---- round-7 advice pins -------------------------------------------------

  test("xsd:time 24:00:00 is a valid lexical equal to 00:00:00 (end-of-day)") {
    import org.apache.spark.unsafe.types.UTF8String
    def tv(s: String) = graft.encoding.XsdTemporal.timeValue(
      UTF8String.fromString(s), UTF8String.fromString(Xsd.time))
    assert(tv("24:00:00") != null && tv("24:00:00") == tv("00:00:00"))
    assert(tv("24:00:00.000Z") == 0.0)
    assert(tv("24:00:00+01:00") == tv("00:00:00+01:00"))
    assert(tv("24:00:01") == null) // only exactly 24:00:00(.0*) is legal
    assert(tv("24:01:00") == null)
    // end-to-end: value-equal across the two lexicals
    val g = Graft(Turtle.quadsToDF(spark, Nil))
    val res = g.select("""SELECT (("24:00:00"^^xsd:time = "00:00:00"^^xsd:time) AS ?r) WHERE {}""")
    assert(res.select("r.v").collect()(0).getString(0) == "true")
  }

  test("durations with i64-range second counts parse and order (PT10000000000S)") {
    import org.apache.spark.unsafe.types.UTF8String
    def secs(s: String) = graft.encoding.XsdTemporal.durSeconds(
      UTF8String.fromString(s), UTF8String.fromString(Xsd.duration))
    assert(secs("PT10000000000S") == 1.0e10)
    assert(secs("P100000000000D") == 1.0e11 * 86400)
    assert(secs("-PT10000000000S") == -1.0e10)
    // months stay Int-guarded: absurd year counts still degrade to null
    assert(graft.encoding.XsdTemporal.durMonths(
      UTF8String.fromString("P999999999Y"), UTF8String.fromString(Xsd.duration)) == null)
    val g = Graft(Turtle.quadsToDF(spark, Nil))
    val res = g.select(
      """SELECT (("PT10000000000S"^^xsd:duration > "PT1S"^^xsd:duration) AS ?r) WHERE {}""")
    assert(res.select("r.v").collect()(0).getString(0) == "true")
  }

  test("MP3: 'TAG' bytes inside a frame at end-128 do not truncate the walk") {
    import graft.ops.Multimodal
    // id=1: no ID3v1 trailer (1 % 3 != 0) → stream ends on a frame boundary
    val clean = Multimodal.syntheticMp3Bytes(1L)
    val expect = Multimodal.decodeMp3Meta(1L, clean.clone())
    // plant 'TAG' at end-128 — payload bytes inside some frame, NOT a
    // frame boundary (the old heuristic trimmed here and then failed with
    // "truncated MPEG frame")
    val planted = clean.clone()
    val p = planted.length - 128
    planted(p) = 'T'; planted(p + 1) = 'A'; planted(p + 2) = 'G'
    val m = Multimodal.decodeMp3Meta(1L, planted)
    assert(m.n_frames == expect.n_frames && m.duration_ms == expect.duration_ms)
    // a REAL trailer (id=3: id%3==0) is still recognised at a frame boundary
    val tagged = Multimodal.syntheticMp3Bytes(3L)
    assert(Multimodal.decodeMp3Meta(3L, tagged).n_frames == 8 + 3)
  }

  test("Ogg CRC verification no longer mutates the caller's buffer") {
    import graft.ops.Multimodal
    val bytes = Multimodal.syntheticOggBytes(7L)
    val before = bytes.clone()
    val t = new Thread(() => { // concurrent reader must never observe zeros
      var i = 0
      while (i < 200) { assert(java.util.Arrays.equals(bytes, before)); i += 1 }
    })
    t.start()
    Multimodal.decodeOggMeta(7L, bytes)
    t.join()
    assert(java.util.Arrays.equals(bytes, before))
  }
}
