package graft

import graft.model._
import graft.sources.{NTriples, RdfXml, Turtle}

/**
 * Turtle / TriG / RDF/XML dump round-trips: serialise a dataset with the
 * distributed writers, parse it back with our own readers, and require the
 * same triple/quad set (readers and writers validate each other).
 */
class RdfWritersSpec extends SparkSpec {

  private def store = QuadStore.empty(spark).insert(Seq(
    RdfQuad(None, Iri("http://ex.org/s1"), Iri("http://ex.org/p"), Iri("http://ex.org/o")),
    RdfQuad(None, Iri("http://ex.org/s1"), Iri("http://ex.org/q"), Lit("plain \"quoted\"", Xsd.string, None)),
    RdfQuad(None, Iri("http://ex.org/s1"), Iri("http://ex.org/q"), Lit("zwei", Rdf.langString, Some("de"))),
    RdfQuad(None, Iri("http://ex.org/s2"), Iri("http://ex.org/n"), Lit("42", Xsd.integer, None)),
    RdfQuad(None, Iri("http://ex.org/s2"), Iri("http://ex.org/m"), Lit("line\nbreak & <tag>", Xsd.string, None))))

  private def tripleSet(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    rows(df.selectExpr("subject", "predicate", "object"), "subject", "predicate", "object")
      .map(_.toSeq)

  test("Turtle dump round-trips through our Turtle reader") {
    val dir = java.nio.file.Files.createTempDirectory("ttl").toString + "/out"
    store.dumpTurtle(dir)
    val back = Turtle.readAll(spark, dir + "/part-*")
    assert(tripleSet(back) == tripleSet(store.quads))
  }

  test("TriG dump round-trips incl. named graphs") {
    val g = Iri("http://ex.org/g1")
    val withGraphs = store.insert(Seq(
      RdfQuad(Some(g), Iri("http://ex.org/s3"), Iri("http://ex.org/p"), Lit("in graph", Xsd.string, None))))
    val dir = java.nio.file.Files.createTempDirectory("trig").toString + "/out"
    withGraphs.dumpTriG(dir)
    // our Turtle parser handles TriG GRAPH blocks; concatenate part files
    val text = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(p => p.contains("part-") && !p.endsWith(".crc")).sorted
      .map(p => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
      .mkString("\n")
    val back = Turtle.parse(text)
    assert(back.size == 6)
    assert(back.count(_.graph.contains(g)) == 1)
    val backDefault = back.filter(_.graph.isEmpty).map(q => (q.subject, q.predicate, q.obj)).toSet
    val expected = Turtle.quadsToDF(spark, back.filter(_.graph.isEmpty))
    assert(tripleSet(expected) == tripleSet(store.quads))
    assert(backDefault.size == 5)
  }

  test("RDF/XML dump round-trips through our RDF/XML reader") {
    val dir = java.nio.file.Files.createTempDirectory("rdfxml").toString + "/out"
    store.dumpRdfXml(dir)
    val back = RdfXml.readAll(spark, dir + "/part-*")
    assert(tripleSet(back) == tripleSet(store.quads))
  }

  test("RDF/XML dump escapes ']]>' and round-trips it") {
    val s = QuadStore.empty(spark).insert(Seq(
      RdfQuad(None, Iri("http://ex.org/s"), Iri("http://ex.org/p"),
        Lit("cdata ]]> end > also", Xsd.string, None))))
    val dir = java.nio.file.Files.createTempDirectory("rdfxmlgt").toString + "/out"
    s.dumpRdfXml(dir)
    val text = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(p => p.contains("part-") && !p.endsWith(".crc"))
      .map(p => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
      .mkString("\n")
    assert(!text.contains("]]>"), "raw ]]> must never appear in XML content")
    val back = RdfXml.readAll(spark, dir + "/part-*")
    assert(tripleSet(back) == tripleSet(s.quads))
  }

  test("RDF/XML dump fails loudly on XML-1.0-unrepresentable control chars") {
    val s = QuadStore.empty(spark).insert(Seq(
      RdfQuad(None, Iri("http://ex.org/s"), Iri("http://ex.org/p"),
        Lit("bad " + '' + " ctrl", Xsd.string, None))))
    val dir = java.nio.file.Files.createTempDirectory("rdfxmlbad").toString + "/out"
    val e = intercept[Throwable](s.dumpRdfXml(dir))
    // raise_error surfaces as SparkRuntimeException (direct) or wrapped in
    // SparkException depending on where in the task it fires
    def chain(t: Throwable): List[Throwable] =
      t :: Option(t.getCause).map(chain).getOrElse(Nil)
    assert(chain(e).exists(_.getMessage != null))
  }

  test("dumpTurtle refuses datasets with named graphs") {
    val g = Iri("http://ex.org/g1")
    val withGraphs = store.insert(Seq(
      RdfQuad(Some(g), Iri("http://ex.org/s3"), Iri("http://ex.org/p"), Lit("x", Xsd.string, None))))
    intercept[IllegalArgumentException](withGraphs.dumpTurtle(
      java.nio.file.Files.createTempDirectory("ttl2").toString + "/out"))
  }
}
