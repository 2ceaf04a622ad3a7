package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Iri
import graft.sparql.{Algebra, SparqlParser, UpdateDatasetRewrite}
import graft.sparql.Algebra._

/** Text-level splice of protocol dataset parameters into an update request
  * (USING / USING NAMED clauses): keyword detection must be lexical —
  * braces and keywords inside string literals, IRIs, comments, or prefixed
  * names must not confuse it — and the result must parse to the ops the
  * executor would have run with the protocol parameters. */
class UpdateDatasetRewriteSpec extends AnyFunSuite {

  private val g1 = Seq(Iri("urn:g1"))
  private val n1 = Seq(Iri("urn:n1"))

  private def modifies(text: String): Seq[Modify] =
    SparqlParser.parseUpdate(text).ops.collect { case m: Modify => m }

  test("Modify gains the USING clauses before WHERE") {
    val out = UpdateDatasetRewrite.spliceUsing(
      "DELETE { ?s ?p ?o } INSERT { ?s ?p <urn:new> } WHERE { ?s ?p ?o }", g1, n1)
    val Seq(m) = modifies(out)
    assert(m.usingDefault == Seq(Iri("urn:g1")) && m.usingNamed == Seq(Iri("urn:n1")))
  }

  test("DELETE WHERE becomes its Modify equivalent with USING") {
    val out = UpdateDatasetRewrite.spliceUsing(
      "DELETE WHERE { ?s <urn:p> ?o . GRAPH <urn:g> { ?s <urn:q> ?o } }", g1, Nil)
    val Seq(m) = modifies(out)
    assert(m.usingDefault == Seq(Iri("urn:g1")))
    assert(m.delete.nonEmpty && m.delete.toSet ==
      SparqlParser.parseUpdate(
        "DELETE WHERE { ?s <urn:p> ?o . GRAPH <urn:g> { ?s <urn:q> ?o } }")
        .ops.collect { case DeleteWhere(qs) => qs }.head.toSet)
  }

  test("ops without WHERE pass through untouched") {
    val text = "INSERT DATA { <urn:a> <urn:p> \"WHERE { not a keyword }\" } ;\n" +
      "LOAD SILENT <file:///tmp/x.nt> ;\nCLEAR ALL"
    assert(UpdateDatasetRewrite.spliceUsing(text, g1, Nil) == text)
  }

  test("keywords and braces inside literals, comments, and IRIs are inert") {
    val text =
      """# DELETE WHERE { in a comment }
        |INSERT { ?s <urn:note> "a } brace and a WHERE keyword" }
        |WHERE { ?s <urn:p> 'WHERE' ; <urn:q> '''multi
        |line } WHERE {''' . FILTER(?s != <urn:WHERE#where>) }""".stripMargin
    val out = UpdateDatasetRewrite.spliceUsing(text, g1, Nil)
    val Seq(m) = modifies(out)
    assert(m.usingDefault == Seq(Iri("urn:g1")))
    // the only change is one clause before the real WHERE
    assert(out.replace("USING <urn:g1> ", "") == text)
  }

  test("prefixed local names spelling WHERE are not keywords") {
    val text = "PREFIX ex: <urn:ex#>\nDROP GRAPH ex:WHERE ;\n" +
      "INSERT { ?s ex:p ?o } WHERE { ?s ex:q ?o }"
    val out = UpdateDatasetRewrite.spliceUsing(text, g1, Nil)
    assert(out.contains("DROP GRAPH ex:WHERE ;"), "local name rewritten")
    val Seq(m) = modifies(out)
    assert(m.usingDefault == Seq(Iri("urn:g1")))
  }

  test("multi-op requests splice every pattern-bearing op") {
    val out = UpdateDatasetRewrite.spliceUsing(
      "INSERT DATA { <urn:a> <urn:p> <urn:b> } ;\n" +
        "DELETE { ?s ?p ?o } WHERE { ?s ?p ?o } ;\n" +
        "DELETE WHERE { ?x <urn:q> ?y }", g1, Nil)
    val req = SparqlParser.parseUpdate(out)
    assert(req.ops.size == 3)
    assert(modifies(out).size == 2 && modifies(out).forall(_.usingDefault == Seq(Iri("urn:g1"))))
    assert(req.ops.head.isInstanceOf[Algebra.InsertData])
  }

  test("comparison operator '<' inside expressions does not start an IRI skip") {
    val out = UpdateDatasetRewrite.spliceUsing(
      "DELETE { ?s <urn:p> ?o } WHERE { ?s <urn:p> ?o . FILTER(?o < 5 && ?o > { } = 0) }",
      g1, Nil)
    // (the FILTER body is nonsense SPARQL — this test only pins the SCANNER:
    // the '<' must not swallow the braces that close the WHERE group)
    assert(out.contains("USING <urn:g1> WHERE"))
  }
}
