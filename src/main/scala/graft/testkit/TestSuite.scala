package graft.testkit

import java.nio.file.{Files, Path, Paths}
import graft.model._
import graft.sources.Turtle

/**
 * W3C-style SPARQL test-manifest reader + result comparison — the Scala
 * counterpart of the reference's testsuite harness
 * (/root/reference/testsuite/src/manifest.rs, sparql_evaluator.rs). Manifests
 * are Turtle files typing tests (mf:QueryEvaluationTest, mf:PositiveSyntaxTest,
 * mf:NegativeSyntaxTest) with qt:query / qt:data / mf:result actions.
 */
object TestSuite {

  private val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val UT = "http://www.w3.org/2009/sparql/tests/test-update#"
  private val RDFS = "http://www.w3.org/2000/01/rdf-schema#"

  sealed trait Test { def name: String }
  final case class QueryEvalTest(name: String, query: Path, data: Option[Path],
                                 graphData: Seq[Path], result: Option[Path]) extends Test
  final case class SyntaxTest(name: String, query: Path, positive: Boolean,
                              isUpdate: Boolean = false) extends Test
  /** W3C SPARQL 1.1 Update evaluation test (ut: vocabulary): a .ru request
    * applied to a pre-state dataset, compared against a post-state dataset.
    * Named graphs are (label IRI, ttl file) pairs. */
  final case class UpdateEvalTest(name: String, request: Path,
                                  preDefault: Option[Path], preNamed: Seq[(String, Path)],
                                  postDefault: Option[Path], postNamed: Seq[(String, Path)]) extends Test

  /** Load a manifest.ttl: returns tests + included sub-manifests. */
  def load(manifest: Path): (Seq[Test], Seq[Path]) = {
    val dir = manifest.getParent
    val text = new String(Files.readAllBytes(manifest), java.nio.charset.StandardCharsets.UTF_8)
    val quads = Turtle.parse(text)
    val bySubj: Map[RdfTerm, Seq[RdfQuad]] = quads.groupBy(_.subject)
    def obj(s: RdfTerm, p: String): Option[RdfTerm] =
      bySubj.getOrElse(s, Nil).find(_.predicate.value == p).map(_.obj)
    def objs(s: RdfTerm, p: String): Seq[RdfTerm] =
      bySubj.getOrElse(s, Nil).filter(_.predicate.value == p).map(_.obj)
    def listOf(head: RdfTerm): Seq[RdfTerm] = {
      var cur = head; val buf = scala.collection.mutable.ArrayBuffer[RdfTerm]()
      while (cur != Iri(Rdf.nil)) {
        obj(cur, Rdf.first).foreach(buf += _)
        cur = obj(cur, Rdf.rest).getOrElse(Iri(Rdf.nil))
      }
      buf.toSeq
    }
    def path(t: RdfTerm): Path = t match {
      case Iri(v) => dir.resolve(v.stripPrefix("file://"))
      case other => throw new IllegalArgumentException(s"expected IRI file ref, got $other")
    }

    val includes = quads.filter(_.predicate.value == MF + "include")
      .flatMap(q => listOf(q.obj)).map(path)

    val entries = quads.filter(_.predicate.value == MF + "entries")
      .flatMap(q => listOf(q.obj))

    val tests = entries.flatMap { e =>
      val name = e match { case Iri(v) => v.substring(v.lastIndexOf('#') + 1); case o => o.toString }
      val tpe = obj(e, RDF + "type").collect { case Iri(v) => v }.getOrElse("")
      val action = obj(e, MF + "action")
      tpe match {
        case t if t == MF + "QueryEvaluationTest" =>
          action.map { a =>
            QueryEvalTest(name,
              query = obj(a, QT + "query").map(path).getOrElse(path(a)),
              data = obj(a, QT + "data").map(path),
              graphData = objs(a, QT + "graphData").map(path),
              result = obj(e, MF + "result").map(path))
          }
        case t if t == MF + "PositiveSyntaxTest" || t.endsWith("PositiveSyntaxTest11") =>
          action.map(a => SyntaxTest(name, path(a), positive = true))
        case t if t == MF + "PositiveUpdateSyntaxTest11" =>
          action.map(a => SyntaxTest(name, path(a), positive = true, isUpdate = true))
        case t if t == MF + "NegativeUpdateSyntaxTest11" =>
          action.map(a => SyntaxTest(name, path(a), positive = false, isUpdate = true))
        case t if t == MF + "NegativeSyntaxTest" || t.endsWith("NegativeSyntaxTest11") =>
          action.map(a => SyntaxTest(name, path(a), positive = false))
        case t if t == UT + "UpdateEvaluationTest" =>
          def named(node: RdfTerm): Seq[(String, Path)] =
            objs(node, UT + "graphData").map { g =>
              val label = obj(g, RDFS + "label").collect { case Lit(v, _, _) => v }
                .getOrElse(throw new IllegalArgumentException(s"ut:graphData without rdfs:label in $name"))
              val file = obj(g, UT + "graph").map(path)
                .getOrElse(throw new IllegalArgumentException(s"ut:graphData without ut:graph in $name"))
              (label, file)
            }
          for {
            a <- action
            req <- obj(a, UT + "request").map(path)
          } yield {
            val res = obj(e, MF + "result")
            UpdateEvalTest(name, req,
              preDefault = obj(a, UT + "data").map(path), preNamed = named(a),
              postDefault = res.flatMap(r => obj(r, UT + "data").map(path)),
              postNamed = res.map(named).getOrElse(Nil))
          }
        case _ => None // service/unknown types — out of scope (as in the reference)
      }
    }
    (tests, includes)
  }

  // -------------------------------------------------- SPARQL XML results (.srx)

  sealed trait Expected
  final case class ExpectedBoolean(value: Boolean) extends Expected
  final case class ExpectedSolutions(vars: Seq[String], rows: Seq[Map[String, RdfTerm]],
                                     ordered: Boolean) extends Expected

  def readSrx(p: Path): Expected = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(p.toFile)
    val booleans = doc.getElementsByTagName("boolean")
    if (booleans.getLength > 0)
      return ExpectedBoolean(booleans.item(0).getTextContent.trim.toBoolean)
    val vars = nodeList(doc.getElementsByTagName("variable")).map(
      _.getAttributes.getNamedItem("name").getNodeValue)
    require(vars.distinct.size == vars.size,
      s"duplicated variable names in result head: ${vars.mkString(", ")}")
    val rows = nodeList(doc.getElementsByTagName("result")).map { r =>
      nodeList(r.getChildNodes).filter(_.getNodeName == "binding").map { b =>
        val name = b.getAttributes.getNamedItem("name").getNodeValue
        val termNode = nodeList(b.getChildNodes).find(n => n.getNodeType == 1).get
        name -> xmlTerm(termNode)
      }.toMap
    }
    ExpectedSolutions(vars, rows, ordered = false)
  }

  private def xmlTerm(n: org.w3c.dom.Node): RdfTerm = n.getNodeName match {
    case "uri" => Iri(n.getTextContent)
    case "bnode" => BNode(n.getTextContent)
    case "literal" =>
      val attrs = n.getAttributes
      val lang = Option(attrs.getNamedItem("xml:lang")).map(_.getNodeValue)
      val dt = Option(attrs.getNamedItem("datatype")).map(_.getNodeValue)
      Lit(n.getTextContent,
        lang.map(_ => Rdf.langString).orElse(dt).getOrElse(Xsd.string),
        lang.map(_.toLowerCase))
    case other => throw new IllegalArgumentException(s"unknown term element <$other>")
  }

  private def nodeList(nl: org.w3c.dom.NodeList): Seq[org.w3c.dom.Node] =
    (0 until nl.getLength).map(nl.item)

  /** DAWG result-set RDF vocabulary (rs:ResultSet in a .ttl result file). */
  private val RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"

  /** Read an expected result encoded as rs:ResultSet triples; None if the
    * graph isn't a result set (→ compare as a plain graph). */
  def readRsResultSet(quads: Seq[RdfQuad]): Option[Expected] = {
    val bySubj = quads.groupBy(_.subject)
    def obj(s: RdfTerm, p: String): Option[RdfTerm] =
      bySubj.getOrElse(s, Nil).find(_.predicate.value == p).map(_.obj)
    def objs(s: RdfTerm, p: String): Seq[RdfTerm] =
      bySubj.getOrElse(s, Nil).filter(_.predicate.value == p).map(_.obj)
    val rsNode = quads.find(q => q.predicate.value == RDF + "type" &&
      q.obj == Iri(RS + "ResultSet")).map(_.subject).getOrElse(return None)
    obj(rsNode, RS + "boolean") match {
      case Some(Lit(v, _, _)) => return Some(ExpectedBoolean(v == "true"))
      case _ =>
    }
    val vars = objs(rsNode, RS + "resultVariable").collect { case Lit(v, _, _) => v }
    val sols = objs(rsNode, RS + "solution").map { sol =>
      val idx = obj(sol, RS + "index").collect { case Lit(v, _, _) => BigDecimal(v) }
      val bindings = objs(sol, RS + "binding").flatMap { b =>
        for {
          Lit(name, _, _) <- obj(b, RS + "variable")
          value <- obj(b, RS + "value")
        } yield name -> value
      }.toMap
      (idx, bindings)
    }
    val ordered = sols.forall(_._1.isDefined) && sols.nonEmpty
    val rows = if (ordered) sols.sortBy(_._1.get).map(_._2) else sols.map(_._2)
    Some(ExpectedSolutions(vars, rows, ordered))
  }

  // --------------------------------------------------------------- comparison

  /** Canonical comparison key for a term, value-normalising numeric literals
    * ("30" vs "30.0"^^decimal stay distinct — SPARQL results compare by term,
    * but "+30" and "30" normalise). */
  def termKey(t: RdfTerm): String = t match {
    case Iri(v) => s"<$v>"
    case BNode(_) => "_:b" // placeholder — bnode identity handled by isomorphism
    case Lit(v, dt, Some(l)) => s"\"$v\"@$l"
    case Lit(v, dt, None) if dt == null || dt == Xsd.string => s"\"$v\""
    case Lit(v, dt, None) if Xsd.numericTypes.contains(dt) =>
      val d = try BigDecimal(v).underlying.stripTrailingZeros.toPlainString catch { case _: Throwable => v }
      s"\"$d\"^^<$dt>"
    case Lit(v, dt, None) => s"\"$v\"^^<$dt>"
  }

  /**
   * Bag equality with blank-node isomorphism (backtracking over label
   * bijections — result sets are small), mirroring the reference's
   * sparql_evaluator.rs:285-384.
   */
  def solutionsEqual(actual: Seq[Map[String, RdfTerm]],
                     expected: Seq[Map[String, RdfTerm]],
                     ordered: Boolean = false): Boolean = {
    if (actual.size != expected.size) return false
    val aLabels = actual.flatMap(_.values).collect { case BNode(l) => l }.distinct
    val eLabels = expected.flatMap(_.values).collect { case BNode(l) => l }.distinct
    if (aLabels.size != eLabels.size) return false

    def rowsMatch(mapping: Map[String, String]): Boolean = {
      def key(m: Map[String, RdfTerm], useMapping: Boolean): Seq[(String, String)] =
        m.toSeq.map { case (v, t) =>
          val k = t match {
            case BNode(l) => "_:" + (if (useMapping) mapping.getOrElse(l, "?" + l) else l)
            case other => termKey(other)
          }
          v -> k
        }.sortBy(_._1)
      val a = actual.map(key(_, useMapping = true))
      val e = expected.map(key(_, useMapping = false))
      if (ordered) a == e
      else a.groupBy(identity).view.mapValues(_.size).toMap ==
        e.groupBy(identity).view.mapValues(_.size).toMap
    }

    if (aLabels.isEmpty) return rowsMatch(Map.empty)
    // backtracking over bijections (label sets are tiny in practice)
    def bt(remaining: Seq[String], available: Set[String], acc: Map[String, String]): Boolean =
      remaining match {
        case Nil => rowsMatch(acc)
        case l +: rest => available.exists(e => bt(rest, available - e, acc + (l -> e)))
      }
    bt(aLabels, eLabels.toSet, Map.empty)
  }
}
