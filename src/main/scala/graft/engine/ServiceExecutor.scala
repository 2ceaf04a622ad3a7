package graft.engine

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import graft.model._
import graft.sparql.Algebra._

/**
 * SERVICE federation — executes a federated pattern against a remote
 * SPARQL-protocol endpoint and returns its solutions as a local relation.
 *
 * Beyond the reference: rdf-fusion parses SERVICE but evaluates it as a
 * lazily-erroring stream (its testsuite ignores federation). We execute
 * BGP-bodied SERVICE blocks for real over the SPARQL protocol (GET
 * `?query=`, `Accept: application/sparql-results+json`) — which includes
 * federating against [[graft.web.SparqlServer]] itself. Non-BGP bodies
 * keep the reference's observable empty-relation behaviour.
 *
 * Scale posture: federation is inherently endpoint-bound — the remote
 * endpoint computes the pattern; the driver receives the solution set and
 * ships it to executors as a (broadcastable) local relation, which is the
 * standard federated-SPARQL execution model (cf. SERVICE handling in Jena
 * ARQ / Virtuoso). Join ordering then treats it like a VALUES block.
 */
object ServiceExecutor {

  /** Transport, replaceable for tests: (endpointUrl, queryText) → response
    * body expected to be application/sparql-results+json. */
  @volatile var transport: (String, String) => String = httpGet

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  private def httpGet(endpoint: String, query: String): String = {
    val sep = if (endpoint.contains("?")) "&" else "?"
    val uri = URI.create(endpoint + sep + "query=" + URLEncoder.encode(query, UTF_8))
    val req = HttpRequest.newBuilder(uri)
      .header("Accept", "application/sparql-results+json")
      .timeout(Duration.ofSeconds(60)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"SERVICE endpoint returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  /** Run `queryText` remotely; returns (vars, rows). */
  def execute(endpoint: String, queryText: String): (Seq[String], Seq[Map[String, RdfTerm]]) =
    Results.readJson(transport(endpoint, queryText)) match {
      case Results.ReadSolutions(vars, rows) => (vars, rows)
      case other => throw new RuntimeException(s"SERVICE endpoint returned a non-solutions result: $other")
    }

  /**
   * Serialise a SERVICE body back to SPARQL text. Supported: basic graph
   * patterns (incl. blank nodes as variables — standard SERVICE semantics),
   * conjunctions, UNION, OPTIONAL (with or without a serialisable filter
   * condition), and FILTERs over the serialisable expression subset
   * (comparisons, logic, arithmetic, IN, BOUND, and builtin calls with
   * serialisable arguments). Anything else returns None and the caller
   * falls back to the reference's empty-relation behaviour.
   */
  def render(p: GraphPattern): Option[String] =
    renderPattern(p).map(body => s"SELECT * WHERE {\n$body\n}")

  private def renderPattern(p: GraphPattern): Option[String] = p match {
    case Bgp(ps) =>
      Some(ps.map(tp => s"  ${slot(tp.s)} ${slot(tp.p)} ${slot(tp.o)} .").mkString("\n"))
    case Join(l, r) =>
      for (a <- renderPattern(l); b <- renderPattern(r)) yield s"$a\n$b"
    case Filter(e, inner) =>
      for (i <- renderPattern(inner); f <- renderExpr(e)) yield s"$i\n  FILTER($f)"
    case Union(l, r) =>
      for (a <- renderPattern(l); b <- renderPattern(r))
        yield s"  {\n$a\n  } UNION {\n$b\n  }"
    case LeftJoin(l, r, cond) =>
      val condStr = cond match {
        case None => Some("")
        case Some(e) => renderExpr(e).map(f => s"\n  FILTER($f)")
      }
      for (a <- renderPattern(l); b <- renderPattern(r); c <- condStr)
        yield s"$a\n  OPTIONAL {\n$b$c\n  }"
    case _ => None
  }

  /** Serialisable expression subset → SPARQL text (None = unsupported). */
  private def renderExpr(e: Expr): Option[String] = e match {
    case ETerm(t) => Some(renderTerm(t))
    case EVar(v) => Some(s"?${v.name}")
    case EOr(l, r) => bin(l, r, "||")
    case EAnd(l, r) => bin(l, r, "&&")
    case ENot(x) => renderExpr(x).map(s => s"(!($s))")
    case ECmp(op, l, r) => bin(l, r, op)
    case EArith(op, l, r) => bin(l, r, op)
    case ENeg(x) => renderExpr(x).map(s => s"(-($s))")
    case EBound(v) => Some(s"BOUND(?${v.name})")
    case EIn(x, list, neg) =>
      for (s <- renderExpr(x); items <- traverse(list)) yield
        s"($s ${if (neg) "NOT IN" else "IN"} (${items.mkString(", ")}))"
    case ECall(name, args) if !name.contains(":") || name.startsWith("http") =>
      // builtin (parser keyword) or full-IRI custom function
      traverse(args).map { as =>
        val fn = if (name.startsWith("http")) s"<$name>" else name
        s"$fn(${as.mkString(", ")})"
      }
    case _ => None // EXISTS / IF / COALESCE / aggregates: not serialised (yet)
  }

  private def bin(l: Expr, r: Expr, op: String): Option[String] =
    for (a <- renderExpr(l); b <- renderExpr(r)) yield s"($a $op $b)"

  private def traverse(es: Seq[Expr]): Option[Seq[String]] = {
    val rs = es.map(renderExpr)
    if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
  }

  private def slot(t: TermPattern): String = t match {
    case VarPat(v) => s"?${v.name}"
    case BNodePat(l) => s"?__bn_$l" // bnodes in patterns are non-selectable variables
    case TermPat(term) => renderTerm(term)
  }

  private def renderTerm(t: RdfTerm): String = t match {
    case Iri(v) => s"<$v>"
    case BNode(id) => s"_:$id"
    case Lit(v, dt, lang) =>
      val esc = v.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c => c.toString
      }
      lang match {
        case Some(l) => s""""$esc"@$l"""
        case None if dt == null || dt == Xsd.string => s""""$esc""""
        case None => s""""$esc"^^<$dt>"""
      }
  }
}
