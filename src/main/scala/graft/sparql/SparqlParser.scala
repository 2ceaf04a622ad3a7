package graft.sparql

import scala.util.parsing.combinator.RegexParsers
import graft.model._
import Algebra._

/**
 * SPARQL 1.1 Query parser → [[Algebra]].
 *
 * The reference delegates parsing to the `spargebra` crate
 * (/root/reference/lib/execution/src/sparql/algebra.rs); we implement the
 * grammar directly with scala-parser-combinators (ships with Spark). Covers
 * SELECT / ASK / CONSTRUCT / DESCRIBE with BGPs, property paths, FILTER,
 * OPTIONAL, UNION, MINUS, GRAPH, BIND, VALUES, sub-selects, EXISTS,
 * aggregation, solution modifiers, and the builtin function vocabulary.
 * Not covered (also unimplemented in the reference — SURVEY §3.3): UPDATE,
 * SERVICE/federation, SPARQL-star.
 */
class SparqlParser extends RegexParsers {

  override protected val whiteSpace = """(\s|#[^\n\r]*)+""".r

  private var prefixes = Map.empty[String, String]
  private var baseIri: Option[String] = None
  private var bnodeCounter = 0
  // digit-leading label: the BLANK lexer requires [A-Za-z_] first, so a
  // generated label can never collide with a user-written one (the §19.6
  // scope validation would otherwise conflate them)
  private def freshBNode(): BNodePat = { bnodeCounter += 1; BNodePat(s"${bnodeCounter}a") }

  private def kw(s: String): Parser[String] = ("(?i)\\b" + s + "\\b").r ^^ (_.toUpperCase)

  // -------------------------------------------------------------- terminals

  private val IRIREF = """<[^<>"{}|^`\\\u0000- ]*>""".r
  // NB: PN_LOCAL may contain but not END with '.' (the statement terminator)
  private val PNAME = """[A-Za-z][\w-]*:[\w](?:[\w.-]*[\w-])?|[A-Za-z][\w-]*:|:[\w](?:[\w.-]*[\w-])?|:""".r
  private val VARNAME = """[?$][A-Za-z0-9_][\w]*""".r
  private val BLANK = """_:[A-Za-z_][\w.-]*""".r
  private val LANGTAG = """@[a-zA-Z]+(-[a-zA-Z0-9]+)*""".r
  private val DOUBLE_RE = """[0-9]*\.?[0-9]+[eE][+-]?[0-9]+""".r
  private val DECIMAL_RE = """[0-9]*\.[0-9]+""".r
  private val INTEGER_RE = """[0-9]+""".r
  private val STRING_RE =
    ("\"\"\"(?s)(.*?)\"\"\"|'''(?s)(.*?)'''|\"((?:[^\"\\\\\\n\\r]|\\\\.)*)\"|'((?:[^'\\\\\\n\\r]|\\\\.)*)'").r

  def iriRef: Parser[Iri] = IRIREF ^^ { s =>
    val raw = s.substring(1, s.length - 1)
    Iri(resolveBase(raw))
  }

  private def resolveBase(i: String): String =
    if (i.contains(":") || baseIri.isEmpty) i else baseIri.get + i

  def prefixedName: Parser[Iri] = PNAME ^^ { s =>
    val idx = s.indexOf(':')
    val (p, local) = (s.substring(0, idx), s.substring(idx + 1))
    prefixes.get(p) match {
      case Some(ns) => Iri(ns + local)
      case None => throw new IllegalArgumentException(s"undefined prefix '$p:'")
    }
  }

  def iri: Parser[Iri] = iriRef | prefixedName

  def variable: Parser[Var] = VARNAME ^^ { s => Var(s.substring(1)) }

  def blankNode: Parser[BNodePat] = BLANK ^^ { s => BNodePat(s.substring(2)) } |
    "[" ~ "]" ^^ { _ => freshBNode() }

  def rdfLiteral: Parser[Lit] = STRING_RE ~ opt(LANGTAG | "^^" ~> iri) ^^ {
    case s ~ suffix =>
      val lex = NtUnescape(stripQuotes(s))
      suffix match {
        case Some(lang: String) => Lit(lex, Rdf.langString, Some(lang.substring(1).toLowerCase))
        case Some(dt: Iri) => Lit(lex, dt.value, None)
        case _ => Lit(lex, Xsd.string, None)
      }
  }

  private def stripQuotes(s: String): String =
    if (s.startsWith("\"\"\"") || s.startsWith("'''")) s.substring(3, s.length - 3)
    else s.substring(1, s.length - 1)

  def numericLiteral: Parser[Lit] =
    DOUBLE_RE ^^ (s => Lit(s, Xsd.double, None)) |
    DECIMAL_RE ^^ (s => Lit(s, Xsd.decimal, None)) |
    INTEGER_RE ^^ (s => Lit(s, Xsd.integer, None))

  def booleanLiteral: Parser[Lit] =
    kw("true") ^^ (_ => Lit.boolean(true)) | kw("false") ^^ (_ => Lit.boolean(false))

  def literal: Parser[Lit] = rdfLiteral | numericLiteral | booleanLiteral

  // -------------------------------------------------------------- prologue

  def prologue: Parser[Unit] = rep(prefixDecl | baseDecl) ^^ (_ => ())

  def prefixDecl: Parser[Unit] = kw("PREFIX") ~> """[A-Za-z][\w-]*:|:""".r ~ IRIREF ^^ {
    case p ~ i =>
      prefixes += (p.dropRight(1) -> i.substring(1, i.length - 1)); ()
  }

  def baseDecl: Parser[Unit] = kw("BASE") ~> IRIREF ^^ { i =>
    baseIri = Some(i.substring(1, i.length - 1)); ()
  }

  // ---------------------------------------------------------------- queries

  def query: Parser[Query] = prologue ~> (selectQuery | constructQuery | askQuery | describeQuery)

  def datasetClauses: Parser[(Seq[Iri], Seq[Iri])] =
    rep(kw("FROM") ~> opt(kw("NAMED")) ~ iri) ^^ { cs =>
      val named = cs.collect { case Some(_) ~ i => i }
      val default = cs.collect { case None ~ i => i }
      (default, named)
    }

  def selectQuery: Parser[SelectQuery] =
    selectClause ~ datasetClauses ~ whereClause ~ solutionModifier ~ opt(valuesClause) ^^ {
      case (dist, red, proj) ~ ds ~ where ~ mods ~ vals =>
        buildSelect(dist, red, proj, where, mods, ds, vals)
    }

  /** (distinct, reduced, projection) — empty projection = '*' */
  def selectClause: Parser[(Boolean, Boolean, Seq[ProjItem])] =
    kw("SELECT") ~> opt(kw("DISTINCT") | kw("REDUCED")) ~ projection ^^ {
      case mod ~ proj => (mod.contains("DISTINCT"), mod.contains("REDUCED"), proj)
    }

  def projection: Parser[Seq[ProjItem]] =
    "*" ^^ (_ => Nil) |
    rep1(variable ^^ (v => ProjItem(v, None)) |
      "(" ~> expression ~ (kw("AS") ~> variable) <~ ")" ^^ { case e ~ v => ProjItem(v, Some(e)) })

  def whereClause: Parser[GraphPattern] = opt(kw("WHERE")) ~> groupGraphPattern

  final case class Mods(groupBy: Seq[(Var, Option[Expr])], having: Option[Expr],
                        orderBy: Seq[OrderCond], offset: Option[Long], limit: Option[Long])

  def solutionModifier: Parser[Mods] =
    opt(groupClause) ~ opt(havingClause) ~ opt(orderClause) ~ limitOffset ^^ {
      case g ~ h ~ o ~ lo => Mods(g.getOrElse(Nil), h, o.getOrElse(Nil), lo._2, lo._1)
    }

  def groupClause: Parser[Seq[(Var, Option[Expr])]] =
    kw("GROUP") ~> kw("BY") ~> rep1(groupCondition)

  private var anonVarCounter = 0
  private def freshVar(prefix: String): Var = { anonVarCounter += 1; Var(s"__${prefix}_$anonVarCounter") }

  def groupCondition: Parser[(Var, Option[Expr])] = {
    // §18.2.4: group keys are plain expressions; an aggregate inside a
    // GROUP BY key is circular and rejected (the reference parser does too)
    def noAgg(e: Expr): Expr = {
      if (Algebra.containsAggregate(e))
        throw new IllegalArgumentException("aggregates are not allowed in GROUP BY")
      e
    }
    variable ^^ (v => (v, None)) |
    "(" ~> expression ~ opt(kw("AS") ~> variable) <~ ")" ^^ {
      case e ~ Some(v) => (v, Some(noAgg(e)))
      case e ~ None => (freshVar("gk"), Some(noAgg(e)))
    } |
    (builtInCall | iriFunctionCall) ^^ (e => (freshVar("gk"), Some(noAgg(e))))
  }

  def havingClause: Parser[Expr] = kw("HAVING") ~> rep1(constraint) ^^ (cs => cs.reduce(EAnd))

  def orderClause: Parser[Seq[OrderCond]] = kw("ORDER") ~> kw("BY") ~> rep1(orderCondition)

  def orderCondition: Parser[OrderCond] =
    kw("ASC") ~> brackettedExpr ^^ (e => OrderCond(e, ascending = true)) |
    kw("DESC") ~> brackettedExpr ^^ (e => OrderCond(e, ascending = false)) |
    (variable ^^ (v => OrderCond(EVar(v), ascending = true))) |
    (constraint ^^ (e => OrderCond(e, ascending = true)))

  def limitOffset: Parser[(Option[Long], Option[Long])] =
    kw("LIMIT") ~> INTEGER_RE ~ opt(kw("OFFSET") ~> INTEGER_RE) ^^ {
      case l ~ o => (Some(l.toLong), o.map(_.toLong)) } |
    kw("OFFSET") ~> INTEGER_RE ~ opt(kw("LIMIT") ~> INTEGER_RE) ^^ {
      case o ~ l => (l.map(_.toLong), Some(o.toLong)) } |
    success((None, None))

  def constructQuery: Parser[ConstructQuery] =
    kw("CONSTRUCT") ~> constructTemplate ~ datasetClauses ~ whereClause ~ solutionModifier ~
      opt(valuesClause) ^^ {
      case tpl ~ ds ~ where ~ mods ~ vals =>
        val w = vals match { case Some(v) => Join(where, v); case None => where }
        ConstructQuery(tpl, w, mods.orderBy, mods.offset, mods.limit, ds._1, ds._2,
          baseIri, prefixes)
    } |
    // CONSTRUCT WHERE { triples } shorthand: the pattern is the template
    kw("CONSTRUCT") ~> datasetClauses ~ (kw("WHERE") ~> constructTemplate) ~ solutionModifier ^^ {
      case ds ~ tpl ~ mods =>
        ConstructQuery(tpl, Bgp(tpl), mods.orderBy, mods.offset, mods.limit, ds._1, ds._2,
          baseIri, prefixes)
    }

  def constructTemplate: Parser[Seq[TriplePattern]] = "{" ~> triplesBlock <~ "}"

  def askQuery: Parser[AskQuery] =
    kw("ASK") ~> datasetClauses ~ (opt(kw("WHERE")) ~> groupGraphPattern) ~ opt(valuesClause) ^^ {
      case ds ~ where ~ vals =>
        val w = vals match { case Some(v) => Join(where, v); case None => where }
        AskQuery(w, ds._1, ds._2, baseIri, prefixes)
    }

  def describeQuery: Parser[DescribeQuery] =
    kw("DESCRIBE") ~> (("*" ^^ (_ => Nil) | rep1(varOrIriPat)) ~ datasetClauses ~
      opt(kw("WHERE") ~> groupGraphPattern | groupGraphPattern)) ~ opt(valuesClause) ^^ {
      case ts ~ ds ~ where ~ vals =>
        // ValuesClause sits at the Query level (grammar rule [1]) — it
        // applies to DESCRIBE too
        val w = vals match {
          case Some(v) => Some(where.map(Join(_, v)).getOrElse(v))
          case None => where
        }
        DescribeQuery(ts, w, ds._1, ds._2, baseIri, prefixes)
    }

  private def varOrIriPat: Parser[TermPattern] =
    variable ^^ (VarPat(_)) | iri ^^ (TermPat(_))

  /** SELECT-level translation: aggregate hoisting (spec §18.2.4). */
  private def buildSelect(distinct: Boolean, reduced: Boolean, proj: Seq[ProjItem],
                          where0: GraphPattern, mods: Mods,
                          ds: (Seq[Iri], Seq[Iri]),
                          trailingValues: Option[ValuesPattern] = None): SelectQuery = {
    var aggs = Vector.empty[(Var, Aggregate)]
    def hoist(e: Expr): Expr = e match {
      case EAgg(a) =>
        aggs.find(_._2 == a) match {
          case Some((v, _)) => EVar(v)
          case None => val v = freshVar("agg"); aggs :+= (v -> a); EVar(v)
        }
      case EOr(l, r) => EOr(hoist(l), hoist(r))
      case EAnd(l, r) => EAnd(hoist(l), hoist(r))
      case ENot(x) => ENot(hoist(x))
      case ECmp(op, l, r) => ECmp(op, hoist(l), hoist(r))
      case EIn(x, list, n) => EIn(hoist(x), list.map(hoist), n)
      case EArith(op, l, r) => EArith(op, hoist(l), hoist(r))
      case ENeg(x) => ENeg(hoist(x))
      case EIf(c, t, f) => EIf(hoist(c), hoist(t), hoist(f))
      case ECoalesce(args) => ECoalesce(args.map(hoist))
      case ECall(n, args) => ECall(n, args.map(hoist))
      case other => other
    }
    val projH = proj.map(p => p.copy(expr = p.expr.map(hoist)))
    val havingH = mods.having.map(hoist)
    val orderH = mods.orderBy.map(o => o.copy(expr = hoist(o.expr)))
    val grouped = mods.groupBy.nonEmpty || aggs.nonEmpty
    val where1 =
      if (grouped) {
        val g = Group(where0, mods.groupBy, aggs)
        havingH match { case Some(h) => Filter(h, g); case None => g }
      } else where0
    // trailing VALUES (grammar rule ValuesClause): joined AFTER grouping and
    // HAVING, before projection — spec §18.2.4.3's position in the modifier
    // conversion order
    val where = trailingValues match {
      case Some(v) => Join(where1, v)
      case None => where1
    }
    SelectQuery(projH, distinct, reduced, where, mods.groupBy, None, orderH,
      mods.offset, mods.limit, ds._1, ds._2, baseIri, prefixes)
  }

  // ----------------------------------------------------------- group pattern

  def groupGraphPattern: Parser[GraphPattern] =
    "{" ~> (subSelectPattern | groupGraphPatternSub) <~ "}"

  def subSelectPattern: Parser[GraphPattern] =
    selectClause ~ whereClause ~ solutionModifier ~ opt(valuesClause) ^^ {
      case (d, r, proj) ~ where ~ mods ~ vals =>
        // §18.2.4.3: a sub-select's trailing VALUES joins with its solutions
        // BEFORE projection (same position as the main-query path) — joining
        // outside the SubSelect would cross-join against already-projected
        // rows and leak the VALUES bindings into the outer scope
        SubSelect(buildSelect(d, r, proj, where, mods, (Nil, Nil), vals))
    }

  def valuesClause: Parser[ValuesPattern] = kw("VALUES") ~> dataBlock

  private sealed trait GElem
  private case class GTriples(ps: Seq[TriplePattern], paths: Seq[PathPattern]) extends GElem
  private case class GFilter(e: Expr) extends GElem
  private case class GOptional(p: GraphPattern) extends GElem
  private case class GMinus(p: GraphPattern) extends GElem
  private case class GLateral(p: GraphPattern) extends GElem
  private case class GBind(v: Var, e: Expr) extends GElem
  private case class GValues(v: ValuesPattern) extends GElem
  private case class GGraph(n: TermPattern, p: GraphPattern) extends GElem
  private case class GSub(p: GraphPattern) extends GElem

  def groupGraphPatternSub: Parser[GraphPattern] =
    rep(gElem <~ opt(".")) ^^ assembleGroup

  private def gElem: Parser[GElem] =
    kw("SERVICE") ~> opt(kw("SILENT")) ~ (variable ^^ (VarPat(_)) | iri ^^ (TermPat(_))) ~
      groupGraphPattern ^^ { case silent ~ ep ~ p => GSub(Service(ep, p, silent.isDefined)) } |
    kw("OPTIONAL") ~> groupGraphPattern ^^ (GOptional(_)) |
    kw("MINUS") ~> groupGraphPattern ^^ (GMinus(_)) |
    kw("LATERAL") ~> groupGraphPattern ^^ (GLateral(_)) |
    kw("GRAPH") ~> (variable ^^ (VarPat(_)) | iri ^^ (TermPat(_))) ~ groupGraphPattern ^^ {
      case n ~ p => GGraph(n, p) } |
    kw("FILTER") ~> constraint ^^ { e =>
      // Aggregates are only legal in SELECT expressions, HAVING and ORDER BY
      // (spec §18.2.4); the reference parser rejects them here too.
      if (Algebra.containsAggregate(e))
        throw new IllegalArgumentException("aggregates are not allowed in FILTER")
      GFilter(e)
    } |
    kw("BIND") ~> ("(" ~> expression ~ (kw("AS") ~> variable) <~ ")") ^^ {
      case e ~ v =>
        if (Algebra.containsAggregate(e))
          throw new IllegalArgumentException("aggregates are not allowed in BIND")
        GBind(v, e) } |
    kw("VALUES") ~> dataBlock ^^ (GValues(_)) |
    unionPattern ^^ (GSub(_)) |
    triplesBlockElem

  private def triplesBlockElem: Parser[GElem] = rep1(triplesSameSubject <~ opt(".")) ^^ { tss =>
    val all = tss.flatten
    GTriples(all.collect { case Left(t) => t }, all.collect { case Right(p) => p })
  }

  def unionPattern: Parser[GraphPattern] =
    groupGraphPattern ~ rep(kw("UNION") ~> groupGraphPattern) ^^ {
      case first ~ rest => rest.foldLeft(first)(Union(_, _))
    }

  private def assembleGroup(elems: Seq[GElem]): GraphPattern = {
    var cur: GraphPattern = Bgp(Nil)
    var filters = Vector.empty[Expr]
    // A maximal run of triples/paths split only by FILTERs is ONE basic graph
    // pattern (§19.6 / W3C syn-blabel-cross-filter: a FILTER does not end a
    // BGP) — buffer across GFilter elements and flush on any other element.
    var runTrips = Vector.empty[TriplePattern]
    var runPaths = Vector.empty[PathPattern]
    def joinWith(p: GraphPattern): Unit = cur match {
      case Bgp(Nil) => cur = p
      case _ => cur = Join(cur, p)
    }
    def flushRun(): Unit = if (runTrips.nonEmpty || runPaths.nonEmpty) {
      var run: GraphPattern =
        if (runTrips.nonEmpty) Bgp(runTrips)
        else runPaths.head
      (if (runTrips.nonEmpty) runPaths else runPaths.tail)
        .foreach(pp => run = Join(run, pp))
      // digit-leading labels are parser-generated ([] desugaring) and exempt
      // from scope checking — wrap only runs with user-written labels
      val hasUserLabel =
        (runTrips.flatMap(t => Seq(t.s, t.p, t.o)) ++ runPaths.flatMap(p => Seq(p.s, p.o)))
          .exists { case BNodePat(l) => !l.head.isDigit; case _ => false }
      joinWith(if (hasUserLabel) BnodeScope(run) else run)
      runTrips = Vector.empty; runPaths = Vector.empty
    }
    elems.foreach {
      case GTriples(trips, paths) =>
        runTrips ++= trips; runPaths ++= paths
      case GFilter(e) => filters :+= e
      case other =>
        flushRun()
        other match {
          case GOptional(p) => p match {
            case Filter(e, inner) => cur = LeftJoin(cur, inner, Some(e))
            case _ => cur = LeftJoin(cur, p, None)
          }
          case GMinus(p) => cur = Minus(cur, p)
          case GLateral(p) => cur = Lateral(cur, p)
          case GBind(v, e) => cur = Extend(cur, v, e)
          case GValues(v) => joinWith(v)
          case GGraph(n, p) => joinWith(GraphGraph(n, p))
          case GSub(p) => joinWith(p)
          case GTriples(_, _) | GFilter(_) => // unreachable
        }
    }
    flushRun()
    filters.foldLeft(cur)((acc, f) => Filter(f, acc))
  }

  def constraint: Parser[Expr] = brackettedExpr | builtInCall | iriFunctionCall

  // ------------------------------------------------------------ data blocks

  def dataBlock: Parser[ValuesPattern] =
    variable ~ ("{" ~> rep(dataBlockValue) <~ "}") ^^ {
      case v ~ vals => ValuesPattern(Seq(v), vals.map(x => Seq(x))) } |
    ("(" ~> rep(variable) <~ ")") ~ ("{" ~> rep("(" ~> rep(dataBlockValue) <~ ")") <~ "}") ^^ {
      case vs ~ rows =>
        // grammar rule [62]: every data row must match the variable arity
        rows.find(_.size != vs.size).foreach { r =>
          throw new IllegalArgumentException(
            s"SPARQL validation error: VALUES row has ${r.size} values for ${vs.size} variables")
        }
        ValuesPattern(vs, rows)
    }

  def dataBlockValue: Parser[Option[RdfTerm]] =
    kw("UNDEF") ^^ (_ => None) |
    iri ^^ (i => Some(i)) |
    "-" ~> numericLiteral ^^ (l => Some(l.copy(lexical = "-" + l.lexical))) |
    "+" ~> numericLiteral ^^ (l => Some(l)) |
    literal ^^ (l => Some(l))

  // ---------------------------------------------------- triples & properties

  /** One TriplesSameSubjectPath production; returns plain triples and/or
    * path patterns (Either[TriplePattern, PathPattern]). */
  def triplesSameSubject: Parser[Seq[Either[TriplePattern, PathPattern]]] =
    (termPatternNode ~ propertyListNotEmpty) ^^ { case (s, pre) ~ props =>
      pre ++ expandProps(s, props)
    } |
    (blankNodePropertyList ~ opt(propertyListNotEmpty)) ^^ { case (s, pre) ~ props =>
      pre ++ props.map(expandProps(s, _)).getOrElse(Nil)
    }

  private type Props = Seq[(Either[PropertyPath, TermPattern], Seq[(TermPattern, Seq[Either[TriplePattern, PathPattern]])])]

  private def expandProps(s: TermPattern, props: Props): Seq[Either[TriplePattern, PathPattern]] =
    props.flatMap { case (verb, objects) =>
      objects.flatMap { case (o, extra) =>
        val t: Either[TriplePattern, PathPattern] = verb match {
          case Right(p) => Left(TriplePattern(s, p, o))
          case Left(PathLink(i)) => Left(TriplePattern(s, TermPat(i), o))
          case Left(path) => Right(PathPattern(s, path, o))
        }
        t +: extra
      }
    }

  def propertyListNotEmpty: Parser[Props] =
    rep1sep(verb ~ objectList ^^ { case v ~ os => (v, os) }, rep1(";")) <~ opt(";")

  def verb: Parser[Either[PropertyPath, TermPattern]] =
    variable ^^ (v => Right(VarPat(v))) |
    kw("a") ^^ (_ => Left(PathLink(Iri(Rdf.type_)))) |
    path ^^ (Left(_))

  def objectList: Parser[Seq[(TermPattern, Seq[Either[TriplePattern, PathPattern]])]] =
    rep1sep(objectNode, ",")

  def objectNode: Parser[(TermPattern, Seq[Either[TriplePattern, PathPattern]])] =
    termPatternNode |
    blankNodePropertyList

  /** Simple graph node (var / iri / literal / bnode / collection / NIL). */
  def termPatternNode: Parser[(TermPattern, Seq[Either[TriplePattern, PathPattern]])] =
    variable ^^ (v => (VarPat(v): TermPattern, Nil)) |
    collection |
    "(" ~ ")" ^^ (_ => (TermPat(Iri(Rdf.nil)): TermPattern, Nil)) |
    literal ^^ (l => (TermPat(l): TermPattern, Nil)) |
    blankNode ^^ (b => (b: TermPattern, Nil)) |
    iri ^^ (i => (TermPat(i): TermPattern, Nil))

  def blankNodePropertyList: Parser[(TermPattern, Seq[Either[TriplePattern, PathPattern]])] =
    "[" ~> propertyListNotEmpty <~ "]" ^^ { props =>
      val b = freshBNode()
      (b, expandProps(b, props))
    }

  def collection: Parser[(TermPattern, Seq[Either[TriplePattern, PathPattern]])] =
    "(" ~> rep1(objectNode) <~ ")" ^^ { items =>
      val nodes = items.map(_ => freshBNode())
      val triples = nodes.zip(items).zipWithIndex.flatMap { case ((n, (o, extra)), idx) =>
        val restObj: TermPattern = if (idx == items.size - 1) TermPat(Iri(Rdf.nil)) else nodes(idx + 1)
        Seq(Left(TriplePattern(n, TermPat(Iri(Rdf.first)), o)),
          Left(TriplePattern(n, TermPat(Iri(Rdf.rest)), restObj))) ++ extra
      }
      (nodes.head, triples)
    }

  def triplesBlock: Parser[Seq[TriplePattern]] =
    rep(triplesSameSubject <~ opt(".")) ^^ { tss =>
      val all = tss.flatten
      // only used for CONSTRUCT templates, whose grammar (TriplesTemplate)
      // has no path production — silently dropping a path here would emit a
      // wrong (smaller) template
      if (all.exists(_.isRight))
        throw new IllegalArgumentException(
          "SPARQL validation error: property paths are not allowed in CONSTRUCT templates")
      all.collect { case Left(t) => t }
    }

  // -------------------------------------------------------------------- paths

  def path: Parser[PropertyPath] = pathAlternative

  def pathAlternative: Parser[PropertyPath] =
    rep1sep(pathSequence, "|") ^^ (_.reduce(PathAlternative))

  def pathSequence: Parser[PropertyPath] =
    rep1sep(pathEltOrInverse, "/") ^^ (_.reduce(PathSequence))

  def pathEltOrInverse: Parser[PropertyPath] =
    "^" ~> pathElt ^^ (PathReverse(_)) | pathElt

  // NB: the '?' modifier must not steal the '?' of a following variable
  // (`ex:p ?x`) — SPARQL tokenisation is greedy, so '?name' is a VAR token.
  def pathElt: Parser[PropertyPath] = pathPrimary ~ opt("""\?(?![A-Za-z_0-9])""".r | "*" | "+") ^^ {
    case p ~ Some("?") => PathZeroOrOne(p)
    case p ~ Some("*") => PathZeroOrMore(p)
    case p ~ Some("+") => PathOneOrMore(p)
    case p ~ _ => p
  }

  def pathPrimary: Parser[PropertyPath] =
    kw("a") ^^ (_ => PathLink(Iri(Rdf.type_))) |
    "!" ~> pathNegated |
    "(" ~> path <~ ")" |
    iri ^^ (PathLink(_))

  def pathNegated: Parser[PropertyPath] = {
    def one: Parser[Either[Iri, Iri]] =
      "^" ~> (kw("a") ^^ (_ => Iri(Rdf.type_)) | iri) ^^ (Right(_)) |
      (kw("a") ^^ (_ => Iri(Rdf.type_)) | iri) ^^ (Left(_))
    (one ^^ (Seq(_)) | "(" ~> repsep(one, "|") <~ ")") ^^ { items =>
      PathNegated(items.collect { case Left(i) => i }, items.collect { case Right(i) => i })
    }
  }

  // -------------------------------------------------------------- expressions

  def expression: Parser[Expr] = conditionalOr

  def brackettedExpr: Parser[Expr] = "(" ~> expression <~ ")"

  def conditionalOr: Parser[Expr] = rep1sep(conditionalAnd, "||") ^^ (_.reduce(EOr))

  def conditionalAnd: Parser[Expr] = rep1sep(relational, "&&") ^^ (_.reduce(EAnd))

  def relational: Parser[Expr] = additive ~ opt(relTail) ^^ {
    case e ~ None => e
    case e ~ Some(f) => f(e)
  }

  private def relTail: Parser[Expr => Expr] =
    ("=" | "!=" | "<=" | ">=" | "<" | ">") ~ additive ^^ {
      case op ~ r => (l: Expr) => ECmp(op, l, r) } |
    kw("NOT") ~> kw("IN") ~> exprList ^^ { list => (l: Expr) => EIn(l, list, negated = true) } |
    kw("IN") ~> exprList ^^ { list => (l: Expr) => EIn(l, list, negated = false) }

  def exprList: Parser[Seq[Expr]] = "(" ~> repsep(expression, ",") <~ ")"

  def additive: Parser[Expr] = multiplicative ~ rep(("+" | "-") ~ multiplicative) ^^ {
    case first ~ rest => rest.foldLeft(first) { case (l, op ~ r) => EArith(op, l, r) }
  }

  def multiplicative: Parser[Expr] = unary ~ rep(("*" | "/") ~ unary) ^^ {
    case first ~ rest => rest.foldLeft(first) { case (l, op ~ r) => EArith(op, l, r) }
  }

  def unary: Parser[Expr] =
    "!" ~> unary ^^ (ENot(_)) |
    "+" ~> unary |
    "-" ~> unary ^^ (ENeg(_)) |
    primary

  def primary: Parser[Expr] =
    brackettedExpr |
    builtInCall |
    literal ^^ (ETerm(_)) |
    variable ^^ (EVar(_)) |
    iriFunctionCall

  /** iri, or iri(args) = cast/extension function call. */
  def iriFunctionCall: Parser[Expr] = iri ~ opt(exprList) ^^ {
    case i ~ Some(args) => ECall(i.value, args)
    case i ~ None => ETerm(i)
  }

  private val zeroArg = Set("RAND", "NOW", "UUID", "STRUUID", "BNODE")

  def builtInCall: Parser[Expr] =
    aggregateCall |
    kw("NOT") ~> kw("EXISTS") ~> groupGraphPattern ^^ (p => EExists(p, negated = true)) |
    kw("EXISTS") ~> groupGraphPattern ^^ (p => EExists(p, negated = false)) |
    kw("BOUND") ~> "(" ~> variable <~ ")" ^^ (EBound(_)) |
    kw("IF") ~> "(" ~> (expression ~ ("," ~> expression) ~ ("," ~> expression)) <~ ")" ^^ {
      case c ~ t ~ f => EIf(c, t, f) } |
    kw("COALESCE") ~> exprList ^^ (ECoalesce(_)) |
    builtinName ~ opt(exprList) ^^ {
      case n ~ Some(args) =>
        // IRI(expr) resolves relative references against the query BASE
        // (SPARQL 17.4.2.8); attach it as an internal constant 2nd argument
        // so the expression compiler sees it without threading env state
        if ((n == "IRI" || n == "URI") && args.size == 1 && baseIri.isDefined)
          ECall(n, args :+ ETerm(graft.model.Lit(baseIri.get, graft.model.Xsd.string, None)))
        else ECall(n, args)
      case n ~ None if zeroArg(n) => ECall(n, Nil)
      case n ~ None => throw new IllegalArgumentException(s"builtin $n needs arguments")
    }

  private val builtinNames = Seq(
    "STRLEN", "SUBSTR", "UCASE", "LCASE", "STRSTARTS", "STRENDS", "CONTAINS",
    "STRBEFORE", "STRAFTER", "ENCODE_FOR_URI", "CONCAT", "LANGMATCHES", "REGEX",
    "REPLACE", "STRDT", "STRLANG", "STR", "LANG", "DATATYPE", "IRI", "URI",
    "BNODE", "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "YEAR", "MONTH", "DAY",
    "HOURS", "MINUTES", "SECONDS", "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512", "ISIRI", "ISURI", "ISBLANK",
    "ISLITERAL", "ISNUMERIC", "SAMETERM")

  def builtinName: Parser[String] =
    builtinNames.map(n => kw(n)).reduce(_ | _)

  def aggregateCall: Parser[Expr] =
    kw("COUNT") ~> "(" ~> opt(kw("DISTINCT")) ~ ("*" ^^ (_ => None) | expression ^^ (Some(_))) <~ ")" ^^ {
      case d ~ arg => EAgg(Aggregate("COUNT", d.isDefined, arg)) } |
    (kw("SUM") | kw("MIN") | kw("MAX") | kw("AVG") | kw("SAMPLE")) ~
      ("(" ~> opt(kw("DISTINCT")) ~ expression <~ ")") ^^ {
      case n ~ (d ~ e) => EAgg(Aggregate(n, d.isDefined, Some(e))) } |
    kw("GROUP_CONCAT") ~> "(" ~> opt(kw("DISTINCT")) ~ expression ~
      opt(";" ~> kw("SEPARATOR") ~> "=" ~> STRING_RE) <~ ")" ^^ {
      case d ~ e ~ sep =>
        EAgg(Aggregate("GROUP_CONCAT", d.isDefined, Some(e),
          sep.map(s => NtUnescape(stripQuotes(s)))))
    }

  // ----------------------------------------------------------------- updates

  /** Update ::= Prologue (Update1 (';' Update)?)? — a fresh Prologue may
    * follow every ';', accumulating into the same prefix/base state. */
  def updateRequest: Parser[UpdateRequest] =
    (prologue ~> opt(update1)) ~ rep(";" ~> prologue ~> opt(update1)) ^^ {
      case first ~ rest => UpdateRequest(first.toSeq ++ rest.flatten, baseIri, prefixes)
    }

  def update1: Parser[UpdateOp] =
    kw("INSERT") ~ kw("DATA") ~> quadData ^^ { qs =>
      // §19.8 grammar note 8: INSERT DATA is ground (no variables)
      if (quadVars(qs)) throw new IllegalArgumentException(
        "SPARQL update validation error: variables are not allowed in INSERT DATA")
      InsertData(qs)
    } |
    kw("DELETE") ~ kw("DATA") ~> quadData ^^ { qs =>
      // notes 8+9: DELETE DATA is ground and bnode-free
      if (quadVars(qs)) throw new IllegalArgumentException(
        "SPARQL update validation error: variables are not allowed in DELETE DATA")
      if (quadBnodes(qs)) throw new IllegalArgumentException(
        "SPARQL update validation error: blank nodes are not allowed in DELETE DATA")
      DeleteData(qs)
    } |
    kw("DELETE") ~ kw("WHERE") ~> quadData ^^ { qs =>
      if (quadBnodes(qs)) throw new IllegalArgumentException(
        "SPARQL update validation error: blank nodes are not allowed in DELETE WHERE")
      DeleteWhere(qs)
    } |
    modifyOp | loadOp | clearOp | dropOp | createOp | addOp | moveOp | copyOp

  private def modifyOp: Parser[Modify] =
    opt(kw("WITH") ~> iri) ~ (
      (kw("DELETE") ~> quadData) ~ opt(kw("INSERT") ~> quadData) ^^ {
        case d ~ i => (d, i.getOrElse(Nil)) } |
      (kw("INSERT") ~> quadData) ^^ (i => (Seq.empty[QuadPattern], i))
    ) ~ rep(usingClause) ~ (kw("WHERE") ~> groupGraphPattern) ^^ {
      case w ~ di ~ us ~ where =>
        // note 9: bnodes may not appear in a DELETE template
        if (quadBnodes(di._1)) throw new IllegalArgumentException(
          "SPARQL update validation error: blank nodes are not allowed in DELETE templates")
        Modify(w, di._1, di._2,
          us.collect { case (false, i) => i }, us.collect { case (true, i) => i }, where)
    }

  private def usingClause: Parser[(Boolean, Iri)] =
    kw("USING") ~> opt(kw("NAMED")) ~ iri ^^ { case n ~ i => (n.isDefined, i) }

  private def loadOp: Parser[LoadOp] =
    kw("LOAD") ~> opt(kw("SILENT")) ~ iri ~ opt(kw("INTO") ~> kw("GRAPH") ~> iri) ^^ {
      case s ~ src ~ into => LoadOp(src, into, s.isDefined)
    }

  private def graphRefAll: Parser[GraphTarget] =
    kw("GRAPH") ~> iri ^^ (GraphTarget.Named(_)) |
    kw("DEFAULT") ^^ (_ => GraphTarget.Default) |
    kw("NAMED") ^^ (_ => GraphTarget.AllNamed) |
    kw("ALL") ^^ (_ => GraphTarget.All)

  private def clearOp: Parser[ClearOp] =
    kw("CLEAR") ~> opt(kw("SILENT")) ~ graphRefAll ^^ { case s ~ t => ClearOp(t, s.isDefined) }

  private def dropOp: Parser[DropOp] =
    kw("DROP") ~> opt(kw("SILENT")) ~ graphRefAll ^^ { case s ~ t => DropOp(t, s.isDefined) }

  private def createOp: Parser[CreateOp] =
    kw("CREATE") ~> opt(kw("SILENT")) ~ (kw("GRAPH") ~> iri) ^^ {
      case s ~ g => CreateOp(g, s.isDefined) }

  /** GraphOrDefault: DEFAULT | GRAPH? iri — None = the default graph. */
  private def graphOrDefault: Parser[Option[Iri]] =
    kw("DEFAULT") ^^ (_ => None) | opt(kw("GRAPH")) ~> iri ^^ (Some(_))

  private def addOp: Parser[AddOp] =
    kw("ADD") ~> opt(kw("SILENT")) ~ graphOrDefault ~ (kw("TO") ~> graphOrDefault) ^^ {
      case s ~ f ~ t => AddOp(f, t, s.isDefined) }
  private def moveOp: Parser[MoveOp] =
    kw("MOVE") ~> opt(kw("SILENT")) ~ graphOrDefault ~ (kw("TO") ~> graphOrDefault) ^^ {
      case s ~ f ~ t => MoveOp(f, t, s.isDefined) }
  private def copyOp: Parser[CopyOp] =
    kw("COPY") ~> opt(kw("SILENT")) ~ graphOrDefault ~ (kw("TO") ~> graphOrDefault) ^^ {
      case s ~ f ~ t => CopyOp(f, t, s.isDefined) }

  /** QuadData / QuadPattern: '{' TriplesTemplate? (GRAPH VarOrIri '{..}' ..)* '}' */
  def quadData: Parser[Seq[QuadPattern]] = "{" ~> quadsProduction <~ "}"

  private def quadsProduction: Parser[Seq[QuadPattern]] =
    rep(quadsNotTriples <~ opt(".") | templateTriples ^^ (ts =>
      ts.map(t => QuadPattern(None, t.s, t.p, t.o)))) ^^ (_.flatten)

  private def quadsNotTriples: Parser[Seq[QuadPattern]] =
    kw("GRAPH") ~> varOrIriPat ~ ("{" ~> opt(templateTriples) <~ "}") ^^ {
      case g ~ ts => ts.getOrElse(Nil).map(t => QuadPattern(Some(g), t.s, t.p, t.o))
    }

  /** Non-empty TriplesTemplate (rep1: an empty match inside quads' rep would
    * loop forever); paths are rejected like CONSTRUCT templates. */
  private def templateTriples: Parser[Seq[TriplePattern]] =
    rep1(triplesSameSubject <~ opt(".")) ^^ { tss =>
      val all = tss.flatten
      if (all.exists(_.isRight))
        throw new IllegalArgumentException(
          "SPARQL validation error: property paths are not allowed in update templates")
      all.collect { case Left(t) => t }
    }

  private def quadVars(qs: Seq[QuadPattern]): Boolean =
    qs.exists(q => (q.graph.toSeq :+ q.s :+ q.p :+ q.o).exists(_.isInstanceOf[VarPat]))
  private def quadBnodes(qs: Seq[QuadPattern]): Boolean =
    qs.exists(q => (q.graph.toSeq :+ q.s :+ q.p :+ q.o).exists(_.isInstanceOf[BNodePat]))

  def parseUpdateRequest(text: String): UpdateRequest = {
    prefixes = SparqlParser.standardPrefixes
    baseIri = None
    parseAll(updateRequest, text) match {
      case Success(u, _) => u
      case NoSuccess(msg, rest) =>
        throw new IllegalArgumentException(
          s"SPARQL update parse error: $msg at line ${rest.pos.line}, col ${rest.pos.column}\n${rest.pos.longString}")
      case other => throw new IllegalArgumentException(s"SPARQL update parse error: $other")
    }
  }

  // -------------------------------------------------------------- public API

  def parseQuery(text: String): Query = {
    prefixes = SparqlParser.standardPrefixes
    baseIri = None
    parseAll(query, text) match {
      case Success(q, _) => Validate(q)
      case NoSuccess(msg, rest) =>
        throw new IllegalArgumentException(
          s"SPARQL parse error: $msg at line ${rest.pos.line}, col ${rest.pos.column}\n${rest.pos.longString}")
      case other => throw new IllegalArgumentException(s"SPARQL parse error: $other")
    }
  }

  private object NtUnescape {
    def apply(s: String): String = graft.sources.NTriples.unescape(s)
  }
}

object SparqlParser {
  val standardPrefixes: Map[String, String] = Map(
    "xsd" -> "http://www.w3.org/2001/XMLSchema#",
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#")

  def parse(text: String): Algebra.Query = new SparqlParser().parseQuery(text)

  def parseUpdate(text: String): Algebra.UpdateRequest =
    new SparqlParser().parseUpdateRequest(text)
}
