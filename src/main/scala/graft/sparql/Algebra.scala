package graft.sparql

import graft.model.{Iri, RdfTerm}

/**
 * SPARQL algebra — mirrors the shape of spargebra's algebra tree, which the
 * reference parses into and rewrites from (/root/reference/lib/execution/src/
 * sparql/algebra.rs; rewriter graph_pattern_rewriter.rs:63-236). The parser
 * ([[SparqlParser]]) produces this; the engine rewriter
 * ([[graft.engine.Rewriter]]) turns it into a DataFrame plan.
 */
object Algebra {

  final case class Var(name: String) {
    override def toString: String = "?" + name
  }

  /** A term pattern slot: variable, ground term, or blank node label (which
    * behaves as a non-projectable variable in queries). */
  sealed trait TermPattern
  final case class VarPat(v: Var) extends TermPattern
  final case class TermPat(t: RdfTerm) extends TermPattern
  final case class BNodePat(label: String) extends TermPattern

  final case class TriplePattern(s: TermPattern, p: TermPattern, o: TermPattern)

  // ------------------------------------------------------------------ paths

  sealed trait PropertyPath
  final case class PathLink(iri: Iri) extends PropertyPath
  final case class PathReverse(p: PropertyPath) extends PropertyPath
  final case class PathSequence(a: PropertyPath, b: PropertyPath) extends PropertyPath
  final case class PathAlternative(a: PropertyPath, b: PropertyPath) extends PropertyPath
  final case class PathZeroOrMore(p: PropertyPath) extends PropertyPath
  final case class PathOneOrMore(p: PropertyPath) extends PropertyPath
  final case class PathZeroOrOne(p: PropertyPath) extends PropertyPath
  /** Negated property set: !(iri|...|^iri|...) */
  final case class PathNegated(forward: Seq[Iri], reverse: Seq[Iri]) extends PropertyPath

  // ------------------------------------------------------------- expressions

  sealed trait Expr
  final case class ETerm(t: RdfTerm) extends Expr
  final case class EVar(v: Var) extends Expr
  final case class EOr(l: Expr, r: Expr) extends Expr
  final case class EAnd(l: Expr, r: Expr) extends Expr
  final case class ENot(e: Expr) extends Expr
  /** op ∈ =, !=, <, <=, >, >= with SPARQL operator-mapping semantics. */
  final case class ECmp(op: String, l: Expr, r: Expr) extends Expr
  final case class EIn(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
  /** op ∈ +, -, *, / with the numeric promotion ladder. */
  final case class EArith(op: String, l: Expr, r: Expr) extends Expr
  final case class ENeg(e: Expr) extends Expr
  final case class EBound(v: Var) extends Expr
  final case class EIf(c: Expr, t: Expr, f: Expr) extends Expr
  final case class ECoalesce(args: Seq[Expr]) extends Expr
  final case class EExists(p: GraphPattern, negated: Boolean) extends Expr
  /** Builtin or custom (by IRI) function call. Name is upper-cased for
    * builtins (STR, LANG, …) or the full IRI for extension functions
    * (reference registry: lib/extensions/src/functions/name.rs:8-13). */
  final case class ECall(name: String, args: Seq[Expr]) extends Expr

  /** Aggregate expression inside GROUP BY queries. */
  final case class Aggregate(name: String, distinct: Boolean, arg: Option[Expr],
                             separator: Option[String] = None)

  /** An aggregate call site inside an expression tree; the query-level
    * translation hoists these into a [[Group]] node and substitutes the
    * generated aggregate variable (mirrors spargebra's translation,
    * reference graph_pattern_rewriter.rs:311-361). */
  final case class EAgg(agg: Aggregate) extends Expr

  // ---------------------------------------------------------------- patterns

  sealed trait GraphPattern
  final case class Bgp(patterns: Seq[TriplePattern]) extends GraphPattern
  final case class PathPattern(s: TermPattern, path: PropertyPath, o: TermPattern) extends GraphPattern
  /** Parser-emitted marker: `inner` is ONE basic graph pattern for §19.6
    * blank-node-label scoping (a maximal run of triples/paths split only by
    * FILTERs — a FILTER does not end a BGP, W3C syn-blabel-cross-filter).
    * Transparent to evaluation; only Validate reads it. Emitted only when the
    * run contains a user-written blank-node label. */
  final case class BnodeScope(inner: GraphPattern) extends GraphPattern
  final case class Join(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class LeftJoin(l: GraphPattern, r: GraphPattern, filter: Option[Expr]) extends GraphPattern
  final case class Filter(expr: Expr, inner: GraphPattern) extends GraphPattern
  final case class Union(l: GraphPattern, r: GraphPattern) extends GraphPattern
  /** GRAPH <iri> {p} or GRAPH ?g {p} */
  final case class GraphGraph(name: TermPattern, inner: GraphPattern) extends GraphPattern
  final case class Extend(inner: GraphPattern, v: Var, expr: Expr) extends GraphPattern
  final case class Minus(l: GraphPattern, r: GraphPattern) extends GraphPattern
  /** SPARQL 1.2 LATERAL: evaluate `r` once per solution of `l` with l's
    * bindings substituted (correlated join). */
  final case class Lateral(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class ValuesPattern(vars: Seq[Var], rows: Seq[Seq[Option[RdfTerm]]]) extends GraphPattern
  final case class Group(inner: GraphPattern, keys: Seq[(Var, Option[Expr])],
                         aggregates: Seq[(Var, Aggregate)]) extends GraphPattern
  /** Sub-SELECT — full nested query as a pattern. */
  final case class SubSelect(query: SelectQuery) extends GraphPattern
  /** SERVICE (federation). Unsupported at execution: evaluates as the empty
    * relation, matching the reference's lazy-error observable behaviour in
    * ASK/UNION/JOIN tests (SERVICE itself is unimplemented there too —
    * testsuite/tests/sparql.rs ignore list). */
  final case class Service(endpoint: TermPattern, inner: GraphPattern, silent: Boolean) extends GraphPattern

  final case class OrderCond(expr: Expr, ascending: Boolean)

  // ----------------------------------------------------------------- queries

  sealed trait Query {
    def base: Option[String]
    def prefixes: Map[String, String]
  }

  /** Projection item: plain var or (expr AS ?var). */
  final case class ProjItem(v: Var, expr: Option[Expr])

  final case class SelectQuery(
      projection: Seq[ProjItem],          // empty = SELECT *
      distinct: Boolean,
      reduced: Boolean,
      where: GraphPattern,
      groupBy: Seq[(Var, Option[Expr])],  // explicit GROUP BY keys
      having: Option[Expr],
      orderBy: Seq[OrderCond],
      offset: Option[Long],
      limit: Option[Long],
      fromDefault: Seq[Iri] = Nil,
      fromNamed: Seq[Iri] = Nil,
      base: Option[String] = None,
      prefixes: Map[String, String] = Map.empty) extends Query

  final case class ConstructQuery(template: Seq[TriplePattern], where: GraphPattern,
      orderBy: Seq[OrderCond], offset: Option[Long], limit: Option[Long],
      fromDefault: Seq[Iri] = Nil, fromNamed: Seq[Iri] = Nil,
      base: Option[String] = None, prefixes: Map[String, String] = Map.empty) extends Query

  final case class AskQuery(where: GraphPattern,
      fromDefault: Seq[Iri] = Nil, fromNamed: Seq[Iri] = Nil,
      base: Option[String] = None, prefixes: Map[String, String] = Map.empty) extends Query

  final case class DescribeQuery(targets: Seq[TermPattern], where: Option[GraphPattern],
      fromDefault: Seq[Iri] = Nil, fromNamed: Seq[Iri] = Nil,
      base: Option[String] = None, prefixes: Map[String, String] = Map.empty) extends Query

  // ------------------------------------------------------------------ updates

  /** A template/data quad: triple + optional graph context (None = the
    * operation's default graph). SPARQL 1.1 Update `Quads` production. */
  final case class QuadPattern(graph: Option[TermPattern], s: TermPattern,
                               p: TermPattern, o: TermPattern)

  /** CLEAR/DROP target (GraphRefAll production). */
  sealed trait GraphTarget
  object GraphTarget {
    final case class Named(iri: Iri) extends GraphTarget
    case object Default extends GraphTarget
    case object AllNamed extends GraphTarget
    case object All extends GraphTarget
  }

  /** One operation of an update request (SPARQL 1.1 Update §3).
    * The reference stubs the whole surface (`Store::update`,
    * /root/reference/lib/rdf-fusion/src/store.rs:409-414: unimplemented
    * "TODO #7") — this engine executes it. */
  sealed trait UpdateOp
  final case class InsertData(quads: Seq[QuadPattern]) extends UpdateOp
  final case class DeleteData(quads: Seq[QuadPattern]) extends UpdateOp
  /** DELETE WHERE { quads }: the quad patterns are both pattern and template. */
  final case class DeleteWhere(quads: Seq[QuadPattern]) extends UpdateOp
  /** (WITH g)? DELETE {..} INSERT {..} (USING ..)* WHERE pattern. */
  final case class Modify(withGraph: Option[Iri], delete: Seq[QuadPattern],
                          insert: Seq[QuadPattern], usingDefault: Seq[Iri],
                          usingNamed: Seq[Iri], where: GraphPattern) extends UpdateOp
  final case class LoadOp(source: Iri, into: Option[Iri], silent: Boolean) extends UpdateOp
  final case class ClearOp(target: GraphTarget, silent: Boolean) extends UpdateOp
  final case class DropOp(target: GraphTarget, silent: Boolean) extends UpdateOp
  final case class CreateOp(graph: Iri, silent: Boolean) extends UpdateOp
  /** from/to: None = the default graph (GraphOrDefault production). */
  final case class AddOp(from: Option[Iri], to: Option[Iri], silent: Boolean) extends UpdateOp
  final case class MoveOp(from: Option[Iri], to: Option[Iri], silent: Boolean) extends UpdateOp
  final case class CopyOp(from: Option[Iri], to: Option[Iri], silent: Boolean) extends UpdateOp

  /** A full update request: ';'-separated operations applied in order, each
    * against the store state the previous one produced. */
  final case class UpdateRequest(ops: Seq[UpdateOp], base: Option[String],
                                 prefixes: Map[String, String])

  // ------------------------------------------------------------------ helpers

  /** Variables referenced inside a pattern's expressions (FILTER/BIND/
    * HAVING/sub-select modifiers) — used to decide whether an EXISTS needs
    * the correlated (substitution) evaluation or a plain semi-join. */
  def exprRefVars(p: GraphPattern): Set[Var] = {
    val buf = scala.collection.mutable.Set[Var]()
    def expr(e: Expr): Unit = e match {
      case EVar(v) => buf += v
      case EBound(v) => buf += v
      case EOr(l, r) => expr(l); expr(r)
      case EAnd(l, r) => expr(l); expr(r)
      case ENot(x) => expr(x)
      case ECmp(_, l, r) => expr(l); expr(r)
      case EIn(x, list, _) => expr(x); list.foreach(expr)
      case EArith(_, l, r) => expr(l); expr(r)
      case ENeg(x) => expr(x)
      case EIf(c, t, f) => expr(c); expr(t); expr(f)
      case ECoalesce(args) => args.foreach(expr)
      case ECall(_, args) => args.foreach(expr)
      case EExists(i, _) => buf ++= exprRefVars(i) ++ inScopeVars(i)
      case EAgg(a) => a.arg.foreach(expr)
      case ETerm(_) =>
    }
    def walk(g: GraphPattern): Unit = g match {
      case Filter(e, i) => expr(e); walk(i)
      case Extend(i, _, e) => expr(e); walk(i)
      case Join(l, r) => walk(l); walk(r)
      case LeftJoin(l, r, f) => walk(l); walk(r); f.foreach(expr)
      case Union(l, r) => walk(l); walk(r)
      case Minus(l, r) => walk(l); walk(r)
      case Lateral(l, r) => walk(l); walk(r)
      case GraphGraph(_, i) => walk(i)
      case Group(i, keys, aggs) =>
        walk(i); keys.foreach(_._2.foreach(expr)); aggs.foreach(_._2.arg.foreach(expr))
      case SubSelect(q) =>
        walk(q.where); q.projection.foreach(_.expr.foreach(expr))
        q.orderBy.foreach(o => expr(o.expr)); q.having.foreach(expr)
      case Service(_, i, _) => walk(i)
      case BnodeScope(i) => walk(i)
      case Bgp(_) | PathPattern(_, _, _) | ValuesPattern(_, _) =>
    }
    walk(p)
    buf.toSet
  }

  /** In-scope variables of a pattern (used for nullability bookkeeping and
    * SELECT * expansion — reference computes the same per-node schema,
    * lib/logical/src/patterns/mod.rs). */
  def inScopeVars(p: GraphPattern): Seq[Var] = {
    val buf = scala.collection.mutable.LinkedHashSet[Var]()
    def tp(t: TermPattern): Unit = t match {
      case VarPat(v) => buf += v
      case BNodePat(l) => buf += Var("__bnode_" + l)
      case _ =>
    }
    def walk(g: GraphPattern): Unit = g match {
      case Bgp(ps) => ps.foreach { t => tp(t.s); tp(t.p); tp(t.o) }
      case PathPattern(s, _, o) => tp(s); tp(o)
      case Join(l, r) => walk(l); walk(r)
      case LeftJoin(l, r, _) => walk(l); walk(r)
      case Filter(_, i) => walk(i)
      case Union(l, r) => walk(l); walk(r)
      case GraphGraph(n, i) => tp(n); walk(i)
      case Extend(i, v, _) => walk(i); buf += v
      case Minus(l, _) => walk(l)
      case Lateral(l, r) => walk(l); walk(r)
      case ValuesPattern(vs, _) => buf ++= vs
      case Group(i, keys, aggs) =>
        keys.foreach { case (v, _) => buf += v }; aggs.foreach { case (v, _) => buf += v }
        if (keys.isEmpty && aggs.isEmpty) walk(i)
      case SubSelect(q) =>
        if (q.projection.isEmpty) walk(q.where) else buf ++= q.projection.map(_.v)
      case Service(_, i, _) => walk(i)
      case BnodeScope(i) => walk(i)
    }
    walk(p)
    buf.toSeq
  }

  /** Direct subexpressions of an expression node (EXISTS bodies excluded —
    * they are patterns, not expressions). */
  def exprChildren(e: Expr): Seq[Expr] = e match {
    case EOr(l, r) => Seq(l, r)
    case EAnd(l, r) => Seq(l, r)
    case ENot(x) => Seq(x)
    case ECmp(_, l, r) => Seq(l, r)
    case EIn(x, list, _) => x +: list
    case EArith(_, l, r) => Seq(l, r)
    case ENeg(x) => Seq(x)
    case EIf(c, t, f) => Seq(c, t, f)
    case ECoalesce(as) => as
    case ECall(_, as) => as
    case EAgg(a) => a.arg.toSeq
    case _ => Seq.empty
  }

  /** Does `pred` hold anywhere in the expression tree? */
  def exprContains(e: Expr)(pred: Expr => Boolean): Boolean =
    pred(e) || exprChildren(e).exists(exprContains(_)(pred))

  /** Aggregate call anywhere in the tree (illegal outside SELECT
    * expressions, HAVING and ORDER BY — spec §18.2.4). */
  def containsAggregate(e: Expr): Boolean =
    exprContains(e) { case EAgg(_) => true; case _ => false }
}
