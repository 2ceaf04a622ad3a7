package graft.sparql

import Algebra._

/**
 * Post-parse validation: rejects queries the SPARQL 1.1 spec makes
 * ungrammatical even though they parse structurally — mirroring the errors
 * spargebra raises for the reference engine (the reference parses with
 * spargebra, `/root/reference/lib/execution/src/sparql/mod.rs`):
 *
 *  - §19.6: a blank-node label cannot be used in two different basic graph
 *    patterns (UNION branches, sibling groups, OPTIONAL vs outer, …);
 *  - §18.2.4.1: in a grouped query only group keys and aggregates may be
 *    projected (and `SELECT *` is not available), HAVING included;
 *  - aggregates cannot nest (`SUM(COUNT(?x))`);
 *  - BIND: the target variable must not already be in scope in the group
 *    up to the BIND site.
 */
object Validate {

  def apply(q: Query): Query = {
    q match {
      case s: SelectQuery => validateSelect(s)
      case c: ConstructQuery => validatePattern(c.where)
      case a: AskQuery => validatePattern(a.where)
      case d: DescribeQuery => d.where.foreach(validatePattern)
    }
    // blank-node scoping is global to the whole query (incl. sub-selects)
    val scopes = collection.mutable.Buffer[Set[String]]()
    collectBnodeScopes(q match {
      case s: SelectQuery => s.where
      case c: ConstructQuery => c.where
      case a: AskQuery => a.where
      case d: DescribeQuery => d.where.getOrElse(Bgp(Nil))
    }, scopes)
    val seen = collection.mutable.Map[String, Int]()
    scopes.zipWithIndex.foreach { case (labels, i) =>
      labels.foreach { l =>
        seen.get(l) match {
          case Some(j) if j != i =>
            err(s"blank node label _:$l used in two different basic graph patterns")
          case None => seen(l) = i
          case _ =>
        }
      }
    }
    q
  }

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException("SPARQL validation error: " + msg)

  // ---------------------------------------------------------------- grouping

  private def validateSelect(s: SelectQuery): Unit = {
    // buildSelect hoists aggregates into a Group node (optionally wrapped in
    // the HAVING Filter) at the top of `where`
    // a trailing VALUES clause joins after grouping/HAVING, so the Group may
    // sit one Join(_, ValuesPattern) below the top — look through it
    val (havingOpt, groupOpt) = s.where match {
      case Filter(h, g: Group) => (Some(h), Some(g))
      case g: Group => (None, Some(g))
      case Join(Filter(h, g: Group), _: ValuesPattern) => (Some(h), Some(g))
      case Join(g: Group, _: ValuesPattern) => (None, Some(g))
      case _ => (None, None)
    }
    groupOpt.foreach { g =>
      val keys = g.keys.map(_._1).toSet
      val aggVars = g.aggregates.map(_._1).toSet
      if (s.projection.isEmpty)
        err("SELECT * is not allowed in a query with GROUP BY or aggregates")
      s.projection.foreach {
        case ProjItem(v, None) =>
          if (!keys.contains(v) && !aggVars.contains(v))
            err(s"variable $v is projected but is neither a GROUP BY key nor an aggregate")
        case ProjItem(_, Some(e)) =>
          exprVarsOutsideAggs(e).foreach { v =>
            if (!keys.contains(v) && !aggVars.contains(v))
              err(s"variable $v appears in a projection expression but is neither " +
                "a GROUP BY key nor an aggregate")
          }
      }
      havingOpt.foreach { h =>
        exprVarsOutsideAggs(h).foreach { v =>
          if (!keys.contains(v) && !aggVars.contains(v))
            err(s"variable $v appears in HAVING but is neither a GROUP BY key nor an aggregate")
        }
      }
      g.aggregates.foreach { case (_, a) =>
        a.arg.foreach { arg =>
          if (containsAgg(arg)) err("aggregate calls cannot be nested")
        }
      }
    }
    validatePattern(s.where)
  }

  /** Variables referenced in an expression OUTSIDE any aggregate argument. */
  private def exprVarsOutsideAggs(e: Expr): Set[Var] = e match {
    case EVar(v) => Set(v)
    case EBound(v) => Set(v)
    case EOr(l, r) => exprVarsOutsideAggs(l) ++ exprVarsOutsideAggs(r)
    case EAnd(l, r) => exprVarsOutsideAggs(l) ++ exprVarsOutsideAggs(r)
    case ENot(x) => exprVarsOutsideAggs(x)
    case ECmp(_, l, r) => exprVarsOutsideAggs(l) ++ exprVarsOutsideAggs(r)
    case EIn(x, list, _) => exprVarsOutsideAggs(x) ++ list.flatMap(exprVarsOutsideAggs)
    case EArith(_, l, r) => exprVarsOutsideAggs(l) ++ exprVarsOutsideAggs(r)
    case ENeg(x) => exprVarsOutsideAggs(x)
    case EIf(c, t, f) =>
      exprVarsOutsideAggs(c) ++ exprVarsOutsideAggs(t) ++ exprVarsOutsideAggs(f)
    case ECoalesce(args) => args.flatMap(exprVarsOutsideAggs).toSet
    case ECall(_, args) => args.flatMap(exprVarsOutsideAggs).toSet
    case EAgg(_) => Set.empty // inside an aggregate: any in-scope var is fine
    case EExists(_, _) => Set.empty // pattern scoping handled separately
    case ETerm(_) => Set.empty
  }

  private def containsAgg(e: Expr): Boolean = e match {
    case EAgg(_) => true
    case EOr(l, r) => containsAgg(l) || containsAgg(r)
    case EAnd(l, r) => containsAgg(l) || containsAgg(r)
    case ENot(x) => containsAgg(x)
    case ECmp(_, l, r) => containsAgg(l) || containsAgg(r)
    case EIn(x, list, _) => containsAgg(x) || list.exists(containsAgg)
    case EArith(_, l, r) => containsAgg(l) || containsAgg(r)
    case ENeg(x) => containsAgg(x)
    case EIf(c, t, f) => containsAgg(c) || containsAgg(t) || containsAgg(f)
    case ECoalesce(args) => args.exists(containsAgg)
    case ECall(_, args) => args.exists(containsAgg)
    case _ => false
  }

  // ---------------------------------------------------- pattern-level checks

  /** BIND in-scope rule + recursion into sub-selects and EXISTS patterns. */
  private def validatePattern(p: GraphPattern): Unit = {
    def exprPatterns(e: Expr): Seq[GraphPattern] = e match {
      case EExists(i, _) => Seq(i)
      case EOr(l, r) => exprPatterns(l) ++ exprPatterns(r)
      case EAnd(l, r) => exprPatterns(l) ++ exprPatterns(r)
      case ENot(x) => exprPatterns(x)
      case ECmp(_, l, r) => exprPatterns(l) ++ exprPatterns(r)
      case EIn(x, list, _) => exprPatterns(x) ++ list.flatMap(exprPatterns)
      case EArith(_, l, r) => exprPatterns(l) ++ exprPatterns(r)
      case ENeg(x) => exprPatterns(x)
      case EIf(c, t, f) => exprPatterns(c) ++ exprPatterns(t) ++ exprPatterns(f)
      case ECoalesce(args) => args.flatMap(exprPatterns)
      case ECall(_, args) => args.flatMap(exprPatterns)
      case _ => Nil
    }
    p match {
      case Extend(inner, v, e) =>
        // internal aggregate-hoist variables (agg#N) are generated, not user BINDs
        if (inScopeVars(inner).contains(v))
          err(s"BIND would assign variable $v which is already in scope")
        validatePattern(inner); exprPatterns(e).foreach(validatePattern)
      case Join(l, r) => validatePattern(l); validatePattern(r)
      case LeftJoin(l, r, f) =>
        validatePattern(l); validatePattern(r)
        f.toSeq.flatMap(exprPatterns).foreach(validatePattern)
      case Filter(e, i) => exprPatterns(e).foreach(validatePattern); validatePattern(i)
      case Union(l, r) => validatePattern(l); validatePattern(r)
      case Minus(l, r) => validatePattern(l); validatePattern(r)
      case Lateral(l, r) => validatePattern(l); validatePattern(r)
      case GraphGraph(_, i) => validatePattern(i)
      case Group(i, keys, aggs) =>
        validatePattern(i)
        keys.foreach(_._2.foreach(e => exprPatterns(e).foreach(validatePattern)))
        aggs.foreach(_._2.arg.foreach(e => exprPatterns(e).foreach(validatePattern)))
      case SubSelect(q) => validateSelect(q)
      case Service(_, i, _) => validatePattern(i)
      case BnodeScope(i) => validatePattern(i)
      case Bgp(_) | PathPattern(_, _, _) | ValuesPattern(_, _) =>
    }
  }

  /** Collect the blank-node labels of each Bgp occurrence (one scope per
    * basic graph pattern, per §19.6 — UNION branches, sibling groups and
    * OPTIONAL bodies are distinct BGPs). */
  private def collectBnodeScopes(p: GraphPattern,
                                 out: collection.mutable.Buffer[Set[String]]): Unit = {
    def exprPatterns(e: Expr): Seq[GraphPattern] = e match {
      case EExists(i, _) => Seq(i)
      case EOr(l, r) => exprPatterns(l) ++ exprPatterns(r)
      case EAnd(l, r) => exprPatterns(l) ++ exprPatterns(r)
      case ENot(x) => exprPatterns(x)
      case ECmp(_, l, r) => exprPatterns(l) ++ exprPatterns(r)
      case EIn(x, list, _) => exprPatterns(x) ++ list.flatMap(exprPatterns)
      case EArith(_, l, r) => exprPatterns(l) ++ exprPatterns(r)
      case ENeg(x) => exprPatterns(x)
      case EIf(c, t, f) => exprPatterns(c) ++ exprPatterns(t) ++ exprPatterns(f)
      case ECoalesce(args) => args.flatMap(exprPatterns)
      case ECall(_, args) => args.flatMap(exprPatterns)
      case _ => Nil
    }
    p match {
      // the parser wraps each maximal triples/path run (split only by
      // FILTERs) in BnodeScope — that whole run is ONE basic graph pattern
      // for §19.6, so its labels land in a single scope set
      case BnodeScope(inner) =>
        val labels = collection.mutable.Set[String]()
        def leaves(g: GraphPattern): Unit = g match {
          case Bgp(ps) => labels ++= ps.flatMap(t => Seq(t.s, t.p, t.o))
            .collect { case BNodePat(l) if !l.head.isDigit => l }
          case PathPattern(s, _, o) =>
            labels ++= Seq(s, o).collect { case BNodePat(l) if !l.head.isDigit => l }
          case Join(l, r) => leaves(l); leaves(r)
          case other => collectBnodeScopes(other, out) // defensive: not parser-emitted
        }
        leaves(inner)
        if (labels.nonEmpty) out += labels.toSet
      // digit-leading labels are parser-generated (anonymous [] desugaring,
      // fresh per occurrence — may legally span the PathPattern and the Bgp
      // its property list lowers into); only user-written labels are scoped
      case Bgp(ps) =>
        val labels = ps.flatMap(t => Seq(t.s, t.p, t.o))
          .collect { case BNodePat(l) if !l.head.isDigit => l }
        if (labels.nonEmpty) out += labels.toSet
      case PathPattern(s, _, o) =>
        val labels = Seq(s, o).collect { case BNodePat(l) if !l.head.isDigit => l }
        if (labels.nonEmpty) out += labels.toSet
      case Join(l, r) => collectBnodeScopes(l, out); collectBnodeScopes(r, out)
      case LeftJoin(l, r, f) =>
        collectBnodeScopes(l, out); collectBnodeScopes(r, out)
        f.toSeq.flatMap(exprPatterns).foreach(collectBnodeScopes(_, out))
      case Filter(e, i) =>
        exprPatterns(e).foreach(collectBnodeScopes(_, out)); collectBnodeScopes(i, out)
      case Union(l, r) => collectBnodeScopes(l, out); collectBnodeScopes(r, out)
      case Minus(l, r) => collectBnodeScopes(l, out); collectBnodeScopes(r, out)
      case Lateral(l, r) => collectBnodeScopes(l, out); collectBnodeScopes(r, out)
      case GraphGraph(_, i) => collectBnodeScopes(i, out)
      case Extend(i, _, e) =>
        collectBnodeScopes(i, out); exprPatterns(e).foreach(collectBnodeScopes(_, out))
      case Group(i, _, _) => collectBnodeScopes(i, out)
      case SubSelect(q) => collectBnodeScopes(q.where, out)
      case Service(_, i, _) => collectBnodeScopes(i, out)
      case ValuesPattern(_, _) =>
    }
  }
}
