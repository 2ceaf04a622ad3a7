package graft.engine

import org.apache.spark.sql.DataFrame

/**
 * A compiled solution-set relation: one column per in-scope SPARQL variable,
 * each a PlainTerm struct; NULL = unbound.
 *
 * `maybeUnbound` is the nullability bookkeeping the reference engine derives
 * from plan schemas in its join-lowering rule
 * (/root/reference/lib/logical/src/join/rewrite.rs:126-168): a variable in
 * the set may be NULL at runtime, so joins on it must use the compat path;
 * variables NOT in the set are definitely bound, so a plain equi-join (hash
 * join, broadcast-able, shuffle on key) is semantics-preserving — that is the
 * fast path we want Catalyst to see at 100 TB.
 */
final case class SPlan(df: DataFrame, vars: Seq[String], maybeUnbound: Set[String],
                       kinds: Map[String, Int] = Map.empty) {
  def isNullable(v: String): Boolean = maybeUnbound.contains(v)
}

/** Scope of the `graph` column for pattern scans — mirrors the reference's
  * ActiveGraph (/root/reference/lib/logical/src/active_graph.rs:4-18). */
sealed trait GraphScope
object GraphScope {
  /** Match only the default graph (graph IS NULL). */
  case object DefaultGraph extends GraphScope
  /** Match any named graph, binding the graph term to a variable. */
  final case class NamedVar(v: String) extends GraphScope
  /** Match one specific named graph. */
  final case class Named(iri: String) extends GraphScope
  /** FROM clause: default graph = merge of these named graphs. */
  final case class UnionOf(iris: Seq[String]) extends GraphScope
}
