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
 *
 * `tiny` marks plans whose cardinality is STRUCTURALLY bounded regardless of
 * data scale — bound-subject pattern scans (one subject's out-degree), inline
 * VALUES, LIMIT-k sub-selects, and compositions of those. Joins broadcast a
 * tiny side: disconnected BGP components (constant-subject stars) become
 * BroadcastNestedLoopJoins that keep the streamed side's partitioning,
 * instead of chained CartesianProducts whose partition counts MULTIPLY
 * (32-way sides stack to millions of tasks after a few crosses — the DAG
 * scheduler, not the data, becomes the bottleneck). Catalyst cannot infer
 * this itself: post-filter cardinality estimates over a self-unioned quad
 * relation are unreliable, while the structural bound holds at any scale.
 */
final case class SPlan(df: DataFrame, vars: Seq[String], maybeUnbound: Set[String],
                       kinds: Map[String, Int] = Map.empty, tiny: Boolean = false) {
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
