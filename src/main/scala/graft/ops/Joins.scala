package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/**
 * Join-side strategy nudge shared by the engine and the pipeline operators
 * (guide §3.1: pick the join strategy deliberately).
 *
 * With `spark.sql.join.preferSortMergeJoin` at its default, any equi-join
 * side Catalyst won't broadcast gets SortMergeJoin — the same shuffle plus
 * a sort of BOTH sides. The call sites join checkpointed/derived relations
 * (aggregates, windows, checkpoints, pattern scans) whose size estimates
 * only ever OVER-state, so:
 *
 *  - a side whose ANALYZED-plan estimate is already under the session
 *    broadcast threshold is left alone — the broadcast happens, and the
 *    check costs no optimizer pass (the simple size visitor runs on any
 *    plan);
 *  - a side whose analyzed estimate is big but whose plan is "leaf-ish"
 *    (a Project/Filter chain over relations/unions — e.g. a pattern scan
 *    over the relational mapping's union, where branch pruning shrinks the
 *    estimate by orders of magnitude) consults the OPTIMIZED estimate
 *    before deciding: optimizing a leaf-sized plan is cheap, and this is
 *    exactly the shape where the analyzed figure is wildly pessimistic;
 *  - anything else (join/aggregate-rooted subtrees, where an optimizer
 *    pass per call site would be superlinear in plan depth) trusts the
 *    analyzed figure and takes the shuffle_hash hint;
 *  - a side already carrying a hint is never re-hinted (stacking silently
 *    overrides the inner hint — a deliberate broadcast would die).
 */
object Joins {
  def shuffleHashUnlessSmall(df: DataFrame): DataFrame = {
    @annotation.tailrec
    def hintedAtRoot(p: LogicalPlan): Boolean = p match {
      case _: ResolvedHint => true
      case prj: Project => hintedAtRoot(prj.child)
      case f: Filter => hintedAtRoot(f.child)
      case a: SubqueryAlias => hintedAtRoot(a.child)
      case _ => false
    }
    def leafish(p: LogicalPlan): Boolean = p match {
      case prj: Project => leafish(prj.child)
      case f: Filter => leafish(f.child)
      case a: SubqueryAlias => leafish(a.child)
      case u: Union => u.children.forall(leafish)
      case _: LeafNode => true
      case _ => false
    }
    val analyzed = df.queryExecution.analyzed
    val hinted = hintedAtRoot(analyzed)
    val conf = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf)
      catch { case scala.util.control.NonFatal(_) => 10485760L }
    // threshold <= 0 means broadcasts are DISABLED for the session: no side
    // can be "small enough to broadcast", so every unhinted side takes the
    // shuffle_hash hint (the deliberate choice: with broadcasts off the
    // planner's only alternatives are SMJ's extra sorts or a hint).
    def small = threshold > 0 &&
      (analyzed.stats.sizeInBytes <= threshold ||
        (leafish(analyzed) &&
          df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold))
    if (hinted || small) df
    else df.hint("shuffle_hash")
  }
}
