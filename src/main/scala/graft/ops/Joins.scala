package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Join-side strategy nudge shared by the pipeline operators (guide §3.1:
 * pick the join strategy deliberately).
 *
 * With `spark.sql.join.preferSortMergeJoin` at its default, any equi-join
 * side Catalyst won't broadcast gets SortMergeJoin — the same shuffle plus
 * a sort of BOTH sides. The operators' derived relations (aggregates,
 * windows, checkpoints) carry estimates that only ever over-state, so:
 * a side estimated under the session broadcast threshold is left alone
 * (the broadcast still happens — killing it would hurt exactly the hosts
 * where it matters); anything else is hinted shuffle_hash. A side already
 * carrying a hint is never re-hinted (stacking silently overrides the
 * inner hint).
 */
object Joins {
  def shuffleHashUnlessSmall(df: DataFrame): DataFrame = {
    @annotation.tailrec
    def hintedAtRoot(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => true
        case prj: org.apache.spark.sql.catalyst.plans.logical.Project => hintedAtRoot(prj.child)
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => hintedAtRoot(f.child)
        case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => hintedAtRoot(a.child)
        case _ => false
      }
    val hinted = hintedAtRoot(df.queryExecution.analyzed)
    val conf = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf)
      catch { case _: Throwable => 10485760L }
    if (hinted || (threshold > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold)) df
    else df.hint("shuffle_hash")
  }
}
