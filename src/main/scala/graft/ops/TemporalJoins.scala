package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/**
 * Temporal join operators Spark lacks natively: backward as-of join and
 * interval (range) join. Both are implemented shuffle-minimally — the naive
 * formulations (an inequality theta-join) plan as BroadcastNestedLoopJoin in
 * Spark, which is quadratic and unusable at scale.
 *
 * As-of join uses the tagged-union + running-window trick: one shuffle on
 * the key columns, a per-partition sort, and a `last(_, ignoreNulls)` carry —
 * O(n log n) per key group, no join amplification, arbitrary key skew bounded
 * by the sort. Interval join uses time bucketization: intervals explode to
 * the fixed-width bins they cover and events map to exactly one bin, turning
 * the range predicate into an equi-join on bin plus a residual filter — the
 * standard stream-processing formulation, AQE-skew-splittable.
 */
object TemporalJoins {

  /** Epoch millis/micros accepting both TIMESTAMP and TIMESTAMP_NTZ (parquet
    * event data is NTZ; sessions here pin the UTC zone, so the cast is the
    * identity interpretation). */
  private def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))
  private def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /**
   * Backward as-of join: for each left row, attach the payload of the most
   * recent right row with `right.ts <= left.ts` within the same key group
   * (inclusive at equal timestamps), or nulls when no such row exists.
   *
   * @param rightVals  right payload columns to carry; emitted under the same
   *                   names prefixed with `outPrefix` (the matched right
   *                   timestamp is emitted as `<outPrefix>matched_ts_ms`,
   *                   epoch millis)
   * @param toleranceMs if set, matches older than this many milliseconds
   *                    before the left timestamp are nulled out
   *
   * Right rows sharing an identical (key, ts) are tie-broken by the payload
   * struct's lexicographic order (largest wins) so the result is
   * deterministic regardless of partitioning.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightVals: Seq[String],
               outPrefix: String = "", toleranceMs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    val reserved = Seq("_t", "_tag", "_lrow", "_rpay", "_m")
    require(!left.columns.exists(reserved.contains) && !right.columns.exists(reserved.contains),
      s"asofJoin inputs must not use the reserved columns ${reserved.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)
    // Ordering compares at full microsecond precision — a right row even 1µs
    // after the left must not match (the ms-truncated form would admit it).
    val lTagged = left.select(
      keyCols :+ epochUs(col(leftTs)).as("_t") :+ lit(1).as("_tag") :+
        struct(leftCols.map(col): _*).as("_lrow"): _*)
    val rTagged = right.select(
      keyCols :+ epochUs(col(rightTs)).as("_t") :+ lit(0).as("_tag") :+
        struct(epochUs(col(rightTs)).as("_ts_us") +: rightVals.map(col): _*)
          .as("_rpay"): _*)
    // Right rows sort before left rows at equal ts (tag 0 < 1) so an exact-ts
    // right row is visible to its left row; _rpay breaks right-right ties.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_tag").asc, col("_rpay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("_m", last(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
    val inWindow = toleranceMs match {
      case Some(tol) => col("_m").isNotNull && col("_m._ts_us") >= col("_t") - lit(tol * 1000L)
      case None      => col("_m").isNotNull
    }
    val gated = carried.withColumn("_m", when(inWindow, col("_m")))
    gated.select(
      leftCols.map(c => col(s"_lrow.`$c`").as(c)) ++
        (floor(col("_m._ts_us") / 1000L).cast(LongType).as(s"${outPrefix}matched_ts_ms") +:
          rightVals.map(v => col(s"_m.`$v`").as(s"$outPrefix$v"))): _*)
  }

  /**
   * Interval (range) join: every (event, interval) pair with
   * `start <= eventTs < end`, via `binSeconds`-wide time bucketization.
   * Event and interval column names must be disjoint. Pick `binSeconds`
   * near the typical interval length: bins per interval is
   * `len/binSeconds + 1`, and each event lands in exactly one bin, so no
   * post-join dedup is needed.
   */
  def intervalJoin(events: DataFrame, eventTs: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(!events.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "intervalJoin inputs must not already have a _bin column")
    require(events.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "event and interval column names must be disjoint")
    val binUs = lit(binSeconds * 1000000L)
    val sUs = epochUs(col(startCol))
    val eUs = epochUs(col(endCol))
    // Half-open [start, end): the last covered bin holds end - 1µs. Empty or
    // inverted intervals get no bins (sequence() would descend, not stop).
    val iv = intervals.withColumn("_bin",
      explode(when(eUs > sUs,
        sequence(floor(sUs / binUs).cast(LongType), floor((eUs - 1) / binUs).cast(LongType))
      ).otherwise(array().cast("array<bigint>"))))
    val ev = events.withColumn("_bin",
      floor(epochUs(col(eventTs)) / binUs).cast(LongType))
    ev.join(iv, Seq("_bin"))
      .where(col(eventTs) >= col(startCol) && col(eventTs) < col(endCol))
      .drop("_bin")
  }
}
