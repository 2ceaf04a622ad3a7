package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators for the event-stream shape
 * (event_id, ts, user_id, event_type, value).
 *
 * The reference engine is batch-only (SURVEY §2.9), so these go beyond
 * parity: a training-data/analytics pipeline at 100 TB ingests continuously.
 * All operators are incremental: watermarked windowed aggregation state is
 * bounded, sessionization state is per-key and timeout-expired.
 */
object EventStreams {

  /**
   * Tumbling-window counts/sums per event type with a watermark bounding
   * state (late rows beyond the watermark are dropped — state size is
   * O(active windows × types), independent of stream length).
   */
  def windowedTypeStats(events: DataFrame, windowLen: String = "10 minutes",
                        watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("events"), sum("value").as("total_value"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("events"), col("total_value"), col("approx_users"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, lastMs: Long, events: Int, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                           events: Int, total_value: Double)

  /**
   * Gap-based sessionization with explicit state: a session closes when a
   * later event for the same user arrives more than `gapMs` after the last
   * one. Emits one row per closed session — the streaming counterpart of the
   * batch [[graft.SparkEntry]] events_sessionize operator. (Idle sessions
   * stay open in state until the user's next event; add an event-time
   * timeout + watermark to force-close them in production.)
   */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(s.copy(lastMs = t, events = s.events + 1, total = s.total + e.value))
              case Some(s) =>
                closed += close(userId, s)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  private def close(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.lastMs), s.events, s.total)

  /**
   * Streaming exact-dedup by content key within the watermark horizon —
   * the streaming face of [[graft.ops.Dedup.exact]].
   *
   * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: plain
   * dropDuplicates only evicts state when the event-time column is part of
   * the dedup key, so keying on the content hash alone would grow state
   * without bound; the WithinWatermark variant dedups on the hash and still
   * expires state at the watermark.
   */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  final case class Enriched(event_id: Long, user_id: Long, ts: Timestamp, value: Double,
                            matched_ts: Option[Timestamp], matched_value: Option[Double])
  final case class AsofState(rights: List[(Long, Double)])

  /**
   * Streaming backward as-of enrichment — the streaming face of
   * [[graft.ops.TemporalJoins.asofJoin]]: each `leftType` event is enriched
   * with the most recent `rightType` event (by event time, inclusive) for
   * the same user.
   *
   * State per key is a buffer of right events within `bufferMs` of the
   * newest right seen (the Flink-style interval-join state shape): a left
   * event that arrives out of order still binds to the right row that
   * preceded IT, not merely the newest. Rows within one micro-batch are
   * processed in event-time order; a right arriving in a later batch than a
   * left it should have matched cannot retract the emission (append mode) —
   * the batch operator is the backfill-exact counterpart. State stays
   * O(rights within bufferMs) per key; pass `idleTimeout` (e.g. "2 hours")
   * to ALSO evict keys idle longer than that in processing time, bounding
   * total state by ACTIVE key cardinality instead of every key ever seen.
   * Eviction is opt-in because registering processing-time timeouts makes
   * the micro-batch engine re-trigger continuously under the default
   * trigger(0) (measured: `processAllAvailable` never returns — an
   * infinite empty-batch loop); production deployments enabling it should
   * set a real trigger interval.
   */
  def asofEnrichStream(events: Dataset[Event], leftType: String, rightType: String,
                       bufferMs: Long = 60 * 60 * 1000L,
                       idleTimeout: Option[String] = None): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    events.filter(e => e.event_type == leftType || e.event_type == rightType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, Enriched](
        OutputMode.Append(), timeoutConf) {
        case (_, _, state: GroupState[AsofState]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (_, rows, state: GroupState[AsofState]) =>
          // Right events sort before left at equal ts: inclusive match.
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, if (e.event_type == rightType) 0 else 1, e.event_id))
          var rights = state.getOption.map(_.rights).getOrElse(Nil) // descending ts
          val out = Seq.newBuilder[Enriched]
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (e.event_type == rightType) {
              // Keep descending order under out-of-order arrivals; equal-ts
              // duplicates collapse to the largest value (the batch
              // operator's deterministic tie-break); trim to the horizon.
              val (newer, rest) = rights.partition(_._1 > t)
              val (eq, older) = rest.partition(_._1 == t)
              val v = (e.value :: eq.map(_._2)).max
              val horizon = math.max(t, rights.headOption.map(_._1).getOrElse(Long.MinValue)) - bufferMs
              rights = (newer ::: (t, v) :: older).takeWhile(_._1 >= horizon)
            } else {
              val m = rights.find(_._1 <= t)
              out += Enriched(e.event_id, e.user_id, e.ts, e.value,
                m.map(r => new Timestamp(r._1)), m.map(_._2))
            }
          }
          state.update(AsofState(rights))
          idleTimeout.foreach(state.setTimeoutDuration)
          out.result().iterator
      }
  }
}
