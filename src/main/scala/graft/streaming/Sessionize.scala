package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Det._

/** True gap-based sessionization — the SURVEY §7.6 extension beyond the
  * reference (whose "sessions" are batch groupBys on a session_id column).
  * Two implementations:
  *
  *  - [[sessionWindowRollup]]: Spark's built-in `session_window` — works
  *    in batch and streaming, state managed by the engine. Preferred.
  *  - [[sessionize]]: custom state via `flatMapGroupsWithState` with
  *    event-time timeouts — the template for session semantics the
  *    built-in can't express (e.g. value-dependent gaps).
  */
object Sessionize {

  /** Built-in session windows: a session extends while events arrive
    * within `gap` of the previous one; window end = last event + gap.
    * Streaming inputs get a watermark (required for append-mode session
    * aggregation) and skip the global sort (unsupported on streams). */
  def sessionWindowRollup(events: DataFrame, gap: String = "2 hours",
                          watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    val agg = src
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_s"),
        unix_timestamp(col("session_window.end")).as("session_end_s"),
        col("n_events"), col("total_value"))
    if (events.isStreaming) agg else agg.orderBy("user_id", "session_start_s")
  }

  final case class SessionEvent(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class OpenSession(startMs: Long, endMs: Long, n: Int, totalValue: Double)
  final case class SessionRow(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)

  /** Custom-state sessionization with event-time timeout: closed sessions
    * emit in append mode once the watermark passes end + gap. */
  def sessionize(spark: SparkSession, events: Dataset[SessionEvent],
                 gapMs: Long, watermark: String = "10 minutes"): Dataset[SessionRow] = {
    import spark.implicits._

    def toRow(uid: Long, s: OpenSession): SessionRow =
      SessionRow(uid, new Timestamp(s.startMs), new Timestamp(s.endMs + gapMs),
        s.n, s.totalValue)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toRow(uid, _))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionRow]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                // within the gap of either edge: extend (a cross-batch
                // straggler just before the open start widens it backward)
                case Some(s) if t >= s.startMs - gapMs && t - s.endMs <= gapMs =>
                  open = Some(s.copy(
                    startMs = math.min(s.startMs, t),
                    endMs = math.max(s.endMs, t), n = s.n + 1,
                    totalValue = s.totalValue + e.value))
                // after end + gap: close the open session, start a new one
                case Some(s) if t - s.endMs > gapMs =>
                  closed += toRow(uid, s)
                  open = Some(OpenSession(t, t, 1, e.value))
                // more than a gap BEFORE the open start: an out-of-order
                // straggler — emit as its own singleton session rather
                // than corrupting the open session's bounds
                case Some(_) =>
                  closed += toRow(uid, OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
