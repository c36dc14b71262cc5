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
    * Event time is floored to whole seconds first so the gap decision
    * matches the gaps-and-islands formulation (q34 and its oracle
    * compare floor-second timestamps; a sub-second difference straddling
    * exactly the gap boundary would otherwise split sessions
    * differently). Streaming inputs get a watermark (required for
    * append-mode session aggregation) and skip the global sort
    * (unsupported on streams). */
  def sessionWindowRollup(events: DataFrame, gap: String = "2 hours",
                          watermark: String = "10 minutes"): DataFrame = {
    val floored = events.withColumn("ts", date_trunc("second", col("ts")))
    val src = if (events.isStreaming) floored.withWatermark("ts", watermark) else floored
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
    * emit in append mode once the watermark passes end + gap. Works on
    * batch Datasets too — timeouts never fire in batch, so the final open
    * session per key is emitted directly instead of parked in state.
    *
    * Each invocation runs a proper interval merge over {state's open
    * session} ∪ {this batch's events} sorted by time, so out-of-order
    * stragglers merge with EACH OTHER (and with the open session when in
    * gap range) rather than producing overlapping sessions. */
  def sessionize(spark: SparkSession, events: Dataset[SessionEvent],
                 gapMs: Long, watermark: String = "10 minutes"): Dataset[SessionRow] = {
    import spark.implicits._

    val isStreaming = events.isStreaming

    def toRow(uid: Long, s: OpenSession): SessionRow =
      SessionRow(uid, new Timestamp(s.startMs), new Timestamp(s.endMs + gapMs),
        s.n, s.totalValue)

    val src = if (isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toRow(uid, _))
            state.remove()
            out.iterator
          } else {
            // merge intervals: the open session joins the batch's events
            // in time order (stragglers sort before it naturally)
            val intervals: Seq[OpenSession] =
              (state.getOption.toSeq ++
                it.map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1, e.value)))
                .sortBy(s => (s.startMs, s.endMs))
            val closed = Seq.newBuilder[SessionRow]
            var open: Option[OpenSession] = None
            intervals.foreach { iv =>
              open = open match {
                case Some(s) if iv.startMs - s.endMs <= gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.endMs, iv.endMs),
                    s.n + iv.n, s.totalValue + iv.totalValue))
                case Some(s) =>
                  closed += toRow(uid, s)
                  Some(iv)
                case None => Some(iv)
              }
            }
            if (isStreaming) {
              open.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp(s.endMs + gapMs)
              }
            } else {
              // batch: no timeout will ever fire — emit the last session
              open.foreach(closed += toRow(uid, _))
              if (state.exists) state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
