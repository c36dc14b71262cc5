package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming health monitoring (reference: real_time_streaming.py:463-533
  * polls `query.lastProgress` in a driver thread; the idiomatic Spark
  * form is an event-driven StreamingQueryListener — no polling thread,
  * no missed micro-batches).
  */
final class Monitor extends StreamingQueryListener {

  final case class QueryHealth(
      name: String, batches: Long, totalInputRows: Long,
      lastInputRowsPerSec: Double, lastBatchMs: Long, terminated: Boolean,
      error: Option[String], restarts: Int = 0)

  private val state = new ConcurrentHashMap[java.util.UUID, QueryHealth]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    state.compute(event.id, (_, prev) => {
      val fresh = QueryHealth(
        Option(event.name).getOrElse(event.id.toString),
        0, 0, 0.0, 0, terminated = false, None)
      // a restart (same checkpointed query id) must not erase the crash
      // record: carry the error forward until healthy progress clears it
      Option(prev) match {
        case Some(p) => fresh.copy(error = p.error, restarts = p.restarts + 1)
        case None    => fresh
      }
    })

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    state.compute(p.id, (_, prev0) => {
      val prev = Option(prev0).getOrElse(
        QueryHealth(Option(p.name).getOrElse(p.id.toString), 0, 0, 0.0, 0, terminated = false, None))
      prev.copy(
        batches = prev.batches + 1,
        totalInputRows = prev.totalInputRows + p.numInputRows,
        lastInputRowsPerSec = p.inputRowsPerSecond,
        lastBatchMs = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        error = None) // healthy progress clears a carried-over crash record
    })
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    state.computeIfPresent(event.id, (_, prev) =>
      prev.copy(terminated = true, error = event.exception))

  def health: Seq[QueryHealth] =
    scala.jdk.CollectionConverters.CollectionHasAsScala(state.values).asScala.toSeq

  /** Health rows of queries whose latest run died with an error (a
    * restart keeps the record until healthy progress) — the reference's
    * drop-failed-queries signal (real_time_streaming.py:505-510). */
  def failed: Seq[QueryHealth] = health.filter(_.error.isDefined)
}

object Monitor {
  /** Attach a monitor to the session's listener bus. */
  def attach(spark: SparkSession): Monitor = {
    val m = new Monitor
    spark.streams.addListener(m)
    m
  }
}
