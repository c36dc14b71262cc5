package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Incremental ordered-funnel tracking — the streaming front door of the
  * batch funnel (`operators/FunnelQueries.funnelSteps`): per user, the
  * strict-progression step timestamps view → click → purchase, updated
  * as events arrive and re-emitted whenever they change (Update mode).
  *
  * State exploits the funnel's monotonicity: every step threshold only
  * ever DECREASES (t1 is a minimum; t2 = min click ≥ t1 can only fall
  * when t1 falls or a smaller valid click arrives; likewise t3). So a
  * step, once completed, NEVER regresses — the state keeps the current
  * valid minimum per step plus the still-PENDING timestamps (events
  * below the current threshold, which a late view/click can still
  * validate by lowering that threshold).
  *
  * Pending state is evicted by the stream's WATERMARK, which makes the
  * operator EXACT under the watermark contract: a pending event at ts
  * can only ever validate if a new upstream event arrives at or below
  * ts, and once the watermark passes ts no such event is admitted — so
  * dropping pending entries (and ignoring late input) below the
  * watermark cannot change any emitted step. Per-user state is thereby
  * bounded by the events inside the watermark horizon — the same bound
  * Spark's own `dropDuplicates`-with-watermark carries. `bufK` remains
  * as an OPTIONAL hard cap for callers who want fixed-size state without
  * a watermark; with the default (unbounded) cap the watermark is the
  * only eviction and the result is exact.
  */
object Funnel {

  final case class FunnelEvent(user_id: Long, event_type: String, ts_s: Long)
  final case class FunnelBuf(
      minView: Option[Long],
      validClick: Option[Long], pendClicks: Seq[Long],
      validPurchase: Option[Long], pendPurchases: Seq[Long])
  final case class FunnelUpdate(
      user_id: Long, t1: Option[Long], t2: Option[Long], t3: Option[Long])

  /** Split `prior valid ∪ pending ∪ batch` against a (possibly lowered)
    * threshold: new valid minimum and the still-pending entries, minus
    * anything the watermark has made unreachable. */
  private def settle(threshold: Option[Long], valid: Option[Long],
                     pending: Seq[Long], batch: Seq[Long],
                     bufK: Int, wmS: Long): (Option[Long], Seq[Long]) = {
    val all = valid.toSeq ++ pending ++ batch
    // a pending entry p validates only via a future event with ts ≤ p;
    // future events sit at or above the watermark, so p < wm is dead
    threshold match {
      case None => (None, all.filter(_ >= wmS).sorted.take(bufK))
      case Some(t) =>
        val (ok, pend) = all.partition(_ >= t)
        (ok.minOption, pend.filter(_ >= wmS).sorted.take(bufK))
    }
  }

  /** One funnel row per (user, micro-batch touching that user): current
    * step-completion timestamps. Works identically on a batch Dataset
    * (single invocation per key — and exact, since nothing is ever
    * pending across invocations). Downstream keep-latest per user yields
    * the funnel table; an aggregation over it yields q58's summary.
    * Attach `withWatermark` upstream to bound state; events later than
    * the watermark are excluded (the standard late-data contract). The
    * watermarked column must remain in the input plan — watermark
    * presence is read off the operator's child output, so projecting the
    * event-time column away silently disables eviction (`as[FunnelEvent]`
    * binds by name and keeps extra columns). */
  /** One pure state transition: prior buffer + a micro-batch's events for
    * one user (+ the watermark, if any) → next buffer. Extracted from the
    * mapGroupsWithState closure so the batching-invariance property —
    * folding `advance` over ANY partition of the events equals one batch,
    * absent a watermark — is testable without the streaming harness. */
  private[streaming] def advance(prev: FunnelBuf, events: Seq[FunnelEvent],
                                 wmMs: Option[Long], bufK: Int): FunnelBuf = {
    val batch = wmMs match {
      case Some(w) => events.filter(_.ts_s * 1000L >= w)
      case None    => events
    }
    // ceil: pending at ts survives iff ts*1000 >= wmMs
    val wmS = wmMs.map(w => (w + 999L) / 1000L).getOrElse(Long.MinValue)
    def of(t: String) = batch.collect { case e if e.event_type == t => e.ts_s }
    val minView = (prev.minView.toSeq ++ of("view")).minOption
    val (validClick, pendClicks) =
      settle(minView, prev.validClick, prev.pendClicks, of("click"), bufK, wmS)
    val (validPurchase, pendPurchases) =
      settle(validClick, prev.validPurchase, prev.pendPurchases, of("purchase"), bufK, wmS)
    FunnelBuf(minView, validClick, pendClicks, validPurchase, pendPurchases)
  }

  private[streaming] val emptyBuf = FunnelBuf(None, None, Nil, None, Nil)

  def streamingFunnel(spark: SparkSession, events: Dataset[FunnelEvent],
                      bufK: Int = Int.MaxValue): Dataset[FunnelUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: org.apache.spark.sql.streaming.GroupState[FunnelBuf]) =>
          val prev = state.getOption.getOrElse(emptyBuf)
          // None when no watermark is attached (batch mode, or an
          // unbounded stream): nothing is evicted, nothing is considered
          // late — the guard matters for pre-1970 (negative-epoch) data,
          // which an unconditional >= 0 comparison would silently drop
          val wmMs = try Some(state.getCurrentWatermarkMs())
            catch { case _: UnsupportedOperationException => None }
          val next = advance(prev, it.toSeq, wmMs, bufK)
          state.update(next)
          FunnelUpdate(uid, next.minView, next.validClick, next.validPurchase)
      }
  }
}
