package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Incremental ordered-funnel tracking — the streaming front door of the
  * batch funnel (`operators/FunnelQueries.funnelSteps`): per user, the
  * strict-progression step timestamps view → click → purchase, updated
  * as events arrive and re-emitted whenever they change (Update mode).
  *
  * State is CONSTANT-SIZE per user and exploits the funnel's
  * monotonicity: every step threshold only ever DECREASES (t1 is a
  * minimum; t2 = min click ≥ t1 can only fall when t1 falls or a
  * smaller valid click arrives; likewise t3). So a step, once
  * completed, NEVER regresses — the state keeps the current valid
  * minimum per step plus the `bufK` smallest still-PENDING timestamps
  * (events below the current threshold, which a late view/click can
  * still validate by lowering that threshold). The approximation bound
  * is explicit: a step can be mis-reported only when a falling
  * threshold lands inside a pending band that already evicted more
  * than `bufK` smaller same-type events — unbounded exactness would
  * require keeping every event per user, which no streaming funnel
  * does.
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
    * threshold: new valid minimum and the bufK smallest still-pending. */
  private def settle(threshold: Option[Long], valid: Option[Long],
                     pending: Seq[Long], batch: Seq[Long],
                     bufK: Int): (Option[Long], Seq[Long]) = {
    val all = valid.toSeq ++ pending ++ batch
    threshold match {
      case None => (None, all.sorted.take(bufK))
      case Some(t) =>
        val (ok, pend) = all.partition(_ >= t)
        (ok.minOption, pend.sorted.take(bufK))
    }
  }

  /** One funnel row per (user, micro-batch touching that user): current
    * step-completion timestamps. Works identically on a batch Dataset
    * (single invocation per key). Downstream keep-latest per user yields
    * the funnel table; an aggregation over it yields q58's summary. */
  def streamingFunnel(spark: SparkSession, events: Dataset[FunnelEvent],
                      bufK: Int = 8): Dataset[FunnelUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: org.apache.spark.sql.streaming.GroupState[FunnelBuf]) =>
          val prev = state.getOption.getOrElse(FunnelBuf(None, None, Nil, None, Nil))
          val batch = it.toSeq
          def of(t: String) = batch.collect { case e if e.event_type == t => e.ts_s }
          val minView = (prev.minView.toSeq ++ of("view")).minOption
          val (validClick, pendClicks) =
            settle(minView, prev.validClick, prev.pendClicks, of("click"), bufK)
          val (validPurchase, pendPurchases) =
            settle(validClick, prev.validPurchase, prev.pendPurchases, of("purchase"), bufK)
          state.update(FunnelBuf(minView, validClick, pendClicks, validPurchase, pendPurchases))
          FunnelUpdate(uid, minView, validClick, validPurchase)
      }
  }
}
