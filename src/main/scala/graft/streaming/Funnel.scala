package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Incremental ordered-funnel tracking — the streaming front door of the
  * batch funnel (`operators/FunnelQueries.funnelSteps`): per user, the
  * strict-progression step timestamps view → click → purchase, updated
  * as events arrive and re-emitted whenever they change (Update mode).
  *
  * State is CONSTANT-SIZE per user: the single minimum view timestamp
  * (t1 only ever decreases, so the minimum is sufficient) plus the
  * `bufK` smallest click/purchase timestamps. The buffers are what make
  * late data correct: a view arriving late can lower t1 and thereby
  * validate a click that was seen BEFORE the view — recomputing from
  * the buffered minima finds it. The approximation bound is explicit:
  * a step can be missed only if more than `bufK` later-invalidated
  * earlier events of the same type precede it — unbounded exactness
  * would require keeping every event per user, which no streaming
  * funnel does.
  */
object Funnel {

  final case class FunnelEvent(user_id: Long, event_type: String, ts_s: Long)
  final case class FunnelBuf(minView: Option[Long], clicks: Seq[Long], purchases: Seq[Long])
  final case class FunnelUpdate(
      user_id: Long, t1: Option[Long], t2: Option[Long], t3: Option[Long])

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
          val prev = state.getOption.getOrElse(FunnelBuf(None, Nil, Nil))
          var minView = prev.minView
          var clicks = prev.clicks
          var purchases = prev.purchases
          it.foreach { e =>
            e.event_type match {
              case "view" =>
                if (!minView.exists(_ <= e.ts_s)) minView = Some(e.ts_s)
              case "click" =>
                clicks = (clicks :+ e.ts_s).sorted.take(bufK)
              case "purchase" =>
                purchases = (purchases :+ e.ts_s).sorted.take(bufK)
              case _ => ()
            }
          }
          state.update(FunnelBuf(minView, clicks, purchases))
          val t1 = minView
          val t2 = t1.flatMap(a => clicks.find(_ >= a))
          val t3 = t2.flatMap(b => purchases.find(_ >= b))
          FunnelUpdate(uid, t1, t2, t3)
      }
  }
}
