package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-exact STREAM-STREAM backward as-of — both sides arrive as
  * streams, and each left row is matched to the last right row with the
  * same key and `rightTs <= leftTs` (ties at equal ts resolve to the
  * greatest right id, the batch operator's contract).
  *
  * Spark's stream-stream joins cover equi and interval conditions but
  * not "the LATEST right at-or-before" — that needs ordered state, so
  * this is the `flatMapGroupsWithState` tier (the q69 funnel's
  * machinery) applied to the as-of contract. Both sides ride ONE
  * union-tagged keyed stream ([[AsOfInput]]); per key the state holds:
  *
  *  - buffered LEFT rows not yet finalizable: a left at `lts` may still
  *    see a better right while `lts >= watermark` (a future right with
  *    `rts <= lts` is only impossible once the watermark passes `lts` —
  *    any such arrival would itself be late and dropped). Once the
  *    watermark passes, the match is FINAL: emitted exactly once,
  *    append-mode.
  *  - RIGHT history, dominance-pruned: among right rows at-or-below
  *    `floor = min(watermark, oldest buffered left ts)`, only the
  *    greatest (ts, id) can ever win for any future left (every future
  *    left's ts is ≥ floor, and a nearer right is preferred), so one
  *    row is kept and the rest drop. Rights above the floor stay. State
  *    is thereby bounded by the watermark horizon — the same bound
  *    Spark's own stream-stream join state carries.
  *
  * An event-time timeout re-fires the group when the watermark passes
  * its oldest buffered left, so finalization never waits for new data
  * on that key. Exactness under the late-data contract is the q72/q69
  * argument: dropped-late lefts are the watermark's contract, and no
  * admissible future input can change an emitted match.
  *
  * At 100 TB: state is per-key O(horizon); the stream shuffles once on
  * the key, exactly like the batch merge exec's clustering; a skewed
  * key salts upstream the same way.
  */
object AsOfStream {

  /** Union-tag encoding: `isRight = false` rows are the probe side
    * (id = left row id), `isRight = true` rows carry the payload. */
  final case class AsOfInput(
      key: Long, ts: java.sql.Timestamp, isRight: Boolean, id: Long, payload: Double)

  final case class LeftRow(tsUs: Long, id: Long)
  final case class RightRow(tsUs: Long, id: Long, payload: Double)
  final case class AsOfBuf(lefts: List[LeftRow], rights: List[RightRow])

  /** One finalized left row with its as-of match (null when no right at
    * or before it survives). */
  final case class AsOfMatch(
      key: Long, left_id: Long, left_ts_us: Long,
      asof_id: Option[Long], asof_payload: Option[Double])

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  /** Saturating add for timeout arithmetic — a ts near the domain edge
    * must clamp, not wrap into the past. */
  private def satAddUs(a: Long, b: Long): Long =
    if (a > 0 && b > Long.MaxValue - a) Long.MaxValue else a + b

  /** `delay` is the watermark delay (e.g. "30 seconds"); results are
    * exact for every left row at-or-above the watermark at its arrival.
    *
    * `horizonUs` bounds how long a key's RIGHT history outlives its last
    * left: the dominance-pruned candidate is semantically valid forever
    * (a backward as-of probe arriving years later still matches it), but
    * keeping it forever means an idle key's state never drops — unlike
    * Spark's own stream-stream join, whose condition-derived bound
    * evicts. With a finite horizon, rights more than `horizonUs` behind
    * the watermark are evicted and a rights-only key registers an
    * event-time timeout at `newestRight + horizon`, after which its
    * state is REMOVED. Results equal the batch as-of for every left
    * whose match gap is ≤ horizon; a left probing further back than the
    * horizon sees null — the documented eviction contract. The default
    * `Long.MaxValue` keeps batch-exact unbounded retention. */
  def asofStream(in: Dataset[AsOfInput], delay: String,
                 horizonUs: Long = Long.MaxValue): Dataset[AsOfMatch] = {
    import in.sparkSession.implicits._
    in.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        resolve(horizonUs) _)
  }

  /** FORWARD stream-stream as-of, tolerance-bounded: each left row
    * matched to the FIRST right with `lts <= rts <= lts + tolerance`
    * (equal-ts ties to the smallest id — the batch forward contract;
    * null when none inside the bound). The bound is what makes forward
    * streaming finite-state at all: an UNBOUNDED forward match can
    * arrive arbitrarily far in the future, so no watermark ever
    * finalizes a miss — with the bound, a left finalizes exactly when
    * the watermark passes `lts + tolerance` (any admissible right
    * arriving later would be late). Right history prunes harder than
    * backward: a right below `min(watermark, oldest buffered left)` can
    * match no present or future left (forward needs `rts >= lts`), so
    * it drops entirely — no dominant-row carry. This is the streaming
    * next-event-within-T attribution shape (q74's interval join picks
    * ALL pairs in the window; this picks the FIRST). */
  def asofStreamForward(in: Dataset[AsOfInput], delay: String,
                        toleranceUs: Long): Dataset[AsOfMatch] = {
    import in.sparkSession.implicits._
    in.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        resolveForward(toleranceUs) _)
  }

  /** NEAREST stream-stream as-of, tolerance-bounded: each left matched
    * to the same-key right minimizing `|rts − lts|` subject to the
    * bound (ties prefer the at-or-before side; within equal ts the
    * backward side takes the greatest id, the forward side the
    * smallest — the batch nearest contract). The bound makes BOTH
    * directions finite: a left finalizes exactly when the watermark
    * passes `lts + tolerance` (a nearer right arriving later would be
    * late — same argument as forward), and right history below
    * `min(watermark, oldest buffered left) − tolerance` can be inside
    * no present or future left's window, so it drops. No dominance
    * carry: the winner can sit on either side of the left. */
  def asofStreamNearest(in: Dataset[AsOfInput], delay: String,
                        toleranceUs: Long): Dataset[AsOfMatch] = {
    import in.sparkSession.implicits._
    in.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        resolveNearest(toleranceUs) _)
  }

  private[streaming] def resolveNearest(tolUs: Long)(
      key: Long, rows: Iterator[AsOfInput],
      state: GroupState[AsOfBuf]): Iterator[AsOfMatch] = {
    val buf = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
    var lefts = buf.lefts
    var rights = buf.rights
    rows.foreach { r =>
      if (r.isRight) rights ::= RightRow(micros(r.ts), r.id, r.payload)
      else lefts ::= LeftRow(micros(r.ts), r.id)
    }
    val wmUs = watermarkUs(state)
    // final once the watermark passes the whole two-sided window
    val (ready, still) = lefts.partition(l => satAddUs(l.tsUs, tolUs) < wmUs)
    val rSorted = rights.sortBy(r => (r.tsUs, r.id))
    val out = ready.sortBy(l => (l.tsUs, l.id)).map { l =>
      val inWin = rSorted.filter(r =>
        r.tsUs >= l.tsUs - tolUs && r.tsUs <= l.tsUs + tolUs)
      val bw = inWin.filter(_.tsUs <= l.tsUs).lastOption  // greatest (ts, id) at-or-before
      val fw = inWin.find(_.tsUs > l.tsUs)                // smallest (ts, id) strictly after
      val m = (bw, fw) match {
        case (Some(b), Some(f)) =>
          if (l.tsUs - b.tsUs <= f.tsUs - l.tsUs) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
      AsOfMatch(key, l.id, l.tsUs, m.map(_.id), m.map(_.payload))
    }
    // a right below every present AND future left's window is dead:
    // future lefts have ts >= min(watermark, oldest buffered left)
    val floorUs = math.min(wmUs, still.map(_.tsUs).minOption.getOrElse(Long.MaxValue))
    val kept = rSorted.filter(r => r.tsUs >= floorUs - tolUs)
    if (still.isEmpty && kept.isEmpty) {
      state.remove()
    } else {
      state.update(AsOfBuf(still, kept))
      if (still.nonEmpty)
        state.setTimeoutTimestamp(satAddUs(still.map(_.tsUs).min, tolUs) / 1000L + 1L)
      else
        // rights-only: all kept rights are droppable once the watermark
        // passes newest + tolerance — re-fire there so idle keys remove
        state.setTimeoutTimestamp(satAddUs(kept.map(_.tsUs).max, tolUs) / 1000L + 1L)
    }
    out.iterator
  }

  private[streaming] def resolveForward(tolUs: Long)(
      key: Long, rows: Iterator[AsOfInput],
      state: GroupState[AsOfBuf]): Iterator[AsOfMatch] = {
    val buf = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
    var lefts = buf.lefts
    var rights = buf.rights
    rows.foreach { r =>
      if (r.isRight) rights ::= RightRow(micros(r.ts), r.id, r.payload)
      else lefts ::= LeftRow(micros(r.ts), r.id)
    }
    val wmUs = watermarkUs(state)
    // final once the watermark passes the whole admissible window
    val (ready, still) = lefts.partition(l => satAddUs(l.tsUs, tolUs) < wmUs)
    val rSorted = rights.sortBy(r => (r.tsUs, r.id))
    val out = ready.sortBy(l => (l.tsUs, l.id)).map { l =>
      val m = rSorted.find(r => r.tsUs >= l.tsUs && r.tsUs <= l.tsUs + tolUs)
      AsOfMatch(key, l.id, l.tsUs, m.map(_.id), m.map(_.payload))
    }
    // forward needs rts >= lts: rights below every present AND future
    // left are dead weight
    val floorUs = math.min(wmUs, still.map(_.tsUs).minOption.getOrElse(Long.MaxValue))
    val kept = rSorted.filter(_.tsUs >= floorUs)
    if (still.isEmpty && kept.isEmpty) {
      state.remove()
    } else {
      state.update(AsOfBuf(still, kept))
      if (still.nonEmpty)
        state.setTimeoutTimestamp(satAddUs(still.map(_.tsUs).min, tolUs) / 1000L + 1L)
      else
        // rights-only state is naturally watermark-bounded in forward
        // mode (a right below the watermark can match no future left) —
        // re-fire when the watermark passes the newest kept right so an
        // idle key's state is removed instead of lingering forever
        state.setTimeoutTimestamp(kept.map(_.tsUs).max / 1000L + 1L)
    }
    out.iterator
  }

  /** The group's event-time watermark in µs. Spark's global watermark
    * starts at 0 and only ever advances (`WatermarkTracker` clamps at
    * ≥ 0), so 0 is BOTH "none yet" and the genuine floor — there is no
    * distinct no-watermark signal to read. Treating 0 as a real
    * watermark is exact for both: post-epoch rows (the only rows whose
    * watermark can ever pass them) finalize identically, and a
    * pre-epoch row — which Spark's clamped watermark can never admit as
    * on-time — finalizes immediately under the late-data contract
    * instead of buffering forever. */
  private def watermarkUs(state: GroupState[AsOfBuf]): Long =
    state.getCurrentWatermarkMs() * 1000L

  private[streaming] def resolve(horizonUs: Long)(
      key: Long, rows: Iterator[AsOfInput],
      state: GroupState[AsOfBuf]): Iterator[AsOfMatch] = {
    val buf = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
    var lefts = buf.lefts
    var rights = buf.rights
    rows.foreach { r =>
      if (r.isRight) rights ::= RightRow(micros(r.ts), r.id, r.payload)
      else lefts ::= LeftRow(micros(r.ts), r.id)
    }
    val wmUs = watermarkUs(state)
    // a left strictly below the watermark can never see another right
    // with rts <= lts (it would be late) — final
    val (ready, still) = lefts.partition(_.tsUs < wmUs)
    val rSorted = rights.sortBy(r => (r.tsUs, r.id))
    val out = ready.sortBy(l => (l.tsUs, l.id)).map { l =>
      // last right at-or-before: rSorted ascending → the final element
      // of the prefix; equal (ts) duplicates resolve to greatest id by
      // the (ts, id) sort
      var m: RightRow = null
      var i = 0
      while (i < rSorted.length && rSorted(i).tsUs <= l.tsUs) { m = rSorted(i); i += 1 }
      AsOfMatch(key, l.id, l.tsUs,
        Option(m).map(_.id), Option(m).map(_.payload))
    }
    // dominance-prune the right history: below the floor only the
    // greatest (ts, id) row can ever win again
    val floorUs = math.min(wmUs, still.map(_.tsUs).minOption.getOrElse(Long.MaxValue))
    val (below, above) = rSorted.partition(_.tsUs <= floorUs)
    // horizon eviction: a right more than `horizonUs` behind the
    // watermark drops even if dominant — the retention contract that
    // keeps idle keys' state from living forever
    val evictBelowUs =
      if (horizonUs == Long.MaxValue) Long.MinValue else wmUs - horizonUs
    val kept = (below.lastOption.toList ++ above).filter(_.tsUs >= evictBelowUs)
    if (still.isEmpty && kept.isEmpty) {
      state.remove()
    } else {
      state.update(AsOfBuf(still, kept))
      // re-fire when the watermark passes the oldest buffered left (ms
      // grain, +1 so "passes" is strict) — registered from the FIRST
      // batch, else a key that never sees data again would never
      // finalize its buffered lefts
      if (still.nonEmpty)
        state.setTimeoutTimestamp(still.map(_.tsUs).min / 1000L + 1L)
      else if (horizonUs != Long.MaxValue) {
        // rights-only state: re-fire once the horizon passes the newest
        // kept right, at which point every right evicts and the state
        // is removed (idle-key cleanup, Spark-join-style). satAddUs
        // saturates, so a pathological near-MaxValue right still
        // registers a (never-firing) timeout instead of silently
        // skipping the retention contract.
        val newest = kept.map(_.tsUs).max
        state.setTimeoutTimestamp(satAddUs(newest, horizonUs) / 1000L + 1L)
      }
    }
    out.iterator
  }
}
