package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the engine's §7.4(c) whole-operator extension:
  * a custom `LogicalPlan` + `SparkStrategy` + physical `SparkPlan`,
  * entering the session through `SparkSessionExtensions`
  * ([[GraftExtensions]]) / `experimental.extraStrategies`.
  *
  * Semantics (identical to [[graft.operators.AsOfJoin]], DuckDB
  * `ASOF LEFT JOIN`): for each left row, the payload of the LAST right
  * row with the same key and `rightTs <= leftTs` (ties at equal ts
  * match; among equal (key, ts) right rows the greatest tie-break
  * wins); null payload when no right row qualifies.
  *
  * Why a physical operator when the union-window composition is
  * already one-shuffle linear: the composition widens EVERY shuffled
  * row to the union schema (left columns null-filled on right rows and
  * vice versa), sorts the union, and runs window machinery. This exec
  * shuffles each side at its own natural width, sorts each side
  * independently (both requirements expressed declaratively below, so
  * Catalyst plans the exchanges and can elide either when the child is
  * already hash-partitioned or sorted — e.g. a bucketed fact), and
  * then streams ONE ordered merge per partition: O(|L|+|R|) time,
  * O(key+payload) extra memory — no window buffer, no union schema.
  * `outputPartitioning`/`outputOrdering` re-expose the left side's
  * layout, so a downstream `groupBy(key)` plans with NO further
  * exchange — the property the union-window shape cannot offer (its
  * window output partitioning is on the widened union).
  *
  * At 100 TB: both sides hash-cluster on the key — fact-sized
  * shuffles, but each at minimal row width, and zero driver state. A
  * skewed key salts upstream exactly as for any clustered join.
  */
case class AsOfJoinNode(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    left: LogicalPlan,
    right: LogicalPlan,
    broadcastHint: Option[Boolean] = None,
    forward: Boolean = false) extends BinaryNode {

  /** Left columns as-is, then the whole right row as a nullable payload
    * (callers pre-project the right side to key, ts, payload). */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Exactly one output row per left row — so downstream planning must
    * NOT see the stats visitor's default for unknown binary nodes (the
    * join-like PRODUCT of child sizes), which would stop every
    * subsequent small-dim join from broadcasting. Additive is a sound
    * upper bound: |out| = |left| rows at left-width + one right payload
    * each ≤ left bytes + right bytes. */
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = left.stats.sizeInBytes + right.stats.sizeInBytes,
      rowCount = left.stats.rowCount)

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to a physical as-of, choosing the exec the
  * way Spark's `JoinSelection` chooses between BHJ and SMJ: a right
  * side whose logical stats fit under
  * `spark.sql.autoBroadcastJoinThreshold` goes to
  * [[BroadcastAsOfJoinExec]] (the fact side never moves), anything
  * bigger to the shuffle-merge [[AsOfJoinExec]]. `broadcastHint` on the
  * node overrides the stats decision in either direction. Injected via
  * `GraftExtensions` and the runtime `experimental.extraStrategies`
  * twin in `Tables.configure`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ AsOfJoinNode(lk, rk, lts, rts, tb, l, r, hint, fwd) =>
      val threshold = n.conf.autoBroadcastJoinThreshold
      val broadcast = hint.getOrElse(
        threshold > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold)
      if (broadcast)
        BroadcastAsOfJoinExec(lk, rk, lts, rts, tb, fwd, planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lts, rts, tb, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Per-partition ordered as-of merge. Requirements below make Catalyst
  * co-cluster both sides on the key and sort them (key, ts[, tie]) —
  * the merge itself is a single forward pass holding one pending right
  * row and one candidate payload.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Right side additionally orders by the tie-break columns so "last
    * qualifying row wins" (backward; greatest tie-break) / "first
    * qualifying row wins" (forward; smallest tie-break) resolves
    * equal-(key, ts) rows deterministically. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  // The merge consumes left in order and never reshuffles it — expose
  // that layout so downstream key-clustered ops plan zero exchanges.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      // Bind against nullable right attrs: the null-fill row must be read
      // with null checks even when the right child declared non-null.
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      val fwd = forward
      new Iterator[InternalRow] {
        // One un-consumed right row (copied — the child iterator reuses
        // its UnsafeRow buffer), and (backward mode) the current
        // candidate payload with its copied key. Left keys ascend, so a
        // right row whose key falls behind the left cursor can never
        // match again: drop it. In FORWARD mode the first remaining
        // right row at (key, ts >= leftTs) IS the match, and it is never
        // consumed on match — later left rows (ts only grows) may match
        // it again; a right row with ts < leftTs can serve no later left
        // either, so it is dropped.
        private var pending: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        private var cand: InternalRow = null
        private var candKey: UnsafeRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow) // valid until the next lKeyProj call
          val lTs = lTsProj(lRow)   // ditto — hoisted out of the advance loop
          // Backward carries the candidate across left rows of one key
          // group — invalidate it on key change. Forward recomputes the
          // match from `pending` for every left row.
          if (fwd) { cand = null }
          else if (cand != null && keyOrd.compare(candKey, lKey) != 0) {
            cand = null; candKey = null
          }
          var advancing = true
          while (advancing && pending != null) {
            val c = keyOrd.compare(rKeyProj(pending), lKey)
            if (c < 0) {
              pending = if (rIter.hasNext) rIter.next().copy() else null
            } else if (!fwd && c == 0 &&
                tsOrd.compare(rTsProj(pending), lTs) <= 0) {
              cand = pending
              candKey = rKeyProj(pending).copy()
              pending = if (rIter.hasNext) rIter.next().copy() else null
            } else if (fwd && c == 0 &&
                tsOrd.compare(rTsProj(pending), lTs) < 0) {
              pending = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              advancing = false
            }
          }
          if (fwd) {
            // NOT(rts < lts) is only ">= lts" when lts is non-null — a
            // null left ts must match nothing (SQL comparison semantics)
            cand = if (!lTs.isNullAt(0) && pending != null &&
                keyOrd.compare(rKeyProj(pending), lKey) == 0)
              pending else null
          }
          numOutputRows += 1
          if (cand != null) numMatched += 1
          outProj(joined(lRow, if (cand != null) cand else nullRight))
        }
      }
    }
  }
}

/** Broadcast as-of join — the BHJ analog for as-of: the (dim-sized)
  * right side broadcasts as plain rows, each executor indexes it once
  * per partition into key → time-sorted array, and every left row
  * resolves by hash lookup + binary search (rightmost `ts <= leftTs`,
  * which with the (ts, tieBreak) sort IS the greatest tie-break).
  *
  * The 100 TB point: the left/fact side requires NO distribution and NO
  * ordering — zero exchanges, zero sorts; its partitioning and ordering
  * pass straight through, exactly like Spark's own BroadcastHashJoin.
  * As-of enrichment against a reference table (exchange rates, model
  * version history, slowly-changing dims) touches each fact row once,
  * in place. Memory: O(|right|) per executor — the same budget as any
  * broadcast join, policed by the same `autoBroadcastJoinThreshold`.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // fact side streams through untouched — expose its layout verbatim
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val tieExprs = rightTieBreak
    val tsType = leftTs.dataType
    val tieTypes = rightTieBreak.map(_.dataType)
    val outAttrs = output
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      // (ts, tieBreak...) as one row so the sort and the search share
      // one ordering; search compares the ts prefix only
      val rOrderProj = UnsafeProjection.create(rTsExpr +: tieExprs, rOut)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val sortOrd = RowOrdering.createNaturalAscendingOrdering(tsType +: tieTypes)
      val lTsOnly = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // key → rows sorted by (ts, tieBreak). Built ONCE PER EXECUTOR JVM
      // and shared across this exec's partitions (keyed by broadcast id,
      // like Spark builds one HashedRelation per broadcast) — without the
      // cache every partition would redo the group+sort of the whole dim.
      val index = BroadcastAsOfJoinExec.indexFor(bcast.id, () => {
        val grouped = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]()
        bcast.value.foreach { row =>
          val k = rKeyProj(row).copy()
          var buf = grouped.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            grouped.put(k, buf)
          }
          buf += ((rOrderProj(row).copy(), row))
        }
        val built = new java.util.HashMap[UnsafeRow, Array[(UnsafeRow, InternalRow)]]()
        val byOrder = Ordering.comparatorToOrdering(
          new java.util.Comparator[(UnsafeRow, InternalRow)] {
            override def compare(a: (UnsafeRow, InternalRow),
                                 b: (UnsafeRow, InternalRow)): Int =
              sortOrd.compare(a._1, b._1)
          })
        grouped.forEach { (k, buf) => built.put(k, buf.sortInPlace()(byOrder).toArray) }
        built
      })

      val fwd = forward
      lIter.map { lRow =>
        val rows = index.get(lKeyProj(lRow))
        var cand: InternalRow = null
        if (rows != null) {
          val lTs = lTsOnly(lRow)
          // backward: rightmost idx with ts <= lTs; forward: leftmost idx
          // with ts >= lTs (a null left ts matches nothing either way —
          // backward fails every <=; forward must guard explicitly, the
          // natural null-first ordering would otherwise put null below
          // every real ts and "match" the whole array)
          if (!fwd) {
            var lo = 0
            var hi = rows.length - 1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsOrd.compare(rows(mid)._1, lTs) <= 0) { cand = rows(mid)._2; lo = mid + 1 }
              else hi = mid - 1
            }
          } else if (!lTs.isNullAt(0)) {
            var lo = 0
            var hi = rows.length - 1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsOrd.compare(rows(mid)._1, lTs) >= 0) { cand = rows(mid)._2; hi = mid - 1 }
              else lo = mid + 1
            }
          }
        }
        numOutputRows += 1
        if (cand != null) numMatched += 1
        outProj(joined(lRow, if (cand != null) cand else nullRight))
      }
    }
  }
}

object BroadcastAsOfJoinExec {
  type AsOfIndex = java.util.HashMap[UnsafeRow, Array[(UnsafeRow, InternalRow)]]

  // broadcast.id → built index; a small LRU bounded per executor. The
  // index is read-only after construction, so sharing across partitions
  // and queries is safe; eviction only costs a rebuild, never
  // correctness. Keyed by the broadcast id (unique per broadcast
  // variable), NOT the plan — re-executions reuse, new broadcasts don't.
  private val cache = new java.util.LinkedHashMap[Long, AsOfIndex](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Long, AsOfIndex]): Boolean =
      size() > 4
  }

  /** Build-once-per-JVM: the first partition to arrive builds (holding
    * the lock, so concurrent partitions block instead of duplicating the
    * group+sort), the rest just read. */
  private[plans] def indexFor(id: Long, build: () => AsOfIndex): AsOfIndex =
    cache.synchronized {
      var v = cache.get(id)
      if (v == null) { v = build(); cache.put(id, v) }
      v
    }
}
