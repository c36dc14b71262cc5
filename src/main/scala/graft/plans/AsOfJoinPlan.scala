package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSeq, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, GenerateUnsafeProjection, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.DataType

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
/** Match direction, pandas `merge_asof` taxonomy: BACKWARD = last right
  * at-or-before (DuckDB ASOF; equal-(key, ts) ties to the GREATEST
  * tie-break), FORWARD = first right at-or-after (ties to the SMALLEST
  * tie-break), NEAREST = whichever of the two is closer in time, equal
  * distance preferring backward (the pandas convention). Nearest needs
  * distance ARITHMETIC, not just ordering, so it requires a
  * numeric/datetime ts domain ([[TsMagnitude]]); backward/forward work
  * over any ordered type. */
sealed abstract class AsOfDir(val name: String) extends Serializable
object AsOfDir {
  case object Backward extends AsOfDir("backward")
  case object Forward extends AsOfDir("forward")
  case object Nearest extends AsOfDir("nearest")
  def of(s: String): AsOfDir = s match {
    case Backward.name => Backward
    case Forward.name => Forward
    case Nearest.name => Nearest
    case other => throw new IllegalArgumentException(
      s"asof direction must be backward|forward|nearest, got '$other'")
  }
}

case class AsOfJoinNode(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    left: LogicalPlan,
    right: LogicalPlan,
    broadcastHint: Option[Boolean] = None,
    direction: AsOfDir = AsOfDir.Backward) extends BinaryNode {

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
    case n @ AsOfJoinNode(lk, rk, lts, rts, tb, l, r, hint, dir) =>
      val threshold = n.conf.autoBroadcastJoinThreshold
      val broadcast = hint.getOrElse(
        threshold > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold)
      if (broadcast)
        BroadcastAsOfJoinExec(lk, rk, lts, rts, tb, dir, planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lts, rts, tb, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Single-field magnitude reader for nearest-distance arithmetic over
  * the ts domain: long path (EXACT) for datetime/integral types, double
  * path for fractional ones. Resolved once at construction — per-row
  * reads are a monomorphic getter call. Unsupported (non-arithmetic)
  * ts types fail here, at planning, with an actionable message. */
private[plans] final class TsMagnitude(t: DataType) extends Serializable {
  import org.apache.spark.sql.types._
  val fractional: Boolean = t match {
    case DoubleType | FloatType => true
    case TimestampType | TimestampNTZType | LongType | DateType |
         IntegerType | ShortType | ByteType => false
    case other => throw new IllegalArgumentException(
      s"asof direction=nearest needs a datetime or numeric ts domain " +
        s"(distance arithmetic); got $other — use backward/forward, which " +
        "only need an ordering")
  }
  private val getLong: InternalRow => Long = t match {
    case TimestampType | TimestampNTZType | LongType => _.getLong(0)
    case DateType | IntegerType => _.getInt(0).toLong
    case ShortType => _.getShort(0).toLong
    case ByteType => _.getByte(0).toLong
    case _ => _ => 0L
  }
  def long(r: InternalRow): Long = getLong(r)
  def dbl(r: InternalRow): Double = t match {
    case DoubleType => r.getDouble(0)
    case FloatType => r.getFloat(0).toDouble
    case _ => getLong(r).toDouble
  }
  /** `|l − b| ≤ |f − l|` given `b ≤ l ≤ f` (the candidates' invariant),
    * as magnitudes already extracted — extraction happens BEFORE the
    * next projection call because the single-field rows share a reused
    * buffer. */
  def backwardWinsL(l: Long, b: Long, f: Long): Boolean = l - b <= f - l
  def backwardWinsD(l: Double, b: Double, f: Double): Boolean = l - b <= f - l
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
    direction: AsOfDir,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode with CodegenSupport {

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

  /** Per-partition merge-cursor factory shared by the interpreted and
    * generated paths — one implementation of the advance semantics. */
  private def mergerFactory: AsOfMergerFactory =
    new AsOfMergerFactory(right.output, rightKeys, rightTs,
      leftKeys.map(_.dataType), leftTs.dataType, direction)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val lTsExpr = leftTs
    val outAttrs = output
    val factory = mergerFactory
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val merger = factory.create(rIter)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      // Bind against nullable right attrs: the null-fill row must be read
      // with null checks even when the right child declared non-null.
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      lIter.map { lRow =>
        val cand = merger.advance(lKeyProj(lRow), lTsProj(lRow))
        numOutputRows += 1
        if (cand != null) numMatched += 1
        outProj(joined(lRow, if (cand != null) cand else nullRight))
      }
    }
  }

  // ---- whole-stage codegen, the SortMergeJoin two-iterator pattern:
  // the stage's processNext() drives the LEFT iterator in generated
  // code, each row's (key, ts) probes the per-partition merge cursor,
  // and the output columns flow straight into the downstream consume —
  // no JoinedRow, no output projection, no InputAdapter boundary.
  // Unlike SMJ, our children are NOT wrapped by CollapseCodegenStages'
  // class-keyed special case, so inputRDDs executes them directly: the
  // scan-side stages below each exchange keep their own codegen spans
  // (they are separate query stages under AQE); only the Sorts' trivial
  // input-consumption fusion is forgone.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // Output vars point into the children's reused row buffers, so a
  // buffering parent must copy (exactly SMJ's posture).
  override def needCopyResult: Boolean = true

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    throw new UnsupportedOperationException(
      "AsOfJoinExec drives its own produce loop; nothing consumes into it")

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val factoryRef = ctx.addReferenceObj("asofMergerFactory", mergerFactory,
      classOf[AsOfMergerFactory].getName)
    val merger = ctx.addMutableState(classOf[AsOfMergeState].getName, "asofMerger",
      v => s"$v = $factoryRef.create((scala.collection.Iterator) $rightInput);")
    val leftRow = ctx.freshName("asofLeftRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val keyEv = GenerateUnsafeProjection.createCode(ctx,
      BindReferences.bindReferences(leftKeys, AttributeSeq(left.output)))
    val tsEv = GenerateUnsafeProjection.createCode(ctx,
      Seq(BindReferences.bindReference(leftTs, AttributeSeq(left.output))))
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val matched = ctx.freshName("asofMatched")
    ctx.INPUT_ROW = matched
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val ev = BoundReference(i, a.dataType, nullable = true).genCode(ctx)
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val javaType = CodeGenerator.javaType(a.dataType)
      val code =
        code"""
           |boolean $isNull = true;
           |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
           |if ($matched != null) {
           |  ${ev.code}
           |  $isNull = ${ev.isNull};
           |  $value = ${ev.value};
           |}
         """.stripMargin
      ExprCode(code, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val numMatchedM = metricTerm(ctx, "numMatched")
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${keyEv.code}
       |  ${tsEv.code}
       |  InternalRow $matched = $merger.advance(${keyEv.value}, ${tsEv.value});
       |  $numOutputRows.add(1);
       |  if ($matched != null) $numMatchedM.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

/** Builds per-partition [[AsOfMergeState]] cursors — serializable so the
  * interpreted closure and the generated class's references can both
  * carry it; the projections and orderings are constructed per cursor
  * (they are single-threaded mutable state). */
final class AsOfMergerFactory(
    rOut: Seq[Attribute],
    rKeyExprs: Seq[Expression],
    rTsExpr: Expression,
    keyTypes: Seq[DataType],
    tsType: DataType,
    direction: AsOfDir) extends Serializable {
  // constructed eagerly so an unsupported nearest ts domain fails at
  // PLAN time on the driver, not per-task on executors
  private val mag: TsMagnitude =
    if (direction == AsOfDir.Nearest) new TsMagnitude(tsType) else null
  def create(rIter: Iterator[InternalRow]): AsOfMergeState =
    new AsOfMergeState(rIter,
      UnsafeProjection.create(rKeyExprs, rOut),
      UnsafeProjection.create(Seq(rTsExpr), rOut),
      RowOrdering.createNaturalAscendingOrdering(keyTypes),
      RowOrdering.createNaturalAscendingOrdering(Seq(tsType)),
      direction, mag)
}

/** One partition's as-of merge cursor over the (key, ts[, tie])-sorted
  * right iterator: holds one un-consumed right row (copied — the child
  * iterator reuses its UnsafeRow buffer) and, in backward mode, the
  * current candidate payload with its copied key. Left keys ascend, so
  * a right row whose key falls behind the left cursor can never match
  * again: drop it. In FORWARD mode the first remaining right row at
  * (key, ts >= leftTs) IS the match, and it is never consumed on match —
  * later left rows (ts only grows) may match it again; a right row with
  * ts < leftTs can serve no later left either, so it is dropped. */
final class AsOfMergeState(
    rIter: Iterator[InternalRow],
    rKeyProj: UnsafeProjection,
    rTsProj: UnsafeProjection,
    keyOrd: Ordering[InternalRow],
    tsOrd: Ordering[InternalRow],
    direction: AsOfDir,
    mag: TsMagnitude) {

  private val forward = direction == AsOfDir.Forward
  private val nearest = direction == AsOfDir.Nearest

  private var pending: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
  private var cand: InternalRow = null
  private var candKey: UnsafeRow = null

  private def nextOrNull(): InternalRow =
    if (rIter.hasNext) rIter.next().copy() else null

  /** The matched right row for the next left (key, ts), or null. `lKey`
    * and `lTs` may live in reused projection buffers — never retained.
    * LEFT ROWS MUST ARRIVE (key, ts)-ASCENDING (the exec's required
    * ordering).
    *
    * NEAREST runs the backward consume (so `cand` = last right with
    * `rts <= lts`, greatest tie-break) and reads the un-consumed
    * `pending` as the forward candidate (first right with `rts > lts`,
    * smallest tie-break — an equal-ts right was consumed into `cand`,
    * where it wins the distance tie anyway); the closer of the two
    * wins, equal distance preferring backward (pandas). */
  def advance(lKey: UnsafeRow, lTs: UnsafeRow): InternalRow = {
    // Backward/nearest carry the candidate across left rows of one key
    // group — invalidate it on key change. Forward recomputes the match
    // from `pending` for every left row.
    if (forward) { cand = null }
    else if (cand != null && keyOrd.compare(candKey, lKey) != 0) {
      cand = null; candKey = null
    }
    var advancing = true
    while (advancing && pending != null) {
      val c = keyOrd.compare(rKeyProj(pending), lKey)
      if (c < 0) {
        pending = nextOrNull()
      } else if (!forward && c == 0 &&
          tsOrd.compare(rTsProj(pending), lTs) <= 0) {
        cand = pending
        candKey = rKeyProj(pending).copy()
        pending = nextOrNull()
      } else if (forward && c == 0 &&
          tsOrd.compare(rTsProj(pending), lTs) < 0) {
        pending = nextOrNull()
      } else {
        advancing = false
      }
    }
    if (forward) {
      // NOT(rts < lts) is only ">= lts" when lts is non-null — a null
      // left ts must match nothing (SQL comparison semantics)
      cand = if (!lTs.isNullAt(0) && pending != null &&
          keyOrd.compare(rKeyProj(pending), lKey) == 0)
        pending else null
    }
    if (nearest) pickNearest(lKey, lTs) else cand
  }

  /** Closer of backward `cand` / forward `pending`; ties → backward.
    * Magnitudes are extracted before each subsequent projection call —
    * the single-field rows share one reused buffer per projection. */
  private def pickNearest(lKey: UnsafeRow, lTs: UnsafeRow): InternalRow = {
    if (lTs.isNullAt(0)) return null // no distance to a null instant
    val fCand =
      if (pending != null && keyOrd.compare(rKeyProj(pending), lKey) == 0) pending
      else null
    if (cand == null) fCand
    else if (fCand == null) cand
    else if (mag.fractional) {
      val l = mag.dbl(lTs)
      val b = mag.dbl(rTsProj(cand))
      val f = mag.dbl(rTsProj(fCand))
      if (mag.backwardWinsD(l, b, f)) cand else fCand
    } else {
      val l = mag.long(lTs)
      val b = mag.long(rTsProj(cand))
      val f = mag.long(rTsProj(fCand))
      if (mag.backwardWinsL(l, b, f)) cand else fCand
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
    direction: AsOfDir,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode with CodegenSupport {

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
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"),
    "indexBuilds" -> SQLMetrics.createMetric(sparkContext,
      "as-of index builds (group+sort over the broadcast)"),
    "indexContentReuses" -> SQLMetrics.createMetric(sparkContext,
      "as-of index content reuses (re-broadcast, same dim bytes)"))

  /** The shared lookup (broadcast + per-JVM index + binary search) used
    * by BOTH execution paths — interpreted `doExecute` and the generated
    * `doConsume` code — so codegen on/off cannot diverge semantically.
    * Cache size is read from the session conf at plan time
    * ([[BroadcastAsOfJoinExec.CacheSizeConfKey]], default 4) and the
    * build/reuse outcomes flow back through the exec's SQL metrics. */
  private def makeLookup(): AsOfBroadcastLookup =
    new AsOfBroadcastLookup(
      right.executeBroadcast[Array[InternalRow]](),
      right.output, rightKeys, rightTs +: rightTieBreak,
      leftTs.dataType, rightTieBreak.map(_.dataType), direction,
      conf.getConfString(BroadcastAsOfJoinExec.CacheSizeConfKey, "4").toInt,
      longMetric("indexBuilds"), longMetric("indexContentReuses"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val lTsExpr = leftTs
    val outAttrs = output
    val lookup = makeLookup()
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      lIter.map { lRow =>
        val cand = lookup.find(lKeyProj(lRow), lTsProj(lRow))
        numOutputRows += 1
        if (cand != null) numMatched += 1
        outProj(joined(lRow, if (cand != null) cand else nullRight))
      }
    }
  }

  // ---- whole-stage codegen (the BroadcastHashJoin streamed-side
  // pattern): the fact side stays inside one WholeStageCodegen span —
  // scan → as-of probe → downstream project/agg — with the index lookup
  // as the only virtual call per row. Without this the exec is a span
  // break: the scan's generated loop drains into an iterator, and every
  // downstream operator pays row-at-a-time InputAdapter overhead.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  // One output row per input row, emitted inline — copy semantics are
  // whatever the streamed side requires (exactly BHJ's unique-key case).
  override def needCopyResult: Boolean =
    left.asInstanceOf[CodegenSupport].needCopyResult

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    // Driver-side: trigger the broadcast and ship the lookup into the
    // generated class through the references array (BHJ's
    // prepareBroadcast does the same with its HashedRelation).
    val lookupRef = ctx.addReferenceObj(
      "asofLookup", makeLookup(), classOf[AsOfBroadcastLookup].getName)
    // Left key and ts as UnsafeRows, built from the streamed side's
    // column variables (no row materialization).
    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(ctx,
      BindReferences.bindReferences(leftKeys, AttributeSeq(left.output)))
    val tsEv = GenerateUnsafeProjection.createCode(ctx,
      Seq(BindReferences.bindReference(leftTs, AttributeSeq(left.output))))
    val matched = ctx.freshName("asofMatched")
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val numMatchedM = metricTerm(ctx, "numMatched")
    // Right-side payload columns read out of the matched row with the
    // null-fill guard inline (BHJ's genOneSideJoinVars outer shape: the
    // declared-nullable BoundReference handles null FIELDS, the
    // `$matched != null` wrapper handles the no-match row).
    ctx.currentVars = null
    ctx.INPUT_ROW = matched
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val ev = BoundReference(i, a.dataType, nullable = true).genCode(ctx)
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val javaType = CodeGenerator.javaType(a.dataType)
      val code =
        code"""
           |boolean $isNull = true;
           |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
           |if ($matched != null) {
           |  ${ev.code}
           |  $isNull = ${ev.isNull};
           |  $value = ${ev.value};
           |}
         """.stripMargin
      ExprCode(code, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
    s"""
       |${keyEv.code}
       |${tsEv.code}
       |InternalRow $matched = $lookupRef.find(${keyEv.value}, ${tsEv.value});
       |$numOutputRows.add(1);
       |if ($matched != null) $numMatchedM.add(1);
       |${consume(ctx, input ++ rightVars)}
     """.stripMargin
  }
}

/** The broadcast as-of's executor-side engine, shared by the interpreted
  * and generated paths: builds (once per JVM, via
  * [[BroadcastAsOfJoinExec.indexFor]]) the key → (ts, tieBreak)-sorted
  * row-array index over the broadcast rows, and resolves each left
  * (key, ts) by hash lookup + binary search — rightmost `ts <= leftTs`
  * backward, leftmost `ts >= leftTs` forward. Serializable so
  * `ctx.addReferenceObj` can ship it inside the generated class's
  * references; all executor-only machinery (projections, orderings,
  * the index) is transient-lazy. */
final class AsOfBroadcastLookup(
    bcast: Broadcast[Array[InternalRow]],
    rOut: Seq[Attribute],
    rKeyExprs: Seq[Expression],
    rOrderExprs: Seq[Expression], // rightTs +: tieBreaks — sort and search share the row
    tsType: DataType,
    tieTypes: Seq[DataType],
    direction: AsOfDir,
    cacheSize: Int,
    buildsMetric: org.apache.spark.sql.execution.metric.SQLMetric,
    reusesMetric: org.apache.spark.sql.execution.metric.SQLMetric) extends Serializable {

  // eager: an unsupported nearest ts domain fails at plan time
  private val mag: TsMagnitude =
    if (direction == AsOfDir.Nearest) new TsMagnitude(tsType) else null

  @transient private lazy val tsOrd =
    RowOrdering.createNaturalAscendingOrdering(Seq(tsType))

  // key → rows sorted by (ts, tieBreak). Built ONCE PER EXECUTOR JVM and
  // shared across partitions and threads (keyed by broadcast id, like
  // Spark builds one HashedRelation per broadcast) — without the cache
  // every partition would redo the group+sort of the whole dim.
  // Cache key carries the projection signature, not just the broadcast
  // id: ReuseExchange can hand the SAME broadcast to two as-of joins
  // with different key/order expressions (e.g. different tie-breaks over
  // one dim), and an id-only key would serve the first join's index to
  // the second.
  @transient private lazy val index: BroadcastAsOfJoinExec.AsOfIndex = {
    val (idx, outcome) = BroadcastAsOfJoinExec.indexFor(
      s"${bcast.id}:${rKeyExprs.mkString(",")}|${rOrderExprs.mkString(",")}",
      bcast.value, cacheSize, (rows: Array[InternalRow]) => {
      // The build happens ONCE per JVM under the cache lock while every
      // other partition's task waits on it — at a dim just under the
      // broadcast threshold (millions of rows) a naive per-key
      // buffer+sort build costs seconds of single-threaded time per
      // executor. Shape it for the idle cores instead: one serial
      // projection pass (projections are single-threaded mutable state),
      // then ONE global parallelSort by (key, ts, tie) on the common
      // pool (the generated orderings are stateless — thread-safe), then
      // a linear walk slicing contiguous key runs into the per-key
      // arrays the binary search expects.
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val rOrderProj = UnsafeProjection.create(rOrderExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(rKeyExprs.map(_.dataType))
      val sortOrd = RowOrdering.createNaturalAscendingOrdering(tsType +: tieTypes)
      val ents = new Array[BroadcastAsOfJoinExec.Ent](rows.length)
      var i = 0
      while (i < rows.length) {
        ents(i) = new BroadcastAsOfJoinExec.Ent(
          rKeyProj(rows(i)).copy(), rOrderProj(rows(i)).copy(), rows(i))
        i += 1
      }
      if (ents.length > 1) java.util.Arrays.parallelSort(ents,
        new java.util.Comparator[BroadcastAsOfJoinExec.Ent] {
          override def compare(a: BroadcastAsOfJoinExec.Ent,
                               b: BroadcastAsOfJoinExec.Ent): Int = {
            val c = keyOrd.compare(a.key, b.key)
            if (c != 0) c else sortOrd.compare(a.ord, b.ord)
          }
        })
      val built = new java.util.HashMap[UnsafeRow, Array[(UnsafeRow, InternalRow)]]()
      var start = 0
      while (start < ents.length) {
        var end = start + 1
        while (end < ents.length && keyOrd.compare(ents(end).key, ents(start).key) == 0) end += 1
        val run = new Array[(UnsafeRow, InternalRow)](end - start)
        var j = start
        while (j < end) { run(j - start) = (ents(j).ord, ents(j).row); j += 1 }
        built.put(ents(start).key, run)
        start = end
      }
      built
    })
    // surface the outcome as SQL metrics on the exec (the JVM-global
    // AtomicLongs above stay the spec-facing receipts): thrash — an
    // undersized cache rebuilding per trigger — shows up in the UI as a
    // growing `indexBuilds` instead of silent wall-clock.
    outcome match {
      case BroadcastAsOfJoinExec.BuiltNow => buildsMetric.add(1)
      case BroadcastAsOfJoinExec.ReusedByContent => reusesMetric.add(1)
      case _ => ()
    }
    idx
  }

  /** Rightmost index with `ts <= lTs`, or −1. A null lTs returns −1:
    * every comparison fails under null-first natural ordering. */
  private def backIdx(rows: Array[(UnsafeRow, InternalRow)], lTs: UnsafeRow): Int = {
    var res = -1
    var lo = 0
    var hi = rows.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (tsOrd.compare(rows(mid)._1, lTs) <= 0) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    res
  }

  /** Leftmost index with `ts >= lTs`, or −1. Callers guard null lTs —
    * null-first ordering would otherwise "match" the whole array. */
  private def fwdIdx(rows: Array[(UnsafeRow, InternalRow)], lTs: UnsafeRow): Int = {
    var res = -1
    var lo = 0
    var hi = rows.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (tsOrd.compare(rows(mid)._1, lTs) >= 0) { res = mid; hi = mid - 1 }
      else lo = mid + 1
    }
    res
  }

  /** The matched right row for (key, lTs), or null. Backward: rightmost
    * `ts <= lTs` (greatest tie-break via the (ts, tie) sort); forward:
    * leftmost `ts >= lTs` (smallest tie-break); nearest: the closer of
    * the two, equal distance preferring backward (pandas). A null left
    * ts matches nothing in any direction. */
  def find(key: UnsafeRow, lTs: UnsafeRow): InternalRow = {
    val rows = index.get(key)
    if (rows == null) return null
    direction match {
      case AsOfDir.Backward =>
        val i = backIdx(rows, lTs)
        if (i < 0) null else rows(i)._2
      case AsOfDir.Forward =>
        if (lTs.isNullAt(0)) return null
        val i = fwdIdx(rows, lTs)
        if (i < 0) null else rows(i)._2
      case AsOfDir.Nearest =>
        if (lTs.isNullAt(0)) return null
        val bi = backIdx(rows, lTs)
        val fi = fwdIdx(rows, lTs)
        if (bi < 0 && fi < 0) null
        else if (fi < 0) rows(bi)._2
        else if (bi < 0) rows(fi)._2
        else if (mag.fractional) {
          val l = mag.dbl(lTs)
          if (mag.backwardWinsD(l, mag.dbl(rows(bi)._1), mag.dbl(rows(fi)._1)))
            rows(bi)._2 else rows(fi)._2
        } else {
          val l = mag.long(lTs)
          if (mag.backwardWinsL(l, mag.long(rows(bi)._1), mag.long(rows(fi)._1)))
            rows(bi)._2 else rows(fi)._2
        }
    }
  }
}

object BroadcastAsOfJoinExec {
  type AsOfIndex = java.util.HashMap[UnsafeRow, Array[(UnsafeRow, InternalRow)]]

  /** One broadcast row's (copied key, copied order row, payload) — a
    * flat final class so the build's global parallelSort moves one
    * pointer per row instead of tuple cells. */
  private[plans] final class Ent(
      val key: UnsafeRow, val ord: UnsafeRow, val row: InternalRow)

  /** A built index plus the EXACT rows array it was built over — the
    * content identity the cross-broadcast reuse check compares. */
  private[plans] final class Built(
      val rows: Array[InternalRow], val index: AsOfIndex)

  /** Receipts, executor-JVM-global: how many times the group+sort build
    * actually ran vs. how many times an index was served by CONTENT
    * reuse across distinct broadcasts (the stream-static per-micro-batch
    * re-broadcast case). StreamingSpec reads the deltas to pin that N
    * triggers over an unchanged static dim build once. */
  val indexBuilds = new java.util.concurrent.atomic.AtomicLong()
  val indexContentReuses = new java.util.concurrent.atomic.AtomicLong()

  /** Per-[[indexFor]] outcomes, reported back so the calling exec can
    * surface builds/reuses as SQL metrics in the UI/plan receipts. */
  private[plans] final val HitById = 0
  private[plans] final val BuiltNow = 1
  private[plans] final val ReusedByContent = 2

  /** Conf key sizing the per-JVM index cache (round 12 — previously a
    * hardcoded 4): raise it when >4 distinct as-of broadcasts are live
    * concurrently, or thrash shows up in the `indexBuilds` metric.
    * Eviction costs a rebuild, never correctness.
    *
    * Scope note: the conf is session-named but the cache is JVM-global
    * (indexes are shared across queries on purpose), so concurrent
    * sessions with different values meet one bound. The update is
    * MONOTONIC — the cache grows to the largest requested size and a
    * smaller concurrent setting never shrinks a peer's working set;
    * shrinking takes a JVM restart (an executor-lifetime knob, like
    * Spark's own memory fractions). */
  val CacheSizeConfKey = "spark.graft.asof.broadcastIndexCacheSize"

  @volatile private var maxEntries: Int = 4
  private[plans] def currentMaxEntries: Int = maxEntries

  // (broadcast.id + projection signature) → built index; a small LRU
  // bounded per executor (size from CacheSizeConfKey, captured at plan
  // time and applied on first use). The index is read-only after
  // construction, so sharing across partitions and queries is safe;
  // eviction only costs a rebuild, never correctness. The signature part
  // matters because ReuseExchange can hand one broadcast to two as-of
  // execs with different key/order expressions.
  private val cache = new java.util.LinkedHashMap[String, Built](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Built]): Boolean =
      size() > maxEntries
  }

  /** Bytewise content equality (UnsafeRow.equals is a memcmp); rows the
    * rare non-Unsafe representation could smuggle in compare by
    * REFERENCE — false negatives cost a rebuild, never correctness. */
  private def sameContent(a: Array[InternalRow], b: Array[InternalRow]): Boolean = {
    if (a eq b) return true
    if (a.length != b.length) return false
    var i = 0
    while (i < a.length) {
      val same = (a(i), b(i)) match {
        case (x: UnsafeRow, y: UnsafeRow) => x.equals(y)
        case (x, y) => x eq y
      }
      if (!same) return false
      i += 1
    }
    true
  }

  /** Build-once-per-JVM: the first partition to arrive builds (holding
    * the lock, so concurrent partitions block instead of duplicating the
    * group+sort), the rest just read.
    *
    * On an id miss, entries with the SAME projection signature are
    * checked for CONTENT equality before building: Spark re-plans a
    * stream-static join every micro-batch and re-broadcasts the
    * unchanged static side under a fresh broadcast id, which an id-only
    * cache would treat as 4-per-LRU distinct indexes rebuilt every
    * trigger. The O(n) memcmp is orders cheaper than the O(n log n)
    * sort + per-row copies it saves; a content hit aliases the new id
    * to the existing index (exact reuse — no hashing, no false
    * positives). */
  private[plans] def indexFor(id: String, rows: Array[InternalRow],
                              cacheSize: Int,
                              build: Array[InternalRow] => AsOfIndex): (AsOfIndex, Int) =
    cache.synchronized {
      // monotonic max — see CacheSizeConfKey's scope note
      if (cacheSize > maxEntries) maxEntries = cacheSize
      var outcome = HitById
      var v = cache.get(id)
      if (v == null) {
        val sig = id.substring(id.indexOf(':') + 1)
        val it = cache.entrySet().iterator()
        while (v == null && it.hasNext) {
          val e = it.next()
          if (e.getKey.substring(e.getKey.indexOf(':') + 1) == sig &&
              sameContent(e.getValue.rows, rows)) {
            indexContentReuses.incrementAndGet()
            outcome = ReusedByContent
            v = e.getValue
          }
        }
        if (v == null) {
          indexBuilds.incrementAndGet()
          outcome = BuiltNow
          v = new Built(rows, build(rows))
        }
        cache.put(id, v)
      }
      (v.index, outcome)
    }
}
