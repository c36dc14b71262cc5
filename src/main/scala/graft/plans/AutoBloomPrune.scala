package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BloomFilterMightContain, EqualTo, Expression, IsNotNull, Literal, PredicateHelper, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** `Rule[LogicalPlan]`: automatic bloom-filter semi-join pruning — the
  * q77 rewrite applied BY THE OPTIMIZER to plain inner equi-joins, the
  * engine's §7.4(c) extension tier (a custom rule, not just custom
  * expressions).
  *
  * Where Spark's own `InjectRuntimeFilter` gates on creation-side size
  * thresholds tuned for clusters (10 MB creation side, shuffle joins
  * only), this rule fires wherever an inner join's build side carries a
  * selective `Filter` and declares itself smaller than the probe side —
  * the situation where a 100 TB fact scan would otherwise be shuffled
  * only to be discarded by the join. The injected shape is exactly the
  * one Spark uses: the build side wrapped in a one-row
  * `BloomFilterAggregate` under a `ScalarSubquery`, probed by
  * `might_contain(xxhash64(key))` in a `Filter` over the probe side.
  * The join itself is untouched, so false positives die there and
  * results are bit-identical with the rule on or off — the rule changes
  * WORK, never RESULTS (PlanSpec pins both).
  *
  * Safety and sizing (hardened in round 10):
  *  - Equi-pairs are read from TOP-LEVEL CONJUNCTS only
  *    (`splitConjunctivePredicates`, like `InjectRuntimeFilter`). An
  *    `EqualTo` nested under `Or`/`Not` is NOT a key constraint — a
  *    condition like `(l.a = r.b) OR (l.c = r.d)` admits rows through
  *    either disjunct, so pruning on one would silently drop results.
  *  - ALL conjunct equi-pairs feed ONE combined-key bloom (round 11):
  *    a two-key join probes `might_contain(xxhash64(k1, k2))`, pruning
  *    to rows matching both keys — strictly tighter than any single
  *    key, matching the multi-fact two-key star shape.
  *  - `selective` ignores `Filter`s that are only `IsNotNull` conjuncts:
  *    `InferFiltersFromConstraints` puts those on every inner equi-join
  *    side, so "any Filter" would make the gate vacuous and build
  *    useless blooms over unfiltered dims.
  *  - Orientation is symmetric: whichever side is selective and smaller
  *    becomes the build side; the other side gets the probe. If both
  *    qualify, the smaller side builds.
  *  - The bloom is sized from the build side's logical stats (rowCount
  *    under CBO, else `sizeInBytes / row-width`) instead of the default
  *    `expectedNumItems`: a ≫1M-key build side would silently saturate
  *    a default-sized filter — still correct, but the prune rate decays
  *    with no signal. `numBits` is the textbook optimum for ~3% fpp,
  *    clamped to Spark's runtime-filter ceiling.
  *
  * Fires only when `spark.graft.autoBloomPrune=true`: the rule is
  * registered globally (GraftExtensions + the runtime
  * `experimental.extraOptimizations` path), and the conf gate keeps
  * every other query's plan byte-identical — q79 runs on a cloned
  * session with the flag set, the caller's session never sees it
  * (the StreamingOracle gate-session pattern).
  *
  * Idempotent under the optimizer's fixed-point batch: a probe side
  * already carrying a `might_contain` filter ON THE SAME KEY is
  * ineligible; probes on different keys compose, so a fact joining two
  * selective dims carries both prunes on its scan.
  */
object AutoBloomPrune extends Rule[LogicalPlan] with PredicateHelper {

  val Flag = "spark.graft.autoBloomPrune"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(Flag, "false").toBoolean) return plan
    plan.transformUp {
      // LEFT SEMI (the EXISTS/IN shape) is the textbook semi-join
      // reduction: output is left rows only, so only the right side can
      // build and only the left can probe. LEFT ANTI must NEVER fire —
      // the bloom admits rows that MIGHT match, i.e. it would prune
      // exactly the non-matching rows an anti join exists to KEEP
      // (PlanSpec pins the negative).
      case j @ Join(left, right, LeftSemi, Some(cond), _) =>
        val candidates = Seq(
          (right, left, (f: Expression) => j.copy(left = Filter(f, left))))
          .filter { case (build, probe, _) =>
            selective(build) && smaller(build, probe)
          }
        injectFirst(candidates, cond).getOrElse(j)
      case j @ Join(left, right, Inner, Some(cond), _) =>
        // Candidate orientations: (build, probe, inject). Smaller build
        // side wins when both qualify.
        val candidates = Seq(
          (right, left, (f: Expression) => j.copy(left = Filter(f, left))),
          (left, right, (f: Expression) => j.copy(right = Filter(f, right))))
          .filter { case (build, probe, _) =>
            selective(build) && smaller(build, probe)
          }
          .sortBy { case (build, _, _) => build.stats.sizeInBytes }
        injectFirst(candidates, cond).getOrElse(j)
    }
  }

  /** Inject the probe for the first qualifying (build, probe)
    * orientation. ALL equi pairs feed one combined-key bloom: a two-key
    * join probes xxhash64(k1, k2), which prunes to rows matching BOTH
    * keys — strictly tighter than any single key. Sound because a probe
    * row matching the join has exactly the build row's key tuple, so
    * its combined hash is in the bloom; false positives (including
    * null-key hash collisions — XxHash64 skips null children) still die
    * at the join itself. */
  private def injectFirst(
      candidates: Seq[(LogicalPlan, LogicalPlan, Expression => LogicalPlan)],
      cond: Expression): Option[LogicalPlan] =
    candidates.iterator.flatMap { case (build, probe, inject) =>
      val pairs = equiKeys(cond, probe, build)
      if (pairs.isEmpty || alreadyPruned(probe, pairs.map(_._1))) None
      else {
        val bloomAgg = Aggregate(Nil, Seq(
          Alias(sizedBloom(pairs.map(_._2), build).toAggregateExpression(),
            "graft_bloom")()), build)
        Some(inject(BloomFilterMightContain(
          ScalarSubquery(bloomAgg), new XxHash64(pairs.map(_._1)))))
      }
    }.nextOption()

  /** Bloom sized from the build side's logical stats — `rowCount` when
    * CBO provides one, else bytes over the declared row width. Without
    * CBO a `Filter`'s sizeInBytes equals its child's, so this
    * OVER-estimates a filtered build side — the safe direction for a
    * bloom (more bits, same prune rate) and the same signal
    * `InjectRuntimeFilter` reads. */
  private def sizedBloom(keys: Seq[Expression], build: LogicalPlan): BloomFilterAggregate = {
    val st = build.stats
    val rowWidth = math.max(1L, build.output.map(_.dataType.defaultSize.toLong).sum)
    val estimated = st.rowCount.map(_.toLong)
      .getOrElse(st.sizeInBytes.toLong / rowWidth)
    val items = math.min(math.max(estimated, 4096L), MaxNumItems)
    // optimal bits for fpp≈3%: n * ln(0.03) / -ln(2)^2 ≈ n * 7.3
    val bits = math.min(math.max(items * 8L, 1L << 16), MaxNumBits)
    new BloomFilterAggregate(new XxHash64(keys),
      Literal(items), Literal(bits))
  }

  // Spark's own runtime-filter ceilings (spark.sql.optimizer.runtime.
  // bloomFilter.{maxNumItems,maxNumBits} defaults) — beyond these the
  // filter stops being "a ~MB broadcast to every scan task".
  private val MaxNumItems = 4000000L
  private val MaxNumBits = 67108864L

  /** Idempotence/composition guard, PER KEY SET: a probe side already
    * carrying a `might_contain` on THIS key tuple is ineligible (the
    * fixed-point batch must not stack duplicate probes), but a probe on
    * a DIFFERENT key set does not block — a fact joining two selective
    * dims gets both prunes on its scan (the semi-join-reduction shape a
    * multi-dim star query wants at 100 TB). The tuple is derived from
    * conjunct order, which is stable across fixed-point iterations, so
    * ordered comparison is exact. */
  private def alreadyPruned(p: LogicalPlan, probeKeys: Seq[Expression]): Boolean = p.exists {
    case f: Filter => f.condition.exists {
      case BloomFilterMightContain(_, x: XxHash64) =>
        x.children.length == probeKeys.length &&
          x.children.zip(probeKeys).forall { case (a, b) => a.semanticEquals(b) }
      case _ => false
    }
    case _ => false
  }

  /** The build side must carry a real predicate — an unfiltered dim
    * would bloom-admit every key and prune nothing. `IsNotNull`-only
    * filters don't count: `InferFiltersFromConstraints` has already
    * stamped those on both sides of every inner equi-join, so they
    * carry no selectivity signal. */
  private def selective(p: LogicalPlan): Boolean = p.exists {
    case f: Filter =>
      splitConjunctivePredicates(f.condition).exists {
        case _: IsNotNull => false
        case _ => true
      }
    case _ => false
  }

  /** Build side declares itself smaller than the probe side (logical
    * stats — the same signal the join strategies read). */
  private def smaller(build: LogicalPlan, probe: LogicalPlan): Boolean =
    build.stats.sizeInBytes <= probe.stats.sizeInBytes

  /** ALL attribute-to-attribute equi-pairs among the condition's
    * TOP-LEVEL conjuncts, each oriented (probeKey, buildKey). Nested
    * `EqualTo`s (under Or/Not) are not key constraints and must not
    * prune — rows may join through the other disjunct. */
  private def equiKeys(cond: Expression, probe: LogicalPlan,
                       build: LogicalPlan): Seq[(Expression, Expression)] =
    splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
    }.collect {
      case (a, b) if probe.outputSet.contains(a) && build.outputSet.contains(b) => (a, b)
      case (a, b) if probe.outputSet.contains(b) && build.outputSet.contains(a) => (b, a)
    }
}
