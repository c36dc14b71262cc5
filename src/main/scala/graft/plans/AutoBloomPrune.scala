package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BloomFilterMightContain, EqualTo, Expression, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.plans.Inner
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
  * Fires only when `spark.graft.autoBloomPrune=true`: the rule is
  * registered globally (GraftExtensions + the runtime
  * `experimental.extraOptimizations` path), and the conf gate keeps
  * every other query's plan byte-identical — q79 runs on a cloned
  * session with the flag set, the caller's session never sees it
  * (the StreamingOracle gate-session pattern).
  *
  * Idempotent under the optimizer's fixed-point batch: a probe side
  * already carrying a `might_contain` filter is ineligible.
  */
object AutoBloomPrune extends Rule[LogicalPlan] {

  val Flag = "spark.graft.autoBloomPrune"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(Flag, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !alreadyPruned(left) && selective(right) && smaller(right, left) =>
        equiKeys(cond, left, right) match {
          case Some((lKey, rKey)) =>
            val bloomAgg = Aggregate(Nil, Seq(
              Alias(new BloomFilterAggregate(new XxHash64(Seq(rKey)))
                .toAggregateExpression(), "graft_bloom")()), right)
            val probe = BloomFilterMightContain(
              ScalarSubquery(bloomAgg), new XxHash64(Seq(lKey)))
            j.copy(left = Filter(probe, left))
          case None => j
        }
    }
  }

  private def alreadyPruned(p: LogicalPlan): Boolean = p.exists {
    case f: Filter => f.condition.exists(_.isInstanceOf[BloomFilterMightContain])
    case _ => false
  }

  /** The build side must carry a real predicate — an unfiltered dim
    * would bloom-admit every key and prune nothing. */
  private def selective(p: LogicalPlan): Boolean = p.exists {
    case _: Filter => true
    case _ => false
  }

  /** Build side declares itself smaller than the probe side (logical
    * stats — the same signal the join strategies read). */
  private def smaller(build: LogicalPlan, probe: LogicalPlan): Boolean =
    build.stats.sizeInBytes <= probe.stats.sizeInBytes

  /** First plain attribute-to-attribute equi-pair of the condition,
    * oriented (probeKey, buildKey). */
  private def equiKeys(cond: Expression, left: LogicalPlan,
                       right: LogicalPlan): Option[(Expression, Expression)] = {
    val pairs = cond.collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
    }
    pairs.collectFirst {
      case (a, b) if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
      case (a, b) if left.outputSet.contains(b) && right.outputSet.contains(a) => (b, a)
    }
  }
}
