package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.RangeJoin
import graft.operators.RangeJoin.PileClass

/** ScalaCheck invariants of the priced pile classifier (r15). PURE
  * properties — no Spark jobs — so they run at a real trial count (the
  * Spark-backed PropertySpec caps at 10 cases because each case runs
  * cluster jobs; 10 uniform draws over this 4-dimensional space would
  * barely touch the priced both-overflow region, ~1% of draws — the
  * r15 review caught a falsifiable property surviving exactly that
  * under-sampling). */
object ClassifierPropertySpec extends Properties("classifyPile") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500)

  private val genBudget = Gen.choose(1L, 1000000000L)
  private val genPile = Gen.choose(0L, 4000000000L)
  private val genFree = Gen.oneOf(true, false)

  property("dims bounded, premium non-negative, free SplitB ships nothing") =
    Prop.forAll(genPile, genPile, genBudget, genFree) { (a, b, budget, free) =>
      val d = RangeJoin.classifyPile(a, b, budget, free)
      d.slicesA >= 1 && d.slicesA <= RangeJoin.MaxDerivedSlices &&
        d.slicesB >= 1 && d.slicesB <= RangeJoin.MaxDerivedSlices &&
        d.premiumBytes >= 0L &&
        (!(free && d.cls == PileClass.SplitB) || d.premiumBytes == 0L)
    }

  property("Demote only inside the engage threshold or the priced cap") =
    Prop.forAll(genPile, genPile, genBudget, genFree) { (a, b, budget, free) =>
      val d = RangeJoin.classifyPile(a, b, budget, free)
      d.cls != PileClass.Demote ||
        a + b <= budget ||
        (a > budget && b > budget &&
          a + b <= RangeJoin.BothOverflowCapFactor.toLong * budget)
    }

  property("a one-sided overflow always splits the overflowing side") =
    Prop.forAll(genPile, genBudget, genFree) { (a, budget, free) =>
      val big = budget + 1 + a % budget // strictly over budget
      val small = a % (budget + 1)      // at or under budget
      RangeJoin.classifyPile(big, small, budget, free).cls == PileClass.SplitA &&
        RangeJoin.classifyPile(small, big, budget, free).cls == PileClass.SplitB
    }

  // Monotonic no-re-demote holds ONLY for the free variant: its SplitB
  // ships no replicas, so in the both-overflow pricing it strictly
  // dominates Demote (premium tie at 0, smaller per-task pile). For
  // REPLICATING routers the priced both-overflow region demotes BY
  // DESIGN (plain's zero premium wins inside the 4× cap — the 56M
  // lesson), so growing a one-sided-split pile INTO that region
  // legitimately re-demotes; that demote is bounded by the property
  // above. The r15 review falsified the unrestricted claim with
  // classifyPile(173879092, 1112038970, 548977049): SplitB, then
  // Demote after growing a by 521760890.
  property("growing a pile never re-demotes an engaged FREE-split decision") =
    Prop.forAll(genPile, genPile, genBudget, Gen.choose(1L, 1000000000L)) {
      (a, b, budget, delta) =>
        val before = RangeJoin.classifyPile(a, b, budget, splitBFree = true)
        before.cls == PileClass.Demote ||
          RangeJoin.classifyPile(a + delta, b, budget,
            splitBFree = true).cls != PileClass.Demote
    }

  property("mirror symmetry for the replicating routers (a != b)") =
    Prop.forAll(genPile, genPile, genBudget) { (a0, b0, budget) =>
      val (a, b) = if (a0 == b0) (a0, b0 + 1) else (a0, b0)
      val d = RangeJoin.classifyPile(a, b, budget)
      val m = RangeJoin.classifyPile(b, a, budget)
      val mirrored = (d.cls, m.cls) match {
        case (PileClass.SplitA, PileClass.SplitB) => true
        case (PileClass.SplitB, PileClass.SplitA) => true
        case (x, y) => x == y
      }
      mirrored && d.premiumBytes == m.premiumBytes &&
        d.slicesA == m.slicesB && d.slicesB == m.slicesA
    }

  property("both-overflow respects the per-task cap whenever ANY candidate can") =
    Prop.forAll(genPile, genPile, genBudget, genFree) { (a0, b0, budget, free) =>
      // force both-overflow
      val a = budget + 1 + a0 % (3 * budget)
      val b = budget + 1 + b0 % (3 * budget)
      val d = RangeJoin.classifyPile(a, b, budget, free)
      val cap = RangeJoin.BothOverflowCapFactor.toLong * budget
      def perTask(dec: RangeJoin.PileDecision): Long = dec.cls match {
        case PileClass.Demote => a + b
        case PileClass.SplitA => a / dec.slicesA + b
        case PileClass.SplitB => a + b / dec.slicesB
        case PileClass.Grid => a / dec.slicesA + b / dec.slicesB
      }
      // the grid at derived dims is the reference "any candidate"
      val sA = math.min(RangeJoin.MaxDerivedSlices.toLong,
        math.max(2L, (a + budget - 1) / budget)).toInt
      val sB = math.min(RangeJoin.MaxDerivedSlices.toLong,
        math.max(2L, (b + budget - 1) / budget)).toInt
      val gridPerTask = a / sA + b / sB
      gridPerTask > cap || perTask(d) <= cap
    }
}
