package graft.plans

import graft.{SparkSuite, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The native as-of join (AsOfJoinNode → AsOfJoinStrategy →
  * AsOfJoinExec) — semantics pinned against the union-window
  * composition row-for-row, plan shape pinned structurally. */
class AsOfJoinPlanSpec extends SparkSuite {

  private val sf = sfDir("0.001")

  /** Final (post-AQE) plan rendered as text — AQE wraps finished stages
    * in leaf QueryStage nodes, so tree traversal stops there, but the
    * string rendering shows the whole stage subtree. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("native as-of == union-window composition, row for row (events × orders)") {
    val ev = Tables.events(spark, sf)
    val od = Tables.orders(spark, sf)
    val comp = AsOfJoin.asofEnrich(ev, od).orderBy("event_id").collect()
    val nat = AsOfJoin.asofEnrich(ev, od, native = Some(Some(false)))
      .orderBy("event_id").collect()
    val bc = AsOfJoin.asofEnrich(ev, od, native = Some(Some(true)))
      .orderBy("event_id").collect()
    assert(nat.length === comp.length && bc.length === comp.length)
    nat.zip(comp).foreach { case (n, c) => assert(n === c) }
    bc.zip(comp).foreach { case (b, c) => assert(b === c) }
    // the fixture must actually exercise matches (null payloads are
    // covered by the unit tests below; at sf0.001 every event matches)
    assert(comp.exists(r => !r.isNullAt(2)))
  }

  test("the physical plan contains AsOfJoinExec and sorts both sides (key, ts)") {
    val df = AsOfJoin.asofEnrich(
      Tables.events(spark, sf), Tables.orders(spark, sf), native = Some(Some(false)))
    val p = finalPlan(df)
    assert("AsOfJoin \\[".r.findAllIn(p).length === 1,
      s"expected one AsOfJoinExec in:\n$p")
    assert(p.contains("Sort ["), s"expected sorts feeding the merge in:\n$p")
  }

  test("broadcast as-of: zero exchanges and zero sorts on the fact side") {
    val df = AsOfJoin.asofEnrich(
      Tables.events(spark, sf), Tables.orders(spark, sf), native = Some(Some(true)))
    val p = finalPlan(df)
    assert(p.contains("BroadcastAsOfJoin"), s"expected BroadcastAsOfJoinExec in:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"fact side must not shuffle under broadcast as-of:\n$p")
    assert(!p.contains("Sort ["), s"fact side must not sort under broadcast as-of:\n$p")
    assert(p.contains("BroadcastExchange"), s"dim side must broadcast:\n$p")
  }

  test("strategy auto-selects: broadcast under the threshold, shuffle-merge above it") {
    // cloned session so the threshold flip never touches the shared one
    val s2 = graft.SessionClones.cloned("asof-no-bcast", spark) { s =>
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") }
    val auto = AsOfJoin.asofEnrich(
      Tables.events(spark, sf), Tables.orders(spark, sf), native = Some(None))
    assert(finalPlan(auto).contains("BroadcastAsOfJoin"),
      "dim-sized right side must pick the broadcast exec")
    val forced = AsOfJoin.asofEnrich(
      Tables.events(s2, sf), Tables.orders(s2, sf), native = Some(None))
    val p2 = finalPlan(forced)
    assert(p2.contains("AsOfJoin [") && !p2.contains("BroadcastAsOfJoin"),
      s"threshold -1 must fall back to the shuffle-merge exec:\n$p2")
  }

  test("downstream groupBy(key) after the native as-of adds no extra shuffle") {
    // outputPartitioning re-exposes the left side's hash clustering, so
    // the rollup's aggregation on the same key must NOT re-exchange:
    // exactly the two child-feeding exchanges appear, none above the exec.
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val agg = AsOfJoin.asofJoinNative(ev, od, "user_id", "ts", Seq("okey"))
      .groupBy("user_id").agg(count(lit(1)).as("n"), max("asof_okey").as("mx"))
    val p = finalPlan(agg)
    // only the two child-feeding exchanges may appear — none above the exec
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 2, s"groupBy(key) reshuffled after as-of ($shuffles exchanges):\n$p")
    assert(p.contains("AsOfJoin ["), s"expected AsOfJoinExec in:\n$p")
  }

  test("broadcast as-of passes an upstream hash partitioning through to a downstream groupBy") {
    // outputPartitioning is the left child's verbatim: one explicit
    // repartition(user_id) upstream is the ONLY exchange in
    // repartition → broadcast-as-of → groupBy(user_id).
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
      .repartition(8, col("user_id"))
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val agg = AsOfJoin.asofJoinNative(ev, od, "user_id", "ts", Seq("okey"),
        tieBreak = Some("okey"), broadcast = Some(true))
      .groupBy("user_id").agg(count(lit(1)).as("n"), max("asof_okey").as("mx"))
    val p = finalPlan(agg)
    assert(p.contains("BroadcastAsOfJoin"), s"expected the broadcast exec in:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"only the explicit upstream repartition may exchange:\n$p")
  }

  test("broadcast as-of fuses into the whole-stage codegen span (scan → probe → agg)") {
    // CodegenSupport on BroadcastAsOfJoinExec: the fact side's generated
    // loop carries the probe inline — the node renders with codegen's
    // `*(id)` star instead of breaking the span behind an InputAdapter.
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val agg = AsOfJoin.asofJoinNative(ev, od, "user_id", "ts", Seq("okey"),
        tieBreak = Some("okey"), broadcast = Some(true))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val p = finalPlan(agg)
    assert("\\*\\(\\d+\\) BroadcastAsOfJoin".r.findFirstIn(p).isDefined,
      s"BroadcastAsOfJoin must carry a WholeStageCodegen star:\n$p")
  }

  test("merge as-of drives its own whole-stage codegen span (SMJ two-iterator pattern)") {
    // AsOfJoinExec's doProduce loops the sorted left iterator in
    // generated code and probes the per-partition merge cursor — the
    // span covers merge → project → aggregate in ONE generated class.
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val agg = AsOfJoin.asofJoinNative(ev, od, "user_id", "ts", Seq("okey"),
        tieBreak = Some("okey"), broadcast = Some(false))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val p = finalPlan(agg)
    val star = "\\*\\((\\d+)\\) AsOfJoin \\[".r.findFirstMatchIn(p)
    assert(star.isDefined, s"AsOfJoin must carry a WholeStageCodegen star:\n$p")
    // the downstream aggregate shares the SAME generated class
    val stage = star.get.group(1)
    assert(p.contains(s"*($stage) HashAggregate"),
      s"downstream aggregate must fuse into stage $stage:\n$p")
  }

  for ((label, mode) <- Seq("shuffle-merge" -> false, "broadcast" -> true)) {
    test(s"[$label] codegen on/off parity, with fallback disabled so generation must succeed") {
      // fallback=false: a Janino compile error in our generated code
      // throws instead of silently degrading to the interpreted path —
      // this test proves the code GENERATES, not merely that plans match.
      val gen = graft.SessionClones.cloned("asof-codegen-strict", spark) { s =>
        s.conf.set("spark.sql.codegen.fallback", "false") }
      val off = graft.SessionClones.cloned("asof-no-codegen", spark) { s =>
        s.conf.set("spark.sql.codegen.wholeStage", "false") }
      def run(s: org.apache.spark.sql.SparkSession) =
        AsOfJoin.asofEnrich(Tables.events(s, sf), Tables.orders(s, sf),
          native = Some(Some(mode))).orderBy("event_id").collect()
      val g = run(gen)
      val i = run(off)
      assert(g.length === i.length && g.nonEmpty)
      g.zip(i).foreach { case (a, b) => assert(a === b) }
    }
  }

  for ((label, mode) <- Seq("shuffle-merge" -> false, "broadcast" -> true)) {
    test(s"[$label] nearest direction: closer side wins, distance tie prefers backward, null ts matches nothing") {
      import spark.implicits._
      val left = Seq((Some(1L), Some(10L), "fw"), (Some(2L), Some(9L), "bw"),
        (Some(3L), Some(10L), "tie"), (Some(1L), None, "nt")).toDF("k", "t", "tag")
      val right = Seq(
        (1L, 7L, 100L), (1L, 12L, 200L),   // k=1: dist 3 back vs 2 fwd → fwd
        (2L, 7L, 300L), (2L, 12L, 400L),   // k=2 at t=9: 2 back vs 3 fwd → back
        (3L, 8L, 500L), (3L, 12L, 600L))   // k=3 at t=10: 2 vs 2 → backward
        .toDF("k", "t", "pay")
      val out = graft.operators.AsOfJoin.asofJoinNearest(
          left, right, "k", "t", Seq("pay"), broadcast = Some(mode))
        .orderBy("tag").collect()
      val byTag = out.map(r => r.getString(2) -> r).toMap
      assert(byTag("fw").getLong(3) === 200L)
      assert(byTag("bw").getLong(3) === 300L)
      assert(byTag("tie").getLong(3) === 500L) // tie → at-or-before
      assert(byTag("nt").isNullAt(3))
    }
  }

  for ((label, mode) <- Seq("shuffle-merge" -> false, "broadcast" -> true)) {
    test(s"[$label] tolerance: within-bound keeps (boundary inclusive), beyond-bound nulls, no fallback") {
      import spark.implicits._
      val left = Seq((1L, 100L, "near"), (2L, 100L, "far"), (3L, 100L, "edge"))
        .toDF("k", "t", "tag")
      val right = Seq(
        (1L, 10L, 111L), (1L, 95L, 222L), // near: dist 5 <= 10 → 222
        (2L, 80L, 333L),                  // far: dist 20 > 10 → null (no fallback to nothing else)
        (3L, 90L, 444L))                  // edge: dist == 10 → kept
        .toDF("k", "t", "pay")
      val out = graft.operators.AsOfJoin.asofJoinTolerance(
          left, right, "k", "t", Seq("pay"), tolerance = 10L,
          broadcast = Some(mode))
        .orderBy("tag").collect()
      val byTag = out.map(r => r.getString(2) -> r).toMap
      assert(byTag("near").getLong(3) === 222L)
      assert(byTag("far").isNullAt(3))
      assert(byTag("edge").getLong(3) === 444L)
      // forward: right at t=105 (dist 5) vs tolerance 4 → null
      val fwd = graft.operators.AsOfJoin.asofJoinTolerance(
          left.filter(col("tag") === "near"), Seq((1L, 105L, 555L)).toDF("k", "t", "pay"),
          "k", "t", Seq("pay"), tolerance = 4L, broadcast = Some(mode),
          direction = "forward").collect()
      assert(fwd.length === 1 && fwd(0).isNullAt(3))
      // nearest: |dist| bound — back at 93 (7) vs fwd at 104 (4) picks
      // fwd within tol 5; tol 3 nulls (the MINIMUM distance exceeds it,
      // so no candidate on either side can be inside the bound)
      val nearRight = Seq((1L, 93L, 666L), (1L, 104L, 777L)).toDF("k", "t", "pay")
      val nr5 = graft.operators.AsOfJoin.asofJoinTolerance(
          left.filter(col("tag") === "near"), nearRight,
          "k", "t", Seq("pay"), tolerance = 5L, broadcast = Some(mode),
          direction = "nearest").collect()
      assert(nr5.length === 1 && nr5(0).getLong(3) === 777L)
      val nr3 = graft.operators.AsOfJoin.asofJoinTolerance(
          left.filter(col("tag") === "near"), nearRight,
          "k", "t", Seq("pay"), tolerance = 3L, broadcast = Some(mode),
          direction = "nearest").collect()
      assert(nr3.length === 1 && nr3(0).isNullAt(3))
    }
  }

  test("salted as-of == unsalted, row for row, on the hot-key fixture; composite key in the plan") {
    // AQE's skew-join splitting rewrites only Spark's own SMJ/SHJ, so a
    // hot as-of key must salt upstream — and salting must be invisible
    // to results: the right side replicates onto every salt, so a left
    // at salt s still sees all of its key's rights.
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(
        when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_id").as("pid"))
    val salted = AsOfJoin.asofJoinSalted(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    val plain = AsOfJoin.asofJoinNative(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(salted.length === plain.length && salted.nonEmpty)
    salted.zip(plain).foreach { case (a, b) => assert(a === b) }
    // plan: ONE native exec keyed on the composite (user_id, salt)
    val df = AsOfJoin.asofJoinSalted(ev, right, "user_id", "ts", Seq("pid"),
      tieBreak = Some("pid"))
    val p = finalPlan(df)
    assert("AsOfJoin \\[".r.findAllIn(p).length === 1, s"one salted exec:\n$p")
    assert(p.contains("__asof_salt"), s"composite key must carry the salt:\n$p")
    // and the hot key genuinely spreads: its lefts land on >1 salt
    val spread = ev.filter(col("user_id") === 1234567L)
      .withColumn("__s", pmod(xxhash64(ev.columns.map(col): _*), lit(8)))
      .select("__s").distinct().count()
    assert(spread >= 6, s"hot key must spread across salts, got $spread of 8")
  }

  test("broadcast-index cache honors its size conf and reports builds/reuses as SQL metrics") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val s = graft.SessionClones.cloned("asof-cache-conf", spark) { c =>
      c.conf.set(BroadcastAsOfJoinExec.CacheSizeConfKey, "7")
    }
    // fresh, content-unique dim (the nanoTime payload can match no prior
    // cached index) → this run must record exactly one BUILD on the exec
    val salt = System.nanoTime()
    val left = s.createDataFrame(Seq((1L, 10L), (2L, 20L))).toDF("k", "t")
    val right = s.createDataFrame(Seq((1L, 5L, salt), (2L, 15L, salt + 1)))
      .toDF("k", "t", "pay")
    val df = graft.operators.AsOfJoin.asofJoinNative(
      left, right, "k", "t", Seq("pay"), broadcast = Some(true))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // QueryStageExec nodes are leaves to TreeNode.collect — descend into
    // their materialized plans explicitly
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: deep(q.plan)
      case _ => p +: p.children.flatMap(deep)
    }
    val execs = deep(plan).collect { case b: BroadcastAsOfJoinExec => b }
    assert(execs.nonEmpty, s"expected BroadcastAsOfJoinExec in:\n$plan")
    val m = execs.head.metrics
    assert(m.contains("indexBuilds") && m.contains("indexContentReuses"),
      "the exec must expose the cache receipts as SQL metrics")
    assert(m("indexBuilds").value === 1L,
      s"a content-unique dim must build exactly once, got ${m("indexBuilds").value}")
    assert(BroadcastAsOfJoinExec.currentMaxEntries === 7,
      s"cache size conf must be honored, got ${BroadcastAsOfJoinExec.currentMaxEntries}")
  }

  test("q101 auto as-of: salt APPLIED on the hot-key fixture, ABSENT on uniform keys, rows invariant") {
    // hot-key fixture (q98's shape): half the users remapped to one key
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(
        when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_id").as("pid"))
    // minFullRows = 0 disables the tiny cutoff and taskAbsorbBytes = 0
    // the absolute-volume demotion, so these ladder pins run on the
    // small fixture; the per-call ...AutoStats receipt replaces the
    // lastAutoAsOf read — race-free under concurrent auto joins
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(ev, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L)
    val auto = autoDf.select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(dec.salted, s"auto must salt the hot-key fixture ($dec)")
    assert(dec.hotKeyShare >= 0.4, s"measured share must reflect the hot key ($dec)")
    assert(dec.hotKeys === Seq(1234567L),
      s"exactly the hot key must be flagged for salting ($dec)")
    // half the fact is hot → past the cutover → ONE globally salted
    // merge, not the partial two-exec split
    assert(dec.mode === "global", s"a half-hot fact salts globally ($dec)")
    val hand = AsOfJoin.asofJoinSalted(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(auto.length === hand.length && auto.nonEmpty)
    auto.zip(hand).foreach { case (a, b) => assert(a === b) }

    // uniform keys (the raw fixture): the stats pass must keep the
    // plain native path — no salt exec, no right-side replication
    val evU = Tables.events(spark, sf).select("event_id", "event_type", "user_id", "ts")
    val rightU = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val (autoU, decU) = AsOfJoin.asofJoinAutoStats(evU, rightU, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L)
    assert(!decU.salted, s"auto must not salt uniform keys ($decU)")
    assert(decU.mode === "plain", s"uniform keys must read as plain, not tiny ($decU)")
    assert(!finalPlan(autoU).contains("__asof_salt"),
      "the uniform plan must carry no salt machinery")
    val plainU = AsOfJoin.asofJoinNative(evU, rightU, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    val autoURows = autoU
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(autoURows.length === plainU.length && autoURows.nonEmpty)
    autoURows.zip(plainU).foreach { case (a, b) => assert(a === b) }
  }

  test("a LEFT-only-hot key picks PARTIAL salting: only that key's (small) right side replicates") {
    // a quarter of the FACT on one key while the right keeps its
    // natural spread: above the 0.2 threshold on the left, invisible
    // on the right → the per-key salted split (the orientation where
    // hashing the left is exactly right and the replicated right side
    // is small by construction)
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 4 === 0, lit(7777777L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(ev, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L)
    val auto = autoDf.select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(dec.mode === "partial", s"a left-only-hot key must salt partially ($dec)")
    assert(dec.hotKeys === Seq(7777777L), s"exactly the hot key flagged ($dec)")
    assert(dec.slicedKeys.isEmpty && dec.griddedKeys.isEmpty,
      s"a left-only pile needs no slicing ($dec)")
    val plain = AsOfJoin.asofJoinNative(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("a key hot on BOTH sides picks the 2-D (salt × slice) GRID") {
    // a quarter of BOTH sides on one key: the left pile wants a hash
    // split (point-mass-proof), the right pile wants a time split —
    // the grid composes both at the salt's existing replication budget
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 4 === 0, lit(7777777L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(
        when(col("user_id") % 4 === 0, lit(7777777L)).otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(ev, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L)
    assert(dec.mode === "grid", s"a both-hot key must take the grid ($dec)")
    assert(dec.griddedKeys === Seq(7777777L), s"the both-hot key routes to the grid ($dec)")
    assert(dec.slicedKeys.isEmpty, s"nothing is right-ONLY-hot here ($dec)")
    val p = finalPlan(autoDf)
    assert(p.contains("__slice") && p.contains("__asof_salt"),
      "the grid plan must join on (key, salt, slice)")
    val auto = autoDf.select("event_id", "asof_pid").orderBy("event_id").collect()
    val plain = AsOfJoin.asofJoinNative(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("a RIGHT-heavy key engages the ladder: the left histogram alone could never see it") {
    // the round-12 verdict's blind spot: millions of quotes for one
    // symbol against UNIFORM trades — the left keys stay uniform, so a
    // left-only histogram keeps the plain merge and that key's right
    // pile lands on one partition. The fixture concentrates the RIGHT
    // side (every purchase row remapped to one key) while the left keys
    // keep their natural spread.
    // 5% of left rows carry the heavy key — matches exist, but the left
    // share stays far under the hot threshold
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("event_id") % 20 === 0, lit(4242424L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(lit(4242424L).as("user_id"), col("ts"), col("event_id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(ev, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L)
    assert(dec.mode === "rslice",
      s"a right-only-hot key must take the TIME-SLICED split — salting it would " +
        s"replicate the dominant pile for zero straggler relief ($dec)")
    assert(dec.hotKeys === Seq(4242424L), s"the right-hot key must be flagged ($dec)")
    assert(dec.slicedKeys === Seq(4242424L),
      s"the right-only-hot key must be the one routed to slicing ($dec)")
    assert(dec.rightHotShare >= 0.9, s"the receipt must carry the right side's share ($dec)")
    assert(dec.hotKeyShare < 0.2, s"the left side must read uniform ($dec)")
    // the sliced plan carries slice machinery, never the salt's
    // replicate-the-right explode
    assert(finalPlan(autoDf).contains("__slice"),
      "the rslice plan must join on the composite (key, slice)")
    assert(!finalPlan(autoDf).contains("__asof_salt"),
      "the rslice plan must not salt")
    // routing is row-identical to the plain merge
    val auto = autoDf.select("event_id", "asof_pid").orderBy("event_id").collect()
    val plain = AsOfJoin.asofJoinNative(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    assert(auto.exists(!_.isNullAt(1)), "the heavy key's lefts must actually match")
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("MIXED routing: a both-hot key grids while a right-only-hot key slices, in ONE plan") {
    // key A: a quarter of the LEFT remapped AND those users' purchases
    // with it (both-hot → grid); key B: the remaining purchases
    // remapped onto it against only a thin left slice (right-only-hot
    // → time-sliced); the rest keep their natural keys (cold).
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 4 === 0, lit(7777777L))
        .when(col("event_id") % 20 === 0, lit(4242424L))
        .otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(
        when(col("user_id") % 4 === 0, lit(7777777L)).otherwise(lit(4242424L)).as("user_id"),
        col("ts"), col("event_id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(ev, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L)
    assert(dec.mode === "mixed", s"both branch kinds must engage ($dec)")
    assert(dec.hotKeys.toSet === Set(7777777L, 4242424L), s"both keys flagged ($dec)")
    assert(dec.slicedKeys === Seq(4242424L),
      s"only the right-only-hot key slices ($dec)")
    assert(dec.griddedKeys === Seq(7777777L),
      s"the both-hot key takes the grid ($dec)")
    val auto = autoDf.select("event_id", "asof_pid").orderBy("event_id").collect()
    val plain = AsOfJoin.asofJoinNative(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("time-sliced as-of ≡ plain, all three directions, under duplicate-timestamp pile-ups") {
    import spark.implicits._
    // one heavy key whose rights pile onto FEW distinct timestamps (so
    // approximate quantile boundaries coincide and slices go EMPTY),
    // plus a sparse key, plus null-key/null-ts rows on both sides —
    // every carry edge case at once. 400 rights over 5 distinct ts.
    val right = ((0 until 400).map { i =>
      (Some(1L), Some((i % 5) * 10L + 3L), i.toLong, s"r$i")
    } ++ Seq((Some(2L), Some(17L), 9001L, "sparse"),
             (None: Option[Long], Some(5L), 9002L, "nullkey"),
             (Some(1L), None: Option[Long], 9003L, "nullts")))
      .toDF("k", "t", "pid", "tag")
    val left = ((0 until 60).map(i => (Some(1L), Some(i.toLong))) ++
      Seq((Some(2L), Some(20L)), (Some(2L), Some(10L)),
          (None: Option[Long], Some(25L)), (Some(1L), None: Option[Long])))
      .zipWithIndex.map { case ((k, t), id) => (id.toLong, k, t) }
      .toDF("lid", "k", "t")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val sliced = AsOfJoin.asofJoinTimeSliced(left, right, "k", "t",
          Seq("pid"), tieBreak = Some("pid"), slices = 8, direction = dir)
        .select("lid", "asof_pid").orderBy("lid").collect()
      val plain = AsOfJoin.asofJoinNative(left, right, "k", "t",
          Seq("pid"), tieBreak = Some("pid"), broadcast = Some(false), direction = dir)
        .select("lid", "asof_pid").orderBy("lid").collect()
      assert(sliced.length === plain.length && sliced.nonEmpty, s"[$dir]")
      assert(sliced.exists(!_.isNullAt(1)), s"[$dir] matches must exist")
      assert(sliced.exists(_.isNullAt(1)), s"[$dir] null payloads must exist")
      sliced.zip(plain).foreach { case (a, b) => assert(a === b, s"[$dir] $a vs $b") }
    }
  }

  test("time-sliced as-of over a non-arithmetic ts domain degenerates to slice 0 — correct, just unsplit") {
    // a string ts has no magnitude: every boundary percentile comes
    // back null, the scaladoc's promise is that each key lands whole
    // in slice 0 and the join is simply the plain composite merge
    // (ordering-only directions still work over strings)
    import spark.implicits._
    val left = Seq((1L, 1L, "b"), (2L, 1L, "d"), (3L, 2L, "a"), (4L, 9L, "z"))
      .toDF("lid", "k", "t")
    val right = Seq((1L, "a", 10L), (1L, "c", 11L), (2L, "b", 20L))
      .toDF("k", "t", "pay")
    for (dirn <- Seq("backward", "forward")) {
      val sliced = AsOfJoin.asofJoinTimeSliced(left, right, "k", "t",
          Seq("pay"), tieBreak = Some("pay"), slices = 4, direction = dirn)
        .select("lid", "asof_pay").orderBy("lid").collect()
      val plain = AsOfJoin.asofJoinNative(left, right, "k", "t",
          Seq("pay"), tieBreak = Some("pay"), broadcast = Some(false), direction = dirn)
        .select("lid", "asof_pay").orderBy("lid").collect()
      assert(sliced.toSeq === plain.toSeq, s"[$dirn]")
      assert(sliced.exists(!_.isNullAt(1)) && sliced.exists(_.isNullAt(1)), s"[$dirn]")
    }
  }

  test("time-sliced as-of over NUMERIC-CONTENT string ts still degenerates to slice 0 (r13 ADVICE)") {
    // The trap: '7' < '88' numerically but '88' < '9' lexicographically.
    // A cast-to-long magnitude would hand numeric-content strings
    // numeric slices, so the exec's lexicographic backward match ('88'
    // for a left at '9') lands in a LATER numeric slice and its carry
    // never reaches the left row — a silent wrong answer. The contract
    // is: ANY non-datetime, non-numeric domain → null magnitude →
    // slice 0 → plain (unsplit) merge.
    import spark.implicits._
    val left = Seq((1L, 1L, "9"), (2L, 1L, "7"), (3L, 1L, "100"))
      .toDF("lid", "k", "t")
    val right = Seq((1L, "7", 70L), (1L, "88", 88L))
      .toDF("k", "t", "pay")
    for (dirn <- Seq("backward", "forward")) {
      val sliced = AsOfJoin.asofJoinTimeSliced(left, right, "k", "t",
          Seq("pay"), tieBreak = Some("pay"), slices = 4, direction = dirn)
        .select("lid", "asof_pay").orderBy("lid").collect()
      val plain = AsOfJoin.asofJoinNative(left, right, "k", "t",
          Seq("pay"), tieBreak = Some("pay"), broadcast = Some(false), direction = dirn)
        .select("lid", "asof_pay").orderBy("lid").collect()
      assert(sliced.toSeq === plain.toSeq, s"[$dirn]")
    }
    // pin the lexicographic backward semantics the slices must preserve:
    // left '9' ≥ both rights ('7' < '88' < '9' lexicographically) and
    // the LATEST is '88' — exactly the row a numeric slicing strands in
    // a later slice; left '100' precedes every right → null payload.
    val bw = AsOfJoin.asofJoinTimeSliced(left, right, "k", "t",
        Seq("pay"), tieBreak = Some("pay"), slices = 4)
      .select("lid", "asof_pay").orderBy("lid").collect()
    assert(bw(0).getLong(1) === 88L, s"left '9' must match right '88': ${bw.toSeq}")
    assert(bw(1).getLong(1) === 70L, s"left '7' must match right '7': ${bw.toSeq}")
    assert(bw(2).isNullAt(1), s"left '100' precedes every right lexicographically: ${bw.toSeq}")
  }

  test("time-sliced as-of over a FRACTIONAL ts domain degenerates to slice 0 (r14 review)") {
    // The per-row trap the integral-only magnitude closes: a double ts
    // past Long.MaxValue (or NaN) would null its OWN magnitude and
    // strand that row in slice 0 while the key's other rows carry real
    // boundaries — and backward carries only flow into LATER slices,
    // so the stranded row silently loses its true match. Fractional
    // domains therefore get NO magnitude at all: every row slice 0,
    // one unsplit merge per key, rows ≡ plain.
    import spark.implicits._
    val left = Seq((1L, 1L, 5.0), (2L, 1L, 1.0e19), (3L, 1L, Double.NaN),
      (4L, 2L, 2.5)).toDF("lid", "k", "t")
    val right = Seq((1L, 1.0, 10L), (1L, 4.5, 45L), (1L, 9.0e18, 90L),
      (2L, 2.5, 25L)).toDF("k", "t", "pay")
    for (dirn <- Seq("backward", "forward")) {
      val sliced = AsOfJoin.asofJoinTimeSliced(left, right, "k", "t",
          Seq("pay"), tieBreak = Some("pay"), slices = 4, direction = dirn)
        .select("lid", "asof_pay").orderBy("lid").collect()
      val plain = AsOfJoin.asofJoinNative(left, right, "k", "t",
          Seq("pay"), tieBreak = Some("pay"), broadcast = Some(false), direction = dirn)
        .select("lid", "asof_pay").orderBy("lid").collect()
      assert(sliced.toSeq === plain.toSeq, s"[$dirn]")
    }
    // pin the exact backward rows: 1e19 exceeds every right (matches
    // the 9e18 row); NaN orders AFTER +Infinity in Spark, so it too
    // matches the latest right; 5.0 matches 4.5
    val bw = AsOfJoin.asofJoinTimeSliced(left, right, "k", "t",
        Seq("pay"), tieBreak = Some("pay"), slices = 4)
      .select("lid", "asof_pay").orderBy("lid").collect()
    assert(bw(0).getLong(1) === 45L, s"5.0 must match 4.5: ${bw.toSeq}")
    assert(bw(1).getLong(1) === 90L, s"1e19 must match 9e18: ${bw.toSeq}")
    assert(bw(2).getLong(1) === 90L, s"NaN sorts last, matches 9e18: ${bw.toSeq}")
    assert(bw(3).getLong(1) === 25L, s"exact-ts match on key 2: ${bw.toSeq}")
  }

  test("time-sliced as-of over an INTEGRAL numeric ts splits for real and matches plain (r14)") {
    // long ts must still get true magnitudes (the whole point of the
    // sliced branch) — boundaries real, rows ≡ plain across slices
    import spark.implicits._
    val left = spark.range(2000).select(col("id").as("lid"), lit(7L).as("k"),
      (col("id") * 13L % 50000L).as("t"))
    val right = spark.range(5000).select(lit(7L).as("k"),
      (col("id") * 11L % 50000L).as("t"), col("id").as("pay"))
    val sliced = AsOfJoin.asofJoinTimeSliced(left, right, "k", "t",
        Seq("pay"), tieBreak = Some("pay"), slices = 4)
      .select("lid", "asof_pay").orderBy("lid").collect()
    val plain = AsOfJoin.asofJoinNative(left, right, "k", "t",
        Seq("pay"), tieBreak = Some("pay"), broadcast = Some(false))
      .select("lid", "asof_pay").orderBy("lid").collect()
    assert(sliced.length === plain.length && sliced.nonEmpty)
    sliced.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("tiny cutoff reads BOTH sides: a sub-cutoff fact against a huge right-hot pile still routes (r13 ADVICE)") {
    // left alone (~2k rows) is far under TinyFullRows, but the right
    // carries 60k rows with one key owning half — the million-quotes-
    // one-symbol shape. A left-only cutoff would skip the ladder and
    // hand the hot key's whole right pile to one merge partition; the
    // two-sided cutoff proceeds to the histograms, which route the key
    // to the time-sliced branch.
    import spark.implicits._
    val left = spark.range(2000).select(
      col("id").as("lid"), (col("id") % 500).as("k"),
      (col("id") * 1000L).as("t"))
    val right = spark.range(60000).select(
      when(col("id") % 2 === 0, lit(77L)).otherwise(col("id") % 500).as("k"),
      (col("id") * 37L % 2000000L).as("t"), col("id").as("pay"))
    // (a) default budget: the cutoff must NOT read "tiny" (the two-sided
    // fix), and the ~1.4 MB hot pile must then DEMOTE — the router saw
    // the key with open eyes and measured that one task absorbs it
    val (_, decDef) = AsOfJoin.asofJoinAutoStats(
      left, right, "k", "t", Seq("pay"), tieBreak = Some("pay"))
    assert(decDef.mode !== "tiny", s"a huge right side must defeat the tiny cutoff ($decDef)")
    assert(decDef.mode === "plain" && decDef.demotedKeys.contains(77L),
      s"at this absolute scale the hot key must demote, receipted ($decDef)")
    // (b) budget disabled: the share-routed split engages — the shape
    // that matters when the pile is GBs, pinned here for rows
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(
      left, right, "k", "t", Seq("pay"), tieBreak = Some("pay"),
      taskAbsorbBytes = 0L)
    assert(dec.mode !== "tiny", s"a huge right side must defeat the tiny cutoff ($dec)")
    assert(dec.slicedKeys.contains(77L) || dec.griddedKeys.contains(77L),
      s"the right-hot key must route to a right-splitting branch ($dec)")
    val auto = autoDf.select("lid", "asof_pay").orderBy("lid").collect()
    val plain = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
        tieBreak = Some("pay"), broadcast = Some(false))
      .select("lid", "asof_pay").orderBy("lid").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("tiny cutoff: a sub-cutoff fact side skips the as-of stats ladder entirely") {
    // DEFAULT params on the maximally hot-keyed fixture: the sf0.001
    // fact is ~1k rows — far under TinyFullRows — so the engine's own
    // decision must be the plain native path (mode "tiny"; at this size
    // the merge cannot straggle), and the rows must still hold
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(
        when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(ev, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"))
    assert(dec.mode === "tiny", s"a sub-cutoff fact must skip the ladder ($dec)")
    assert(!dec.salted && dec.hotKeys.isEmpty, s"tiny mode carries no salt state ($dec)")
    assert(!finalPlan(autoDf).contains("__asof_salt"),
      "tiny mode must plan no salt machinery")
    val auto = autoDf.select("event_id", "asof_pid").orderBy("event_id").collect()
    val plain = AsOfJoin.asofJoinNative(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("absolute-volume gate: an absorbable both-hot key DEMOTES to plain through the global fall-through, receipted") {
    // the q98 hot-key fixture with the ladder forced on but the DEFAULT
    // task budget active: the key owns ~half of BOTH sides (share says
    // global/grid), yet the whole fixture is kilobytes. The left-global
    // short-circuit must NOT fire (no left pile exceeds the budget),
    // the right histogram must run, and the per-key classification must
    // demote — plain plan, no salt machinery, receipt says why.
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val right = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(
        when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(ev, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L)
    assert(dec.mode === "plain", s"an absorbable pile must not salt ($dec)")
    assert(dec.demotedKeys === Seq(1234567L), s"the demotion must be receipted ($dec)")
    assert(dec.hotKeys === Seq(1234567L), s"the share flag must still be visible ($dec)")
    assert(!finalPlan(autoDf).contains("__asof_salt") &&
      !finalPlan(autoDf).contains("__slice"),
      "a demoted plan must carry no salt or slice machinery")
    val auto = autoDf.select("event_id", "asof_pid").orderBy("event_id").collect()
    val plain = AsOfJoin.asofJoinNative(ev, right, "user_id", "ts", Seq("pid"),
        tieBreak = Some("pid"))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("absolute-volume gate: an ambiguous both-hot pile splits the BIGGER side (r14)") {
    // each side's pile alone fits the task budget; together they
    // overflow it. The split must shrink the BIGGER pile: the premium
    // of either orientation is the OTHER side (the salt replicates the
    // right pile ×buckets, the slice's carry scans the right pile
    // once) — on the 24M both-hot rung the right pile alone nearly
    // fills the budget, so salting it ×16 would out-cost the grid the
    // gate exists to avoid. Byte arithmetic is exact here: widths are
    // 32 B/row on both sides, the sampled pass falls back to the full
    // frame (fixture < MinStatsRows at 10%).
    def sides(lHot: Int, lCold: Int, rHot: Int, rCold: Int) = {
      val left = spark.range(lHot + lCold).select(
        col("id").as("lid"),
        when(col("id") < lHot, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
        (col("id") * 1000L).as("t"))
      val right = spark.range(rHot + rCold).select(
        when(col("id") < rHot, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
        (col("id") * 37L % 2000000L).as("t"), col("id").as("pay"))
      (left, right)
    }
    def check(lHot: Int, lCold: Int, rHot: Int, rCold: Int): AsOfJoin.AutoAsOfStats = {
      val (left, right) = sides(lHot, lCold, rHot, rCold)
      val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(left, right, "k", "t",
        Seq("pay"), tieBreak = Some("pay"), minFullRows = 0L,
        taskAbsorbBytes = 100000L)
      val auto = autoDf.select("lid", "asof_pay").orderBy("lid").collect()
      val plain = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
          tieBreak = Some("pay"), broadcast = Some(false))
        .select("lid", "asof_pay").orderBy("lid").collect()
      assert(auto.length === plain.length && auto.nonEmpty)
      auto.zip(plain).foreach { case (a, b) => assert(a === b) }
      dec
    }
    // right pile bigger (96 kB vs 32 kB, budget 100 kB): slice it
    val rBig = check(lHot = 1000, lCold = 2000, rHot = 3000, rCold = 5000)
    assert(rBig.mode === "rslice" && rBig.slicedKeys === Seq(77L),
      s"the bigger RIGHT pile must time-slice, not be replicated by a salt ($rBig)")
    // left pile bigger (96 kB vs 32 kB): salt it
    val lBig = check(lHot = 3000, lCold = 5000, rHot = 1000, rCold = 2000)
    assert(lBig.mode === "partial" && lBig.slicedKeys.isEmpty &&
      lBig.griddedKeys.isEmpty && lBig.hotKeys.contains(77L),
      s"the bigger LEFT pile must hash-salt ($lBig)")
  }

  test("MEASURED width: a fat string payload prices the pile for real — no demote at defaultSize's 20 B/string (r14)") {
    // right payload = a 400-char string per row: defaultSize prices the
    // shipped row at 44 B (hot pile 500 rows → 22 kB, absorbable under
    // the 100 kB budget → demote), the MEASURED width at ~432 B (pile
    // 216 kB → past the budget → the right pile must split). At 100 TB
    // this is the difference between slicing a terabyte document pile
    // and handing it whole to one task.
    val left = spark.range(2000).select(
      col("id").as("lid"),
      when(col("id") < 500, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 1000L).as("t"))
    val right = spark.range(2000).select(
      when(col("id") < 500, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 37L % 2000000L).as("t"), col("id").as("pid"),
      repeat(lit("x"), 400).as("pay"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(left, right, "k", "t",
      Seq("pid", "pay"), tieBreak = Some("pid"), minFullRows = 0L,
      taskAbsorbBytes = 100000L)
    assert(dec.mode === "rslice" && dec.slicedKeys === Seq(77L),
      s"the fat right pile must split — defaultSize pricing would demote it ($dec)")
    val auto = autoDf.select("lid", "asof_pid").orderBy("lid").collect()
    val plain = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pid", "pay"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("lid", "asof_pid").orderBy("lid").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("STREAMING fact: asofJoinAuto degrades to the broadcast-index form; streaming right fails fast (r14)") {
    // the q91 lesson on the as-of router: a streaming fact cannot
    // serve the definition-time histograms, and the broadcast form is
    // the plan a stream-static as-of wants anyway (q85's production
    // shape — the fact never shuffles, so there is no merge straggler
    // for a salt to fix). A streaming RIGHT has no stats-time
    // distribution at all → a clear error naming the alternative.
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_asof").toString
    val lhsStatic = ev.select(col("event_id"), col("user_id"), col("ts"))
    lhsStatic.write.mode("overwrite").parquet(dir)
    val lhsStream = spark.readStream.schema(lhsStatic.schema).parquet(dir)
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val (auto, dec) = AsOfJoin.asofJoinAutoStats(lhsStream, right, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"))
    assert(auto.isStreaming && dec.mode === "stream-broadcast", s"($dec)")
    val q = auto.writeStream.format("memory").queryName("ss_asof")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val got = spark.table("ss_asof").select("event_id", "asof_pid")
      .orderBy("event_id").collect()
    val want = AsOfJoin.asofJoinNative(lhsStatic, right, "user_id", "ts",
        Seq("pid"), tieBreak = Some("pid"), broadcast = Some(false))
      .select("event_id", "asof_pid").orderBy("event_id").collect()
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case (a, b) => assert(a === b) }
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoinAutoStats(lhsStatic, lhsStream.select(col("user_id"),
        col("ts"), col("event_id").as("pid")), "user_id", "ts", Seq("pid"))
    }
    assert(e.getMessage.contains("AsOfStream"),
      s"the error must name the stream-stream alternative: ${e.getMessage}")
  }

  test("concurrent auto as-ofs return independent per-call receipts (no clobber)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val evHot = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"),
      when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
      col("ts"))
    val rightHot = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(
        when(col("user_id") % 2 === 0, lit(1234567L)).otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_id").as("pid"))
    val evU = Tables.events(spark, sf).select("event_id", "event_type", "user_id", "ts")
    val rightU = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val fHot = Future(AsOfJoin.asofJoinAutoStats(evHot, rightHot, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L))
    val fUni = Future(AsOfJoin.asofJoinAutoStats(evU, rightU, "user_id", "ts",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L, taskAbsorbBytes = 0L))
    val (_, decHot) = Await.result(fHot, 120.seconds)
    val (_, decUni) = Await.result(fUni, 120.seconds)
    assert(decHot.mode === "global", s"the hot-key call's receipt must salt ($decHot)")
    assert(decUni.mode === "plain", s"the uniform call's receipt must not ($decUni)")
  }

  test("nearest over a non-arithmetic ts domain fails at plan time with an actionable message") {
    import spark.implicits._
    val left = Seq((1L, "b", "x")).toDF("k", "t", "tag")
    val right = Seq((1L, "a", 1L)).toDF("k", "t", "pay")
    val ex = intercept[Exception] {
      graft.operators.AsOfJoin.asofJoinNearest(left, right, "k", "t", Seq("pay"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.contains("nearest") && m.contains("backward/forward")),
      s"expected the TsMagnitude plan-time error, got: $ex")
    // and the ordering-only directions still accept string ts domains
    val bw = graft.operators.AsOfJoin.asofJoinNative(
      left, right, "k", "t", Seq("pay")).collect()
    assert(bw.length === 1 && bw(0).getLong(3) === 1L)
  }

  test("nearest (merge mode) is ONE exec and one shuffle per side — not the two-pass composition") {
    // Native since round 11: AsOfMergeState resolves nearest inside the
    // single ordered merge (the backward candidate + the un-consumed
    // cursor), so the plan carries exactly one AsOfJoin and pays the
    // directional pass's cost once.
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val df = graft.operators.AsOfJoin.asofJoinNearest(
      ev, od, "user_id", "ts", Seq("okey"), tieBreak = Some("okey"),
      broadcast = Some(false))
    val p = finalPlan(df)
    assert("AsOfJoin \\[".r.findAllIn(p).length === 1,
      s"nearest must plan a single native exec:\n$p")
    val exch = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exch <= 2, s"one shuffle per side at most ($exch exchanges):\n$p")
  }

  test("nearest == the backward/forward two-pass composition, row for row (events × orders)") {
    // the retired composition re-stated inline as the semantic oracle
    // for the native single-pass operator, over real fixture data
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val vcols = Seq("okey", "ts")
    val bw = AsOfJoin.asofJoinNative(ev, od, "user_id", "ts", vcols,
      tieBreak = Some("okey"), direction = "backward")
    val bwTagged = vcols.foldLeft(bw)((df, c) => df.withColumnRenamed(s"asof_$c", s"__bw_$c"))
    val both = AsOfJoin.asofJoinNative(bwTagged, od, "user_id", "ts", vcols,
      tieBreak = Some("okey"), direction = "forward")
    val lts = unix_micros(col("ts"))
    val bts = unix_micros(col("__bw_ts"))
    val fts = unix_micros(col("asof_ts"))
    val pickBw = col("asof_ts").isNull ||
      (col("__bw_ts").isNotNull && (lts - bts) <= (fts - lts))
    val composed = both.select(col("event_id"),
        when(pickBw, col("__bw_okey")).otherwise(col("asof_okey")).as("asof_okey"))
      .orderBy("event_id").collect()
    val native = AsOfJoin.asofJoinNearest(ev, od, "user_id", "ts", Seq("okey"),
        tieBreak = Some("okey"))
      .select("event_id", "asof_okey").orderBy("event_id").collect()
    assert(native.length === composed.length && native.nonEmpty)
    native.zip(composed).foreach { case (n, c) => assert(n === c) }
  }

  test("bucketed fact: merge-mode as-of elides the fact-side exchange") {
    // The 100 TB posture behind AsOfJoinExec's declarative requirements:
    // a fact already bucketed on the key satisfies ClusteredDistribution
    // straight off the scan, so the ONLY exchange in the whole plan is
    // the dim side shuffling to co-partition. (q62 proves the same for
    // the built-in SMJ; this pins it for the custom exec.)
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    graft.sources.Writers.writeBucketed(ev, "b_events_asof", "user_id", 8)
    val bev = spark.table("b_events_asof")
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val out = AsOfJoin.asofJoinNative(bev, od, "user_id", "ts", Seq("okey"),
      tieBreak = Some("okey"), broadcast = Some(false))
    val p = finalPlan(out)
    assert(p.contains("AsOfJoin ["), s"expected the merge exec in:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"only the dim side may shuffle over a bucketed fact:\n$p")
    assert(p.contains("Bucketed: true"), s"fact must read as bucketed:\n$p")
    // and the bucketed run returns exactly the composition's answer
    val expect = AsOfJoin.asofJoin(ev, od, "user_id", "ts", Seq("okey"),
      Some("okey")).orderBy("event_id").collect()
    assert(out.orderBy("event_id").collect().toSeq === expect.toSeq)
  }

  test("sorted-bucketed fact: merge as-of elides the fact-side exchange AND sort") {
    // One file per bucket + declared (user_id, ts) sort order → the scan
    // itself satisfies both of AsOfJoinExec's fact-side requirements.
    // This is the full pay-the-shuffle-once-at-write-time posture: the
    // fact is read in as-of-ready form, forever.
    // Spark only REPORTS bucket sort order when the legacy conf opts into
    // planning-time file listing (one-file-per-bucket proof); clone so the
    // shared session keeps default planning costs.
    val s2 = graft.SessionClones.cloned("asof-bucket-sort", spark) { s =>
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") }
    val ev = Tables.events(s2, sf).select("event_id", "user_id", "ts")
    graft.sources.Writers.writeBucketedSorted(
      ev, "b_events_asof_sorted", "user_id", 8, Seq("user_id", "ts"))
    val bev = s2.table("b_events_asof_sorted")
    val od = Tables.orders(s2, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"))
    val out = AsOfJoin.asofJoinNative(bev, od, "user_id", "ts", Seq("okey"),
      tieBreak = Some("okey"), broadcast = Some(false))
    val p = finalPlan(out)
    assert(p.contains("AsOfJoin ["), s"expected the merge exec in:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"only the dim side may shuffle over a bucketed fact:\n$p")
    assert("Sort \\[".r.findAllIn(p).length === 1,
      s"only the dim side may sort over a sorted-bucketed fact:\n$p")
    val expect = AsOfJoin.asofJoin(ev, od, "user_id", "ts", Seq("okey"),
      Some("okey")).orderBy("event_id").collect()
    assert(out.orderBy("event_id").collect().toSeq === expect.toSeq)
  }

  for ((mode, label) <- Seq(Some(false) -> "shuffle-merge", Some(true) -> "broadcast")) {

    test(s"[$label] tie-break: equal (key, ts) resolves to the greatest; exact-ts matches") {
      import spark.implicits._
      val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
        .toDF("k", "t", "tag")
      val right = Seq(
        (1L, 10L, 100L, 1.0), (1L, 10L, 200L, 2.0), // tie at t=10 → 200 wins
        (1L, 4L, 50L, 0.5),
        (2L, 8L, 300L, 3.0))                        // after left ts → no match
        .toDF("k", "t", "pay", "v")
      val out = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pay", "v"),
          tieBreak = Some("pay"), broadcast = mode)
        .orderBy("tag").collect()
      assert(out(0).getLong(3) === 200L) // (1,10,"a") matches the t=10 tie, greatest pay
      assert(out(1).getLong(3) === 50L)  // (1,5,"b") → t=4 row
      assert(out(2).isNullAt(3))         // (2,7,"c") → nothing at or before 7
    }

    test(s"[$label] null keys and null timestamps never match (both sides)") {
      import spark.implicits._
      val left = Seq((Some(1L), Some(10L), "m"), (None, Some(10L), "nk"),
        (Some(1L), None, "nt")).toDF("k", "t", "tag")
      val right = Seq((Some(1L), Some(5L), 7L), (None, Some(1L), 8L),
        (Some(1L), None, 9L)).toDF("k", "t", "pay")
      val out = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
          broadcast = mode)
        .orderBy("tag").collect()
      val byTag = out.map(r => r.getString(2) -> r).toMap
      assert(byTag("m").getLong(3) === 7L)  // normal match
      assert(byTag("nk").isNullAt(3))       // null left key → no match
      assert(byTag("nt").isNullAt(3))       // null left ts → no match
    }

    test(s"[$label] empty right side yields all-null payloads, not an error") {
      import spark.implicits._
      val left = Seq((1L, 10L)).toDF("k", "t")
      val right = Seq.empty[(Long, Long, Long)].toDF("k", "t", "pay")
      val out = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
        broadcast = mode).collect()
      assert(out.length === 1 && out(0).isNullAt(2))
    }
  }

  test("self as-of (same table both sides) resolves — the wrapper's aliases keep exprIds distinct") {
    // events as-of its own purchase history: for each event, the user's
    // most recent prior 'purchase' event. Same underlying relation on
    // both sides is the classic duplicate-exprId trap; the wrapper's
    // right-side projection aliases every column to fresh exprIds.
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    for (mode <- Seq(Some(false), Some(true))) {
      val nat = AsOfJoin.asofJoinNative(ev, purchases, "user_id", "ts",
        Seq("pid"), tieBreak = Some("pid"), broadcast = mode)
        .orderBy("event_id").collect()
      val comp = AsOfJoin.asofJoin(ev, purchases, "user_id", "ts",
        Seq("pid"), tieBreak = Some("pid"))
        .orderBy("event_id").collect()
      assert(nat.toSeq === comp.toSeq, s"self as-of mismatch for broadcast=$mode")
      assert(comp.exists(r => !r.isNullAt(3)) && comp.exists(r => r.isNullAt(3)),
        "fixture must exercise both matched and unmatched self as-of rows")
    }
  }

  test("as-of output stats stay additive, so a downstream small-dim join still broadcasts") {
    // The stats visitor's default for unknown binary nodes is the
    // join-like PRODUCT of child sizes; AsOfJoinNode overrides to the
    // additive bound (one output row per left row). Pinned two ways:
    // the node's own sizeInBytes, and the planned shape of a dim join
    // sitting ON TOP of the as-of output.
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val od = Tables.orders(spark, sf).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"), col("o_custkey").as("ocust"))
    val asof = AsOfJoin.asofJoinNative(ev, od, "user_id", "ts",
      Seq("okey", "ocust"), tieBreak = Some("okey"), broadcast = Some(false))
    val joined = asof.join(Tables.customer(spark, sf),
      asof("asof_ocust") === col("c_custkey"))
    val p = finalPlan(joined)
    assert(p.contains("BroadcastHashJoin"),
      s"the customer dim must broadcast above the as-of output:\n$p")
  }

  test("non-long key types: string keys order and match correctly in both modes") {
    import spark.implicits._
    val left = Seq(("b", 10L, 1), ("a", 10L, 2), ("aa", 3L, 3), ("", 9L, 4))
      .toDF("k", "t", "tag")
    val right = Seq(("a", 9L, 100L), ("aa", 3L, 200L), ("b", 11L, 300L), ("", 1L, 400L))
      .toDF("k", "t", "pay")
    for (mode <- Seq(Some(false), Some(true))) {
      val out = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
          broadcast = mode)
        .orderBy("tag").collect()
      assert(out(0).isNullAt(3))          // tag 1: "b"@10 — b@11 is in the future
      assert(out(1).getLong(3) === 100L)  // tag 2: "a"@10 → a@9
      assert(out(2).getLong(3) === 200L)  // tag 3: "aa"@3 → exact-ts match
      assert(out(3).getLong(3) === 400L)  // tag 4: empty-string key is a real key
    }
  }

  for ((mode, label) <- Seq(Some(false) -> "shuffle-merge", Some(true) -> "broadcast")) {
    test(s"[$label] forward direction: first at-or-after wins, smallest tie-break, null ts matches nothing") {
      import spark.implicits._
      val left = Seq((1L, Some(10L), "a"), (1L, Some(5L), "b"), (2L, Some(9L), "c"),
        (1L, None: Option[Long], "nt")).toDF("k", "t", "tag")
      val right = Seq(
        (1L, 10L, 100L), (1L, 10L, 50L),  // tie at t=10 → smallest (50) wins
        (1L, 7L, 25L),
        (2L, 8L, 300L))                   // before left ts → no forward match
        .toDF("k", "t", "pay")
      val out = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pay"),
          tieBreak = Some("pay"), broadcast = mode, direction = "forward")
        .orderBy("tag").collect()
      val byTag = out.map(r => r.getString(2) -> r).toMap
      assert(byTag("a").getLong(3) === 50L)   // exact-ts tie → smallest pay
      assert(byTag("b").getLong(3) === 25L)   // next at-or-after 5 is 7
      assert(byTag("c").isNullAt(3))          // only past rows for key 2
      assert(byTag("nt").isNullAt(3))         // null left ts matches nothing
    }
  }

  test("q83/q84 (native) and q48 (composition) rollups agree exactly") {
    val a = AsOfJoin.asofRollup(Tables.events(spark, sf), Tables.orders(spark, sf)).collect()
    val b = AsOfJoin.asofRollup(Tables.events(spark, sf), Tables.orders(spark, sf),
      native = Some(Some(false))).collect()
    val c = AsOfJoin.asofRollup(Tables.events(spark, sf), Tables.orders(spark, sf),
      native = Some(None)).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq === c.toSeq)
  }

  test("MEASURED width (r15): a fat ARRAY payload prices the pile for real — defaultSize assumes ONE element") {
    // right payload = 100 floats per row: ArrayType.defaultSize prices
    // it at 4 B (one element), so the shipped row reads ~48 B and the
    // hot pile ~24 kB — inside even ¾ of the 100 kB budget → demote.
    // Measured pricing (cardinality × element width) reads ~440 B/row
    // → 220 kB → the right pile alone overflows and must time-slice.
    // The embeddings table is exactly this shape at 100 TB.
    val left = spark.range(2000).select(
      col("id").as("lid"),
      when(col("id") < 500, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 1000L).as("t"))
    val right = spark.range(2000).select(
      when(col("id") < 500, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 37L % 2000000L).as("t"), col("id").as("pid"),
      array_repeat(col("id").cast("float"), 100).as("pay"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(left, right, "k", "t",
      Seq("pid", "pay"), tieBreak = Some("pid"), minFullRows = 0L,
      taskAbsorbBytes = 100000L)
    assert(dec.mode === "rslice" && dec.slicedKeys === Seq(77L),
      s"the fat array pile must split — defaultSize pricing would demote it ($dec)")
    val auto = autoDf.select("lid", "asof_pid").orderBy("lid").collect()
    val plain = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pid", "pay"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("lid", "asof_pid").orderBy("lid").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("routed as-of with PARTIALLY covering precomputed bounds: uncovered keys sample their own (r15 review)") {
    // direct-call shape: bounds precomputed for the sliced key only;
    // the gridded key must get sampled quantiles of its own instead of
    // silently stranding its pile in slice 0 — and the single-exec
    // routed plan must stay row-identical to plain in this mix
    import spark.implicits._
    val left = spark.range(4000).select(
      col("id").as("lid"),
      when(col("id") % 4 === 0, lit(77L))
        .when(col("id") % 4 === 1, lit(88L))
        .otherwise(col("id") % 100 + 1000L).as("k"),
      (col("id") * 1000L).as("t"))
    val right = spark.range(4000).select(
      when(col("id") % 2 === 0, lit(77L)).otherwise(lit(88L)).as("k"),
      (col("id") * 37L % 2000000L).as("t"), col("id").as("pid"))
    val bounds77 = Seq((77L: Any, Seq[Any](250000L, 500000L, 750000L, 1000000L,
      1250000L, 1500000L, 1750000L)))
    val routed = AsOfJoin.asofJoinPartialRouted(left, right, "k", "t",
      Seq("pid"), saltedKeys = Nil, slicedKeys = Seq(77L),
      tieBreak = Some("pid"), griddedKeys = Seq(88L),
      precomputedBounds = bounds77)
    val plain = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pid"),
      tieBreak = Some("pid"), broadcast = Some(false))
    val a = routed.select("lid", "asof_pid").orderBy("lid").collect()
    val b = plain.select("lid", "asof_pid").orderBy("lid").collect()
    assert(a.length === b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
    // and a salt-only call is legal with slices = 1 (no time axis built)
    val saltOnly = AsOfJoin.asofJoinPartialRouted(left, right, "k", "t",
      Seq("pid"), saltedKeys = Seq(77L), slicedKeys = Nil,
      tieBreak = Some("pid"), slices = 1)
    val c = saltOnly.select("lid", "asof_pid").orderBy("lid").collect()
    b.zip(c).foreach { case (x, y) => assert(x === y) }
  }

  // ---- r15: hysteresis band + priced both-overflow --------------------

  /** Right-hot fixture with EXACT byte arithmetic: widths are 32 B/row
    * on both sides and every sampled pass falls back to the full frame
    * (fixtures < MinStatsRows at 10%), so the gate's piles are exact. */
  private def rightHotSides(lRows: Int, rHot: Int, rCold: Int) = {
    val left = spark.range(lRows).select(
      col("id").as("lid"),
      (col("id") % 500 + 1000L).as("k"),
      (col("id") * 1000L).as("t"))
    val right = spark.range(rHot + rCold).select(
      when(col("id") < rHot, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 37L % 2000000L).as("t"), col("id").as("pid"))
    (left, right)
  }

  private def rowsMatchPlain(autoDf: org.apache.spark.sql.DataFrame,
                             left: org.apache.spark.sql.DataFrame,
                             right: org.apache.spark.sql.DataFrame): Unit = {
    val auto = autoDf.select("lid", "asof_pid").orderBy("lid").collect()
    val plain = AsOfJoin.asofJoinNative(left, right, "k", "t", Seq("pid"),
        tieBreak = Some("pid"), broadcast = Some(false))
      .select("lid", "asof_pid").orderBy("lid").collect()
    assert(auto.length === plain.length && auto.nonEmpty)
    auto.zip(plain).foreach { case (a, b) => assert(a === b) }
  }

  test("hysteresis (r15): the FREE rslice engages inside (¾·budget, budget] — and still demotes under it") {
    // the r14 16M-rung lesson: the right pile priced 4.7% INSIDE the
    // budget and demoted, surrendering a measured ~0.8 s rslice win.
    // The time-slice replicates nothing, so it may engage early; the
    // pile here is rB + lUpper = 500×32 + ⌈0.2×500⌉×32 = 19 200 B.
    val (left, right) = rightHotSides(lRows = 500, rHot = 500, rCold = 1500)
    // budget 25 000: pile in the band (18 750, 25 000] → rslice
    val (inBand, decBand) = AsOfJoin.asofJoinAutoStats(left, right, "k", "t",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L,
      taskAbsorbBytes = 25000L)
    assert(decBand.mode === "rslice" && decBand.slicedKeys === Seq(77L),
      s"a pile inside the band must take the free slice ($decBand)")
    assert(decBand.premiumBytes === 0L && decBand.slicesB > 0,
      s"the free slice ships no replicas ($decBand)")
    rowsMatchPlain(inBand, left, right)
    // budget 30 000: the pile sits under ¾ of it → demote, receipted
    val (below, decBelow) = AsOfJoin.asofJoinAutoStats(left, right, "k", "t",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L,
      taskAbsorbBytes = 30000L)
    assert(decBelow.mode === "plain" && decBelow.demotedKeys === Seq(77L),
      s"under ¾ of the budget the demote must hold ($decBelow)")
    rowsMatchPlain(below, left, right)
  }

  test("both-overflow as-of (r15): the FREE rslice undercuts the grid — zero premium, receipted") {
    // both piles exceed the budget (19 200 and 22 400 vs 15 000), and
    // r14 would grid unconditionally; the priced rule picks the
    // zero-premium time-slice (per-task 30 400 B inside the 4× cap)
    val left = spark.range(2000).select(
      col("id").as("lid"),
      when(col("id") < 600, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 1000L).as("t"))
    val right = spark.range(2000).select(
      when(col("id") < 700, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 37L % 2000000L).as("t"), col("id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(left, right, "k", "t",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L,
      taskAbsorbBytes = 15000L)
    assert(dec.mode === "rslice" && dec.slicedKeys === Seq(77L) &&
      dec.griddedKeys.isEmpty,
      s"the free split must undercut the grid in both-overflow ($dec)")
    assert(dec.premiumBytes === 0L, s"rslice ships no replicas ($dec)")
    rowsMatchPlain(autoDf, left, right)
  }

  test("both-overflow as-of past the cap (r15): the grid engages at DERIVED dims with a priced premium") {
    // piles 80 000 B per side vs budget 15 000: plain (160 000) and
    // both one-sided forms (≥ 93 334) exceed the 4× cap = 60 000, so
    // the grid is genuine insurance — salt axis ⌈80k/15k⌉ = 6 (not the
    // fixed 4), premium = the right pile × 5 extra salt copies
    val left = spark.range(8000).select(
      col("id").as("lid"),
      when(col("id") < 2500, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 1000L).as("t"))
    val right = spark.range(8000).select(
      when(col("id") < 2500, lit(77L)).otherwise(col("id") % 500 + 1000L).as("k"),
      (col("id") * 37L % 2000000L).as("t"), col("id").as("pid"))
    val (autoDf, dec) = AsOfJoin.asofJoinAutoStats(left, right, "k", "t",
      Seq("pid"), tieBreak = Some("pid"), minFullRows = 0L,
      taskAbsorbBytes = 15000L)
    assert(dec.mode === "grid" && dec.griddedKeys === Seq(77L),
      s"piles past the cap must take the grid ($dec)")
    assert(dec.slicesA === 6,
      s"the grid's salt axis must be derived from the pile ($dec)")
    assert(dec.premiumBytes === 80000L * 5,
      s"the receipt must price the grid's replication ($dec)")
    val p = finalPlan(autoDf)
    assert(p.contains("__slice") && p.contains("__asof_salt"),
      "the grid plan must join on (key, salt, slice)")
    rowsMatchPlain(autoDf, left, right)
  }
}
