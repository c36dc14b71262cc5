package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

import graft.{Q, Tables}
import graft.functions.Det.{dsum, sqlDsum}

/** Runtime bloom-filter semi-join pruning — the scan-side prune Spark's
  * own `InjectRuntimeFilter` rule applies to shuffle joins
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), expressed as an
  * explicit operator so the engine controls WHEN it fires instead of
  * depending on the optimizer's creation-side size heuristics.
  *
  * Shape, and why it matters at 100 TB: a selective dimension predicate
  * (here: urgent, high-value orders — ~2% of `orders`) must prune the
  * FACT side before the join's shuffle, or the full 100 TB fact relation
  * is hashed, serialized, and shipped only for the join to discard 98%
  * of it. The build side aggregates its join keys into a bloom filter
  * (map-side partials; bitwise-OR merge, so the result is
  * partition-layout-invariant), the ~MB filter ships to every fact
  * scan task (the same driver materialization Spark performs for a
  * runtime filter's ScalarSubquery), and `might_contain` drops
  * non-qualifying rows inside the scan stage. The exact equi-join then
  * removes the bloom's false positives — the sketch→verify architecture
  * of the dedup family, which is exactly why the operator stays
  * hash-exact under the oracle's plain JOIN: the bloom affects WORK,
  * never RESULTS.
  *
  * Reference analog: the analytics views join the full event stream to
  * sparse dimension slices (analytics_views.sql's content/session
  * joins); at reference scale the optimizer's broadcast join suffices,
  * this is the shape that survives when both sides stop fitting memory.
  */
object RuntimeFilter {

  /** The selective build side: urgent, high-value orders (~2%). */
  private[graft] def buildSide(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"))

  /** A `might_contain(xxhash64(probeKey))` Column over a bloom built
    * from `sel`'s `buildKey` values — shared by q77 and q81.
    *
    * The bloom is sized from the build side's ACTUAL key count — one
    * extra aggregation over the already-filtered small side, noise next
    * to the fact scan it prunes. A default-sized filter silently
    * saturates past ~1M distinct keys: still correct, but the prune rate
    * decays with no signal. numBits = 8·n is the ~3%-fpp optimum,
    * clamped to Spark's runtime-filter ceilings. The build itself is
    * distributed (XxHash64-keyed map-side partials, bitwise-OR merge,
    * like InjectRuntimeFilter's); head() is the scalar-subquery
    * materialization — one ~MB binary to the driver, not data rows. */
  private def bloomProbe(sel: DataFrame, buildKey: String, probeKey: String)
      : org.apache.spark.sql.Column = {
    val n = sel.count()
    val items = math.min(math.max(n, 4096L), 4000000L)
    val bits = math.min(math.max(items * 8L, 1L << 16), 67108864L)
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(col(buildKey)))),
        Literal(items), Literal(bits))
        .toAggregateExpression())
    val bloom = sel.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    ColumnBridge.column(
      new BloomFilterMightContain(
        Literal.create(bloom, BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(col(probeKey))))))
  }

  /** The fact relation with only the bloom prune applied (pre-join) —
    * exposed so specs can measure the prune rate the join never sees. */
  private[graft] def prunedFact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(bloomProbe(buildSide(spark, sfDir), "o_orderkey", "l_orderkey"))

  /** Per-returnflag revenue rollup of lineitems belonging to urgent,
    * high-value orders, with the fact scan bloom-pruned before the join. */
  def bloomPrunedRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val sel = buildSide(spark, sfDir)
    prunedFact(spark, sfDir) // scan-side: rows drop before the join shuffle
      .join(sel, col("l_orderkey") === col("o_orderkey")) // exact: kills false positives
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** The PLAIN declarative form of the q77 rollup — what a user writes
    * when they don't know the bloom trick exists. */
  private def plainRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(buildSide(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")

  // q79 runs on a memoized session CLONE with the rule's conf flag set
  // (the weak-keyed gate-session pattern — graft.SessionClones):
  // independent SQLConf and ExperimentalMethods, shared context/catalog —
  // the caller's session never observes the flag, and every other
  // query's plan stays byte-identical.
  private def ruleSession(spark: SparkSession): SparkSession =
    graft.SessionClones.cloned("auto-bloom-prune", spark) { s =>
      s.conf.set(graft.plans.AutoBloomPrune.Flag, "true")
    }

  /** q79 — the [[graft.plans.AutoBloomPrune]] OPTIMIZER RULE applied to
    * the plain join: same result as q77 (and the same oracle SQL), but
    * the scan-side `might_contain` prune is injected by the rule, not
    * written by the user — the engine's demonstration that the bloom
    * rewrite is a planning concern, not a query-authoring one. */
  def autoBloomPrunedRollup(spark: SparkSession, sfDir: String): DataFrame =
    plainRollup(ruleSession(spark), sfDir)

  /** q82 — MULTI-DIM auto-prune: a fact joining TWO selective dims
    * (urgent high-value orders on `l_orderkey`, small parts on
    * `l_partkey`), written as plain joins on the rule session. The
    * per-key idempotence guard lets the rule inject BOTH probes on the
    * fact scan — the semi-join-reduction program a multi-dim star query
    * wants at 100 TB, where each dim alone leaves the fact's shuffle too
    * big (PlanSpec pins two `might_contain`s and no duplicate-key
    * stacking). Oracle: the plain two-join rollup — both probes change
    * WORK, never RESULTS. */
  def multiDimAutoPruned(spark: SparkSession, sfDir: String): DataFrame = {
    val s = ruleSession(spark)
    Tables.lineitem(s, sfDir)
      .join(buildSide(s, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(s, sfDir).filter(col("p_size") <= 5).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")
  }

  private val q82Sql =
    s"""SELECT l_returnflag,
       | cast(count(*) as bigint) AS n_rows,
       | ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > cast(450000 as double)
       |  AND p_size <= 5
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The q81 build side: users with a high-value purchase (~8% of the
    * user dimension at every fixture scale). */
  private[graft] def highValueUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase" && col("value") > 250.0)
      .select(col("user_id")).distinct()

  /** The day-sliced partitioned scan with the bloom probe applied —
    * exposed so PlanSpec can pin BOTH prunes on one scan. */
  private[graft] def prunedPartitionedFact(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.PartitionedLayout.partitionedEvents(spark, sfDir)
      .filter(col("year") === 2024 && col("month") === 1 && col("day").between(10, 20))
      .filter(bloomProbe(highValueUsers(spark, sfDir), "user_id", "user_id"))

  /** q81 — the q77 bloom prune COMPOSED with the partitioned layout: at
    * 100 TB the fact is never a flat directory, so the scan-side
    * `might_contain` probe has to coexist with partition pruning. The
    * static day-range lands in the scan's `PartitionFilters` (11 of 30
    * day-directories listed — directory-level pruning first, the
    * cheapest filter there is), and the bloom probe drops non-qualifying
    * survivors inside the scan stage before the join shuffle — the two
    * prunes compose multiplicatively on one scan (PlanSpec pins both in
    * a single node's receipt). Exact under the oracle's plain JOIN over
    * the flat fixture: both prunes affect WORK, never RESULTS. */
  def bloomPrunedPartitionedRollup(spark: SparkSession, sfDir: String): DataFrame =
    prunedPartitionedFact(spark, sfDir)
      .join(highValueUsers(spark, sfDir), Seq("user_id")) // exact: kills false positives
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"))
      .orderBy("day")

  private val q81Sql =
    s"""WITH sel AS (SELECT DISTINCT user_id FROM events
       |            WHERE event_type = 'purchase' AND value > cast(250 as double))
       |SELECT day(ts) AS day, cast(count(*) as bigint) AS n,
       |       ${sqlDsum("value")} AS total_value
       |FROM events JOIN sel USING (user_id)
       |WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 10 AND 20
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private val q77Sql =
    s"""SELECT l_returnflag,
       | cast(count(*) as bigint) AS n_rows,
       | ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > cast(450000 as double)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q99 — SEMI-JOIN auto-prune: the EXISTS shape (lineitem rows whose
    * order is urgent high-value — no order columns in the output)
    * written as a plain `left_semi` join on the rule session; round 11
    * extended [[graft.plans.AutoBloomPrune]] to LeftSemi, the textbook
    * semi-join-reduction case, so the fact scan carries the
    * `might_contain` probe before the shuffle. LeftAnti is pinned
    * rule-EXEMPT by PlanSpec — a bloom prunes "might match" rows,
    * which are exactly an anti join's keepers. Oracle: the declarative
    * EXISTS — the probe changes WORK, never RESULTS. */
  def semiJoinAutoPruned(spark: SparkSession, sfDir: String): DataFrame = {
    val s = ruleSession(spark)
    Tables.lineitem(s, sfDir)
      .join(buildSide(s, sfDir), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")
  }

  private val q99Sql =
    s"""SELECT l_returnflag,
       | cast(count(*) as bigint) AS n_rows,
       | ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem l
       |WHERE EXISTS (SELECT 1 FROM orders o
       |              WHERE o.o_orderkey = l.l_orderkey
       |                AND o.o_orderpriority = '1-URGENT'
       |                AND o.o_totalprice > cast(450000 as double))
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q77_bloom_prune", (s, d) => bloomPrunedRollup(s, d), Some(q77Sql)),
    Q("q79_auto_bloom_prune", (s, d) => autoBloomPrunedRollup(s, d), Some(q77Sql)),
    Q("q81_bloom_partition_prune", (s, d) => bloomPrunedPartitionedRollup(s, d), Some(q81Sql)),
    Q("q82_multi_dim_bloom_prune", (s, d) => multiDimAutoPruned(s, d), Some(q82Sql)),
    Q("q99_semi_join_bloom_prune", (s, d) => semiJoinAutoPruned(s, d), Some(q99Sql)))
}
