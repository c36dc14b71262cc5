package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Det

/** AS-OF (backward) join — the canonical time-series operator Spark has
  * no built-in for: enrich each left row with the most recent right row
  * at or before its timestamp, per key.
  *
  * The naive formulation is an inequality join (`o_orderdate <= ts`) —
  * a range join that explodes to every (event, earlier-order) pair
  * before picking one winner per event; at 100 TB that intermediate is
  * the whole history cross the fact table. This implementation uses the
  * standard scalable shape instead: TAG both sides, UNION them, and run
  * ONE window per key ordered by (time, side-tag, tiebreak) taking the
  * last non-null right payload — a single shuffle on the join key, an
  * intermediate exactly the size of both inputs, and no pair blowup.
  * Ties are deterministic: a right row at exactly the left row's
  * timestamp is visible (side-tag orders it first), and among equal
  * timestamps the greatest right key wins.
  */
object AsofJoin {

  /** Events enriched with each user's most recent order at event time.
    * Left rows keep a null payload when no order precedes them. */
  def asofEnrich(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("is_evt"),
      col("event_id"), col("event_type"),
      lit(null).cast("bigint").as("okey"), lit(null).cast("double").as("oprice"))
    val o = orders.select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"), lit(0).as("is_evt"),
      lit(null).cast("bigint").as("event_id"), lit(null).cast("string").as("event_type"),
      col("o_orderkey").as("okey"), col("o_totalprice").as("oprice"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("is_evt"), col("okey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      // null the payload on left rows so last(ignoreNulls) skips them;
      // a struct keeps (okey, oprice) atomically from ONE winning row
      .withColumn("ord", when(col("is_evt") === 0, struct(col("okey"), col("oprice"))))
      .withColumn("last_ord", last(col("ord"), ignoreNulls = true).over(w))
      .filter(col("is_evt") === 1)
      .select(col("event_id"), col("event_type"),
        col("last_ord.okey").as("asof_orderkey"),
        col("last_ord.oprice").as("asof_price"))
  }

  /** q48 — as-of rollup per event type: match rate and matched-price
    * mass. The oracle states the same semantics as the inequality join +
    * rank DuckDB can afford at fixture scale — agreeing outputs prove
    * the union-window shape implements the declarative as-of exactly. */
  def asofRollup(events: DataFrame, orders: DataFrame): DataFrame =
    asofEnrich(events, orders)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("asof_orderkey").isNotNull, 1).otherwise(0)).as("matched_events"),
        Det.dsum(col("asof_price")).as("asof_price_sum"))
      .orderBy("event_type")

  private val q48Sql =
    s"""WITH m AS (
       |  SELECT e.event_id, e.event_type, o.o_orderkey, o.o_totalprice,
       |         row_number() OVER (PARTITION BY e.event_id
       |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
       |  FROM events e LEFT JOIN orders o
       |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
       |SELECT event_type, count(*) AS n_events,
       |  cast(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS matched_events,
       |  ${Det.sqlDsum("o_totalprice")} AS asof_price_sum
       |FROM m WHERE rn = 1
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q48_asof_join", (s, d) =>
      asofRollup(Tables.events(s, d), Tables.orders(s, d)), Some(q48Sql)))
}
