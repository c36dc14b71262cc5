package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTs <= leftTs` on the same key. Spark has no built-in; the naive
  * formulation (non-equi join + max) is a BroadcastNestedLoop trap.
  *
  * This implementation is the scalable composition (brief preference (a)):
  * union both sides with a side marker, then one `last_value(...,
  * ignoreNulls)` window over (key, ts, marker) — a single hash shuffle on
  * the key, linear in total rows, ties resolved right-before-left so a
  * right row at exactly leftTs matches (DuckDB ASOF semantics).
  */
object AsOfJoin {

  /** `right` must be unique per (key, tsCol) — pre-dedup if not, or name a
    * `tieBreak` payload column: equal-timestamp right rows then resolve to
    * the greatest tieBreak value deterministically. Payload columns are
    * taken from `valueCols`.
    *
    * The payloads travel as ONE struct (null for left rows, non-null —
    * even when its fields are null — for right rows), and a single
    * `last(..., ignoreNulls)` picks the latest right ROW as a unit. A
    * per-column fill would let a NULL field in the matched right row leak
    * an older row's value, or stitch fields from different rows. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               valueCols: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
    // Null keys never match under SQL ASOF equality, but Window.partitionBy
    // groups nulls together — filter null-key right rows so null-key left
    // rows correctly get a null payload.
    val rightTagged = right
      .filter(col(key).isNotNull)
      .select(col(key), col(tsCol), struct(valueCols.map(col): _*).as("__rv"))
      .withColumn("__side", lit(0))

    val orderCols = Seq(col(tsCol), col("__side")) ++
      tieBreak.map(c => col(s"__rv.$c"))
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // unionByName(allowMissingColumns) null-fills each side's missing
    // columns (left's payload slot, right's carried left columns)
    leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Events enriched with each user's most recent ORDER at event time —
    * the cross-table as-of (q37 is the events-only self variant). Left
    * rows keep a null payload when no order precedes them; same-date
    * orders resolve to the greatest order key. */
  def asofEnrich(events: DataFrame, orders: DataFrame): DataFrame = {
    val right = orders.select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("okey"), col("o_totalprice").as("oprice"))
    asofJoin(events.select("event_id", "event_type", "user_id", "ts"), right,
        "user_id", "ts", Seq("okey", "oprice"), tieBreak = Some("okey"))
      .select(col("event_id"), col("event_type"),
        col("asof_okey").as("asof_orderkey"),
        col("asof_oprice").as("asof_price"))
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
        graft.functions.Det.dsum(col("asof_price")).as("asof_price_sum"))
      // nulls-last to match the oracle engine's ORDER BY default
      .orderBy(col("event_type").asc_nulls_last)

  private val q48Sql =
    s"""WITH m AS (
       |  SELECT e.event_id, e.event_type, o.o_orderkey, o.o_totalprice,
       |         row_number() OVER (PARTITION BY e.event_id
       |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
       |  FROM events e LEFT JOIN orders o
       |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
       |SELECT event_type, count(*) AS n_events,
       |  cast(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS matched_events,
       |  ${graft.functions.Det.sqlDsum("o_totalprice")} AS asof_price_sum
       |FROM m WHERE rn = 1
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[graft.Q] = Seq(
    graft.Q("q48_asof_join", (s, d) =>
      asofRollup(graft.Tables.events(s, d), graft.Tables.orders(s, d)), Some(q48Sql)))
}
