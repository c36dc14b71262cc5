package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Ordered-funnel and retention-cohort analytics — the two product
  * questions every streaming-analytics deployment asks of its event
  * stream next, beyond the reference's 12 views (analytics_views.sql):
  * "how far do users get?" and "do they come back?".
  *
  * Both are one-shuffle shapes: the funnel computes its per-user step
  * timestamps with stacked window minima over a single user_id
  * partition pass, and retention rides the distinct (user, day)
  * activity grid — each distributes by user across any number of
  * executors, with no single-partition operator anywhere.
  */
object FunnelQueries {

  /** q58 — ordered three-step funnel view → click → purchase: a step
    * counts only if it happens AT OR AFTER the previous step's first
    * completion (the strict-progression semantics BI funnel tools
    * implement). Stacked window minima: t1 = first view; t2 = first
    * click ≥ t1; t3 = first purchase ≥ t2 — three Window expressions
    * over the same user_id partitioning collapse onto ONE exchange +
    * sort, then a per-user rollup and a 1-row summary with conversion
    * ratios. */
  def funnelSteps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = events
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_s"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts_s") >= col("t1"), col("ts_s"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_s") >= col("t2"), col("ts_s"))).over(w))
    val perUser = staged.groupBy("user_id")
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    perUser.agg(
        count(lit(1)).as("users"),
        count(col("t1")).as("reached_view"),
        count(col("t2")).as("reached_click"),
        count(col("t3")).as("reached_purchase"))
      // guard the zero-divisor case (a corpus with no view / no valid
      // click): Spark non-ANSI division yields null but DuckDB's IEEE
      // double division yields inf/nan, so an unguarded ratio would
      // hash-diverge from the oracle on such data — both sides use the
      // same CASE-WHEN formulation
      .withColumn("view_to_click",
        when(col("reached_view") > 0,
          col("reached_click").cast("double") / col("reached_view")))
      .withColumn("click_to_purchase",
        when(col("reached_click") > 0,
          col("reached_purchase").cast("double") / col("reached_click")))
  }

  private[graft] val q58Sql =
    """WITH e AS (SELECT user_id, event_type, cast(floor(epoch(ts)) as bigint) AS ts_s FROM events),
      |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_s END)
      |                   OVER (PARTITION BY user_id) AS t1 FROM e),
      |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_s >= t1 THEN ts_s END)
      |                   OVER (PARTITION BY user_id) AS t2 FROM w1),
      |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_s >= t2 THEN ts_s END)
      |                   OVER (PARTITION BY user_id) AS t3 FROM w2),
      |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3 FROM w3 GROUP BY 1)
      |SELECT count(*) AS users,
      |  count(t1) AS reached_view,
      |  count(t2) AS reached_click,
      |  count(t3) AS reached_purchase,
      |  CASE WHEN count(t1) > 0 THEN cast(count(t2) as double)/count(t1) END AS view_to_click,
      |  CASE WHEN count(t2) > 0 THEN cast(count(t3) as double)/count(t2) END AS click_to_purchase
      |FROM u""".stripMargin

  /** The q58 summary shape over a per-user (t1, t2, t3) table — shared by
    * the window formulation (q58) and the stateful operator (q61), with
    * divide-by-zero guarded identically to the SQL twin. */
  private[graft] def funnelSummary(perUser: DataFrame): DataFrame =
    perUser.agg(
        count(lit(1)).as("users"),
        count(col("t1")).as("reached_view"),
        count(col("t2")).as("reached_click"),
        count(col("t3")).as("reached_purchase"))
      .withColumn("view_to_click",
        when(col("reached_view") > 0,
          col("reached_click").cast("double") / col("reached_view")))
      .withColumn("click_to_purchase",
        when(col("reached_click") > 0,
          col("reached_purchase").cast("double") / col("reached_click")))

  /** q61 — the STATEFUL funnel operator (streaming/Funnel.scala's
    * `mapGroupsWithState`) run in batch mode and rolled up to q58's
    * summary, under q58's oracle: proves the incremental state machine —
    * not just its window twin — produces the exact funnel. In batch mode
    * every event of a user arrives in the single state invocation, so
    * the settle pass IS the stacked-minima computation. */
  def statefulFunnelSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
      .as[graft.streaming.Funnel.FunnelEvent]
    funnelSummary(graft.streaming.Funnel.streamingFunnel(spark, ev).toDF())
  }

  /** q64 — the time-constrained funnel: a step counts only within
    * `maxDelayS` of the previous step's completion (the per-step
    * conversion-window toggle BI funnel tools default to). Identical
    * one-exchange stacked-minima shape as q58 — the window condition
    * gains an upper bound, nothing else moves. */
  def funnelStepsWithin(events: DataFrame, maxDelayS: Long = 3600): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = events
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_s"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click"
          && col("ts_s").between(col("t1"), col("t1") + maxDelayS), col("ts_s"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase"
          && col("ts_s").between(col("t2"), col("t2") + maxDelayS), col("ts_s"))).over(w))
    funnelSummary(staged.groupBy("user_id")
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3")))
  }

  private val q64Sql =
    """WITH e AS (SELECT user_id, event_type, cast(floor(epoch(ts)) as bigint) AS ts_s FROM events),
      |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_s END)
      |                   OVER (PARTITION BY user_id) AS t1 FROM e),
      |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_s BETWEEN t1 AND t1 + 3600 THEN ts_s END)
      |                   OVER (PARTITION BY user_id) AS t2 FROM w1),
      |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_s BETWEEN t2 AND t2 + 3600 THEN ts_s END)
      |                   OVER (PARTITION BY user_id) AS t3 FROM w2),
      |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3 FROM w3 GROUP BY 1)
      |SELECT count(*) AS users,
      |  count(t1) AS reached_view,
      |  count(t2) AS reached_click,
      |  count(t3) AS reached_purchase,
      |  CASE WHEN count(t1) > 0 THEN cast(count(t2) as double)/count(t1) END AS view_to_click,
      |  CASE WHEN count(t2) > 0 THEN cast(count(t3) as double)/count(t2) END AS click_to_purchase
      |FROM u""".stripMargin

  /** q59 — retention cohort matrix: users grouped by first-active day,
    * with exact-day D1/D7/D14 return counts and rates — the standard
    * cohort heatmap feeding growth dashboards. Shape: the distinct
    * (user, day) activity grid (one aggregate over the fact), a
    * per-user first-day window on that grid, then a cohort-day rollup —
    * the grid is users × active-days, already far smaller than the
    * event grain, and everything after it is metadata-sized. */
  def retentionMatrix(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val f = Window.partitionBy("user_id")
    val off = ud
      .withColumn("cohort_day", min(col("day")).over(f))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
    off.groupBy("cohort_day")
      .agg(
        countDistinct(col("user_id")).as("cohort_users"),
        countDistinct(when(col("day_offset") === 1, col("user_id"))).as("d1_users"),
        countDistinct(when(col("day_offset") === 7, col("user_id"))).as("d7_users"),
        countDistinct(when(col("day_offset") === 14, col("user_id"))).as("d14_users"))
      .withColumn("d1_rate", col("d1_users").cast("double") / col("cohort_users"))
      .withColumn("d7_rate", col("d7_users").cast("double") / col("cohort_users"))
      .orderBy("cohort_day")
  }

  private val q59Sql =
    """WITH ud AS (SELECT DISTINCT user_id, cast(ts as date) AS day FROM events),
      |o AS (SELECT user_id, day,
      |        min(day) OVER (PARTITION BY user_id) AS cohort_day,
      |        day - min(day) OVER (PARTITION BY user_id) AS day_offset
      |      FROM ud)
      |SELECT cohort_day,
      |  count(DISTINCT user_id) AS cohort_users,
      |  count(DISTINCT CASE WHEN day_offset = 1 THEN user_id END) AS d1_users,
      |  count(DISTINCT CASE WHEN day_offset = 7 THEN user_id END) AS d7_users,
      |  count(DISTINCT CASE WHEN day_offset = 14 THEN user_id END) AS d14_users,
      |  cast(count(DISTINCT CASE WHEN day_offset = 1 THEN user_id END) as double)
      |    / count(DISTINCT user_id) AS d1_rate,
      |  cast(count(DISTINCT CASE WHEN day_offset = 7 THEN user_id END) as double)
      |    / count(DISTINCT user_id) AS d7_rate
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin

  /** q65 — week-granularity retention cohorts: users grouped by
    * first-active ISO week, with W1/W2/W4 return counts and rates — the
    * coarser cohort grain growth dashboards pair with q59's daily matrix.
    * Offsets stay in DAYS on week-truncated dates (multiples of 7), so
    * no integer-division semantics have to line up across engines. Same
    * activity-grid shape as q59: one distinct over the fact, then
    * metadata-sized windows and rollups. */
  def weeklyRetention(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val f = Window.partitionBy("user_id")
    val off = uw
      .withColumn("cohort_week", min(col("week")).over(f))
      .withColumn("day_offset", datediff(col("week"), col("cohort_week")))
    off.groupBy("cohort_week")
      .agg(
        countDistinct(col("user_id")).as("cohort_users"),
        countDistinct(when(col("day_offset") === 7, col("user_id"))).as("w1_users"),
        countDistinct(when(col("day_offset") === 14, col("user_id"))).as("w2_users"),
        countDistinct(when(col("day_offset") === 28, col("user_id"))).as("w4_users"))
      .withColumn("w1_rate", col("w1_users").cast("double") / col("cohort_users"))
      .withColumn("w2_rate", col("w2_users").cast("double") / col("cohort_users"))
      .orderBy("cohort_week")
  }

  private val q65Sql =
    """WITH uw AS (SELECT DISTINCT user_id, cast(date_trunc('week', ts) as date) AS week FROM events),
      |o AS (SELECT user_id, week,
      |        min(week) OVER (PARTITION BY user_id) AS cohort_week,
      |        week - min(week) OVER (PARTITION BY user_id) AS day_offset
      |      FROM uw)
      |SELECT cohort_week,
      |  count(DISTINCT user_id) AS cohort_users,
      |  count(DISTINCT CASE WHEN day_offset = 7 THEN user_id END) AS w1_users,
      |  count(DISTINCT CASE WHEN day_offset = 14 THEN user_id END) AS w2_users,
      |  count(DISTINCT CASE WHEN day_offset = 28 THEN user_id END) AS w4_users,
      |  cast(count(DISTINCT CASE WHEN day_offset = 7 THEN user_id END) as double)
      |    / count(DISTINCT user_id) AS w1_rate,
      |  cast(count(DISTINCT CASE WHEN day_offset = 14 THEN user_id END) as double)
      |    / count(DISTINCT user_id) AS w2_rate
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q58_funnel_steps", (s, d) => funnelSteps(Tables.events(s, d)), Some(q58Sql)),
    Q("q59_retention_matrix", (s, d) => retentionMatrix(Tables.events(s, d)), Some(q59Sql)),
    Q("q61_funnel_stateful", (s, d) => statefulFunnelSummary(s, d), Some(q58Sql)),
    Q("q64_funnel_within_1h", (s, d) => funnelStepsWithin(Tables.events(s, d)), Some(q64Sql)),
    Q("q65_weekly_retention", (s, d) => weeklyRetention(Tables.events(s, d)), Some(q65Sql)))
}
