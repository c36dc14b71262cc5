package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.etl.{Ingest, Merge, Quality}
import graft.functions.Det._

/** Relational operator catalog, part 2 (SURVEY.md §2): sparse left joins,
  * cross-join KPIs, cohort equi-rewrite, anti join, conditional distinct,
  * histograms, collect_set, string/JSON scalar surface, set ops, data
  * quality, and the MERGE/DELETE/UPDATE mutations exposed as queries.
  */
object ExtendedQueries {

  /** q16 — J3: left join against a filtered fact for sparse activity
    * (reference: analytics_views.sql:44-48, 344-347). */
  def leftJoinSparse(customer: DataFrame, orders: DataFrame): DataFrame = {
    val recent = orders.filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    customer.join(recent, customer("c_custkey") === recent("o_custkey"), "left_outer")
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("c_custkey")).as("customers"),
        countDistinct(col("o_custkey")).as("active_customers"),
        count(col("o_orderkey")).as("recent_orders"))
      .orderBy("c_mktsegment")
  }

  private val q16Sql =
    """SELECT c_mktsegment,
      | count(DISTINCT c_custkey) AS customers,
      | count(DISTINCT o_custkey) AS active_customers,
      | count(o_orderkey) AS recent_orders
      |FROM customer LEFT JOIN orders
      |  ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q17 — J4: 1×1 cross join of period KPI aggregates
    * (reference: analytics_views.sql:295). */
  def crossKpi(orders: DataFrame): DataFrame = {
    def kpis(lo: String, hi: String): DataFrame =
      orders.filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
                    col("o_orderdate") < lit(hi).cast("timestamp"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    val cur = kpis("2001-01-01", "2001-07-01")
      .select(col("revenue").as("cur_revenue"), col("n_orders").as("cur_orders"))
    val prev = kpis("2000-07-01", "2001-01-01")
      .select(col("revenue").as("prev_revenue"), col("n_orders").as("prev_orders"))
    cur.crossJoin(prev)
      .withColumn("revenue_growth_pct",
        (col("cur_revenue") - col("prev_revenue")) / col("prev_revenue") * lit(100.0))
      .withColumn("order_growth_pct",
        (col("cur_orders") - col("prev_orders")).cast("double") / col("prev_orders") * lit(100.0))
  }

  private val q17Sql =
    s"""WITH cur AS (SELECT ${sqlDsum("o_totalprice")} AS cur_revenue, count(*) AS cur_orders
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' AND o_orderdate < TIMESTAMP '2001-07-01'),
       |prev AS (SELECT ${sqlDsum("o_totalprice")} AS prev_revenue, count(*) AS prev_orders
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-07-01' AND o_orderdate < TIMESTAMP '2001-01-01')
       |SELECT cur_revenue, cur_orders, prev_revenue, prev_orders,
       | (cur_revenue - prev_revenue)/prev_revenue*cast(100.0 as double) AS revenue_growth_pct,
       | cast(cur_orders - prev_orders as double)/prev_orders*cast(100.0 as double) AS order_growth_pct
       |FROM cur CROSS JOIN prev""".stripMargin

  /** q18 — J5 rewritten: the reference's non-equi cohort join
    * (analytics_views.sql:47-48) is a BNLJ trap at scale; precomputing the
    * month bucket turns it into a plain equi join on the customer key. */
  def cohortEqui(orders: DataFrame): DataFrame = {
    val om = orders.withColumn("order_month", to_date(date_trunc("month", col("o_orderdate"))))
    val cohorts = om.groupBy("o_custkey").agg(min(col("order_month")).as("cohort_month"))
    om.join(cohorts, Seq("o_custkey"))
      .withColumn("months_since",
        months_between(col("order_month"), col("cohort_month")).cast("long"))
      .groupBy("cohort_month", "months_since")
      .agg(
        countDistinct(col("o_custkey")).as("active_customers"),
        count(lit(1)).as("orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy("cohort_month", "months_since")
  }

  private val q18Sql =
    s"""WITH om AS (SELECT o_custkey, cast(date_trunc('month', o_orderdate) as date) AS order_month, o_totalprice FROM orders),
       |cohorts AS (SELECT o_custkey, min(order_month) AS cohort_month FROM om GROUP BY 1)
       |SELECT cohort_month, cast(datediff('month', cohort_month, order_month) as bigint) AS months_since,
       | count(DISTINCT om.o_custkey) AS active_customers,
       | count(*) AS orders,
       | ${sqlDsum("o_totalprice")} AS revenue
       |FROM om JOIN cohorts ON om.o_custkey = cohorts.o_custkey
       |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** q19 — J7: anti join (NOT EXISTS → left_anti)
    * (reference: snowflake_pipeline.py:342). */
  def antiJoin(customer: DataFrame, orders: DataFrame): DataFrame = {
    val big = orders.filter(col("o_totalprice") >= 350000)
    customer.join(big, customer("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val q19Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 350000)
      |ORDER BY 1""".stripMargin

  /** q20 — A8: COUNT(DISTINCT) + conditional distinct per day
    * (reference: analytics_views.sql:12-14). */
  def conditionalDistinct(events: DataFrame): DataFrame =
    events.withColumn("day", to_date(col("ts")))
      .groupBy("day")
      .agg(
        countDistinct(col("user_id")).as("dau"),
        countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("purchasers"),
        countDistinct(when(col("event_type") === "click", col("user_id"))).as("clickers"))
      .withColumn("purchaser_pct",
        col("purchasers").cast("double") / nullIfZero(col("dau")) * lit(100.0))
      .orderBy("day")

  private val q20Sql =
    """SELECT day, dau, purchasers, clickers,
      | cast(purchasers as double)/nullif(dau,0)*cast(100.0 as double) AS purchaser_pct
      |FROM (SELECT cast(ts as date) AS day,
      |       count(DISTINCT user_id) AS dau,
      |       count(DISTINCT CASE WHEN event_type='purchase' THEN user_id END) AS purchasers,
      |       count(DISTINCT CASE WHEN event_type='click' THEN user_id END) AS clickers
      |      FROM events GROUP BY 1) ORDER BY day""".stripMargin

  /** q21 — A9: conditional counts as rates (buffer/error-rate shape;
    * reference: analytics_views.sql:198-199, 215-216). */
  def conditionalCounts(events: DataFrame): DataFrame =
    events.withColumn("day", to_date(col("ts")))
      .groupBy("day")
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("clicks"))
      .withColumn("error_rate_pct", (col("errors") * 100).cast("double") / col("total"))
      .withColumn("click_rate_pct", (col("clicks") * 100).cast("double") / col("total"))
      .orderBy("day")

  private val q21Sql =
    """SELECT day, total, errors, clicks,
      | cast(errors*100 as double)/total AS error_rate_pct,
      | cast(clicks*100 as double)/total AS click_rate_pct
      |FROM (SELECT cast(ts as date) AS day, count(*) AS total,
      |       cast(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) as bigint) AS errors,
      |       cast(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) as bigint) AS clicks
      |      FROM events GROUP BY 1) ORDER BY day""".stripMargin

  /** q22 — A11: when-cascade bucket histogram with ratio-to-total
    * (reference: analytics_views.sql:150-181). */
  def histogramBuckets(events: DataFrame): DataFrame = {
    val bucket = when(col("value") < 50, "000-049")
      .when(col("value") < 100, "050-099")
      .when(col("value") < 150, "100-149")
      .when(col("value") < 200, "150-199")
      .otherwise("200+")
    events.withColumn("value_bucket", bucket)
      .groupBy("value_bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("pct", (col("cnt") * 100).cast("double") /
        sum(col("cnt")).over(Window.partitionBy()))
      .orderBy("value_bucket")
  }

  private val q22Sql =
    """SELECT value_bucket, cnt, cast(cnt*100 as double)/sum(cnt) OVER () AS pct
      |FROM (SELECT CASE WHEN value < 50 THEN '000-049' WHEN value < 100 THEN '050-099'
      |             WHEN value < 150 THEN '100-149' WHEN value < 200 THEN '150-199'
      |             ELSE '200+' END AS value_bucket, count(*) AS cnt
      |      FROM events GROUP BY 1) ORDER BY value_bucket""".stripMargin

  /** q23 — A12: per-key collect_set, emitted as a sorted joined string so
    * the array compares deterministically across engines
    * (reference: delta_setup.py:379-380 gold array columns). */
  def collectSetStr(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",").as("event_types"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("user_id")

  private val q23Sql =
    """SELECT user_id,
      | string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
      | count(DISTINCT event_type) AS n_types
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** q24 — P9/P10: string cleaning + regexp validation/extraction
    * (reference: etl_framework.py:344-359, intended semantics). */
  def stringClean(customer: DataFrame): DataFrame =
    customer.select(
        col("c_custkey"),
        upper(trim(col("c_name"))).as("name_upper"),
        coalesce(Ingest.cleanString(col("c_mktsegment")), lit("UNKNOWN")).as("segment_clean"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("id_str"),
        Ingest.validIpOrNull(col("c_name")).as("ip_check"))
      .orderBy("c_custkey")

  private val q24Sql =
    """SELECT c_custkey,
      | upper(trim(c_name)) AS name_upper,
      | coalesce(nullif(trim(c_mktsegment),''),'UNKNOWN') AS segment_clean,
      | regexp_extract(c_name, '([0-9]+)', 1) AS id_str,
      | CASE WHEN regexp_extract(c_name, '^(\d{1,3}\.){3}\d{1,3}$', 0) = '' THEN NULL
      |      ELSE regexp_extract(c_name, '^(\d{1,3}\.){3}\d{1,3}$', 0) END AS ip_check
      |FROM customer ORDER BY 1""".stripMargin

  /** q25 — §2.8 JSON: reopen the raw JSON payload column
    * (reference: real_time_streaming.py:160, delta_setup.py:133). */
  def jsonExtract(events: DataFrame): DataFrame =
    events.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .withColumn("avg_k", col("sum_k").cast("double") / col("n"))
      .orderBy("event_type")

  private val q25Sql =
    """SELECT event_type, n, sum_k, min_k, max_k, cast(sum_k as double)/n AS avg_k
      |FROM (SELECT event_type, count(k) AS n, cast(sum(k) as bigint) AS sum_k,
      |             min(k) AS min_k, max(k) AS max_k
      |      FROM (SELECT event_type, cast(props->>'k' as bigint) AS k FROM events)
      |      GROUP BY 1) ORDER BY 1""".stripMargin

  /** q26 — P4-P7: whitelist filter, derived boolean flags, unit conversion
    * (reference: real_time_streaming.py:230-236, etl_framework.py:552-562). */
  def derivedFlags(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("is_engagement", col("event_type").isin("click", "purchase"))
      .withColumn("value_minutes", col("value") / lit(60.0))
      .groupBy("is_engagement")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value_minutes")).as("total_minutes"),
        davg(col("value")).as("avg_value"))
      .orderBy("is_engagement")

  private val q26Sql =
    s"""SELECT event_type IN ('click','purchase') AS is_engagement,
       | count(*) AS n,
       | ${sqlDsum("value/cast(60.0 as double)")} AS total_minutes,
       | ${sqlDavg("value")} AS avg_value
       |FROM events WHERE event_type IN ('view','click','purchase')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q27 — §2.7: union of filtered subsets (the reference's multi-topic
    * stream union, real_time_streaming.py:192-193). */
  def unionSets(events: DataFrame): DataFrame = {
    val hi = events.filter(col("event_type") === "purchase" && col("value") > 200)
      .select(to_date(col("ts")).as("day"), lit("purchase_hi").as("branch"))
    val err = events.filter(col("event_type") === "error")
      .select(to_date(col("ts")).as("day"), lit("error").as("branch"))
    hi.unionByName(err)
      .groupBy("branch", "day").agg(count(lit(1)).as("cnt"))
      .orderBy("branch", "day")
  }

  private val q27Sql =
    """SELECT branch, day, count(*) AS cnt FROM (
      |  SELECT cast(ts as date) AS day, 'purchase_hi' AS branch FROM events
      |   WHERE event_type='purchase' AND value > 200
      |  UNION ALL
      |  SELECT cast(ts as date) AS day, 'error' AS branch FROM events
      |   WHERE event_type='error')
      |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** q28 — P11/P12: rule-driven data-quality flags + score
    * (reference: etl_framework.py:125-206, consumer.py:283-296). */
  def qualityFlags(events: DataFrame): DataFrame = {
    val rules = Seq(
      Quality.Rule("null_user", col("user_id").isNull),
      Quality.Rule("neg_value", col("value") < 0),
      Quality.Rule("unknown_type",
        !col("event_type").isin("click", "error", "purchase", "signup", "view")),
      Quality.Rule("missing_prop", get_json_object(col("props"), "$.k").isNull),
      Quality.Rule("future_ts", col("ts") >= lit("2026-01-01").cast("timestamp")))
    Quality.validate(events, rules)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_dq_valid"), 0).otherwise(1)).as("invalid_rows"),
        davg(col("_dq_score")).as("avg_score"))
      .orderBy("event_type")
  }

  private val q28Sql =
    s"""SELECT event_type, count(*) AS n_rows,
       | cast(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) as bigint) AS invalid_rows,
       | ${sqlDavg("cast(1 as double) - cast(v as double)/cast(5 as double)")} AS avg_score
       |FROM (SELECT event_type,
       |        (CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
       |      + (CASE WHEN value < 0 THEN 1 ELSE 0 END)
       |      + (CASE WHEN event_type NOT IN ('click','error','purchase','signup','view') THEN 1 ELSE 0 END)
       |      + (CASE WHEN (props->>'k') IS NULL THEN 1 ELSE 0 END)
       |      + (CASE WHEN ts >= TIMESTAMP '2026-01-01' THEN 1 ELSE 0 END) AS v
       |      FROM events)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q29 — S7: MERGE upsert exposed as a query — late "updates" merged
    * over a baseline via the left-anti + union rewrite
    * (reference: etl_framework.py:635-655, delta_setup.py:636-668). */
  def mergeUpsert(events: DataFrame): DataFrame = {
    val base = events.filter(col("ts") < lit("2024-01-20").cast("timestamp"))
    val updates = events.filter(col("user_id") % 2 === 0)
      .withColumn("value", col("value") + lit(1000.0))
    Merge.upsert(base, updates, Seq("event_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  private val q29Sql =
    s"""WITH base AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-20'),
       |upd AS (SELECT event_id, ts, user_id, event_type, value + cast(1000.0 as double) AS value, props
       |        FROM events WHERE user_id % 2 = 0),
       |merged AS (
       |  SELECT * FROM base WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.event_id = base.event_id)
       |  UNION ALL SELECT * FROM upd)
       |SELECT event_type, count(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  /** q30 — S8: DELETE + UPDATE by predicate as dataframe rewrites
    * (reference: delta_setup.py:670-702). */
  def deleteUpdate(events: DataFrame): DataFrame = {
    val afterDelete = Merge.delete(events, col("event_type") === "error")
    val afterUpdate = Merge.update(afterDelete, col("value") > 150, Map("value" -> lit(0.0)))
    afterUpdate.groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"),
           max(col("value")).as("max_value"))
      .orderBy("event_type")
  }

  private val q30Sql =
    s"""SELECT event_type, count(*) AS n,
       | ${sqlDsum("CASE WHEN value > 150 THEN cast(0.0 as double) ELSE value END")} AS total_value,
       | max(CASE WHEN value > 150 THEN cast(0.0 as double) ELSE value END) AS max_value
       |FROM events WHERE event_type <> 'error' OR event_type IS NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q71 — supplier-side star rollup: supplier ⋈ nation ⋈ region
    * (broadcast dims), per-region supplier counts, account-balance
    * totals, and the negative-balance share — the supply-side health
    * view mirroring q15's customer-side star, and the one fixture table
    * no other registered query touched. */
  def supplierHealth(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        countDistinct(col("n_name")).as("n_nations"),
        dsum(col("s_acctbal")).as("total_acctbal"),
        sum(when(col("s_acctbal") < 0, 1).otherwise(0)).as("n_negative"))
      .withColumn("negative_share",
        col("n_negative").cast("double") / col("n_suppliers"))
      .orderBy("region")

  private val q71Sql =
    s"""SELECT r_name AS region, count(*) AS n_suppliers,
       | count(DISTINCT n_name) AS n_nations,
       | ${sqlDsum("s_acctbal")} AS total_acctbal,
       | cast(sum(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) as bigint) AS n_negative,
       | cast(sum(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) as double)/count(*) AS negative_share
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- registry ----

  def all: Seq[Q] = Seq(
    Q("q16_left_join_sparse",
      (s, d) => leftJoinSparse(Tables.customer(s, d), Tables.orders(s, d)), Some(q16Sql)),
    Q("q17_cross_kpi", (s, d) => crossKpi(Tables.orders(s, d)), Some(q17Sql)),
    Q("q18_cohort_equi", (s, d) => cohortEqui(Tables.orders(s, d)), Some(q18Sql)),
    Q("q19_anti_join",
      (s, d) => antiJoin(Tables.customer(s, d), Tables.orders(s, d)), Some(q19Sql)),
    Q("q20_conditional_distinct",
      (s, d) => conditionalDistinct(Tables.events(s, d)), Some(q20Sql)),
    Q("q21_conditional_counts",
      (s, d) => conditionalCounts(Tables.events(s, d)), Some(q21Sql)),
    Q("q22_histogram_buckets",
      (s, d) => histogramBuckets(Tables.events(s, d)), Some(q22Sql)),
    Q("q23_collect_set_str",
      (s, d) => collectSetStr(Tables.events(s, d)), Some(q23Sql)),
    Q("q24_string_clean",
      (s, d) => stringClean(Tables.customer(s, d)), Some(q24Sql)),
    Q("q25_json_extract",
      (s, d) => jsonExtract(Tables.events(s, d)), Some(q25Sql)),
    Q("q26_derived_flags",
      (s, d) => derivedFlags(Tables.events(s, d)), Some(q26Sql)),
    Q("q27_union_sets",
      (s, d) => unionSets(Tables.events(s, d)), Some(q27Sql)),
    Q("q28_quality_flags",
      (s, d) => qualityFlags(Tables.events(s, d)), Some(q28Sql)),
    Q("q29_merge_upsert",
      (s, d) => mergeUpsert(Tables.events(s, d)), Some(q29Sql)),
    Q("q30_delete_update",
      (s, d) => deleteUpdate(Tables.events(s, d)), Some(q30Sql)),
    Q("q71_supplier_health",
      (s, d) => supplierHealth(Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d)),
      Some(q71Sql)))
}
