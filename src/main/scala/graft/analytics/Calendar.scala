package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DIM_TIME calendar dimension (reference: snowflake_pipeline.py:255-345)
  * — a `spark.range`-generated date spine with the full attribute set,
  * fiscal-year/season CASE math (:330-340), and the idempotent anti-join
  * insert (:342). Fully distributed: no driver-side date loop; every
  * column is a pure function of `date_value`, so the dim is trivially
  * reproducible on any engine.
  *
  * Cross-engine pinning (SURVEY §7.5 risk 4): `week` is ISO week
  * (Spark/DuckDB `weekofyear`), `day_of_week` is the reference's
  * Sunday=1..Saturday=7 convention (Spark's native `dayofweek`; the
  * oracle shifts DuckDB's Sunday=0 by one), and month/day names are
  * explicit lookups rather than locale-dependent formats.
  */
object Calendar {

  private val monthNames = Seq("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")
  private val dayNames = Seq("Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday")

  /** The 2020-2030 date spine with the reference's full attribute set. */
  def dimTime(spark: SparkSession,
              start: String = "2020-01-01",
              end: String = "2030-12-31"): DataFrame = {
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)) + 1
    val m = col("month")
    spark.range(nDays)
      .select(date_add(lit(start).cast("date"), col("id").cast("int")).as("date_value"))
      .withColumn("year", year(col("date_value")))
      .withColumn("quarter", quarter(col("date_value")))
      .withColumn("month", month(col("date_value")))
      .withColumn("day", dayofmonth(col("date_value")))
      .withColumn("time_key", col("year") * 10000 + m * 100 + col("day"))
      .withColumn("month_name",
        element_at(array(monthNames.map(lit): _*), m))
      .withColumn("week", weekofyear(col("date_value")))
      .withColumn("day_name",
        element_at(array(dayNames.map(lit): _*), dayofweek(col("date_value"))))
      .withColumn("day_of_week", dayofweek(col("date_value")))
      .withColumn("day_of_year", dayofyear(col("date_value")))
      .withColumn("is_weekend", col("day_of_week").isin(1, 7))
      .withColumn("is_holiday", lit(false))
      .withColumn("fiscal_year", when(m <= 6, col("year")).otherwise(col("year") + 1))
      .withColumn("fiscal_quarter",
        when(m <= 3, 1).when(m <= 6, 2).when(m <= 9, 3).otherwise(4))
      .withColumn("season",
        when(m.isin(12, 1, 2), "Winter")
          .when(m.isin(3, 4, 5), "Spring")
          .when(m.isin(6, 7, 8), "Summer")
          .otherwise("Fall"))
      .select("time_key", "date_value", "year", "quarter", "month", "month_name",
        "week", "day", "day_name", "day_of_week", "day_of_year", "is_weekend",
        "is_holiday", "fiscal_year", "fiscal_quarter", "season")
  }

  /** Idempotent calendar insert (J7; reference :342 `WHERE date_value NOT
    * IN (SELECT date_value FROM DIM_TIME)`): only spine dates missing
    * from the existing dim are appended — re-running is a no-op. */
  def upsertCalendar(existing: DataFrame, spine: DataFrame): DataFrame =
    existing.unionByName(
      spine.join(existing.select("date_value"), Seq("date_value"), "left_anti"))

  /** q43 — the calendar dim itself as a registered, oracle-exact query. */
  def calendarDim(spark: SparkSession): DataFrame =
    dimTime(spark).orderBy("date_value")

  /** v13 — V_DAILY_ACTIVE_USERS rejoined through DIM_TIME: per-day DAU
    * carrying the calendar attributes (day_name/weekend/fiscal/season).
    * The 4,018-row dim broadcasts; the fact side aggregates after one
    * shuffle — the standard star-join shape at any scale. */
  private val v13Body =
    """SELECT d.date_value AS day, d.day_name, d.is_weekend, d.fiscal_quarter, d.season,
      | count(DISTINCT user_id) AS dau,
      | count(*) AS total_events,
      | cast(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) as bigint) AS purchases
      |FROM events e JOIN dim_time d ON cast(e.ts as date) = d.date_value
      |GROUP BY 1,2,3,4,5 ORDER BY 1""".stripMargin

  def dauCalendar(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.table(spark, sfDir, "events").createOrReplaceTempView("events")
    dimTime(spark).createOrReplaceTempView("dim_time")
    spark.sql(v13Body)
  }

  // DuckDB rendering of the dim, shared by the q43 oracle and the v13
  // oracle's inlined CTE.
  private lazy val dimDuckSql: String = {
    val mn = "CASE month(date_value) " + monthNames.zipWithIndex
      .map { case (n, i) => s"WHEN ${i + 1} THEN '$n'" }.mkString(" ") + " END"
    val dn = "CASE dayofweek(date_value) " + dayNames.zipWithIndex
      .map { case (n, i) => s"WHEN $i THEN '$n'" }.mkString(" ") + " END"
    s"""WITH spine AS (
       |  SELECT cast(unnest(generate_series(DATE '2020-01-01', DATE '2030-12-31', INTERVAL 1 DAY)) as date) AS date_value)
       |SELECT
       |  cast(year(date_value)*10000 + month(date_value)*100 + day(date_value) as int) AS time_key,
       |  date_value,
       |  cast(year(date_value) as int) AS year,
       |  cast(quarter(date_value) as int) AS quarter,
       |  cast(month(date_value) as int) AS month,
       |  $mn AS month_name,
       |  cast(weekofyear(date_value) as int) AS week,
       |  cast(day(date_value) as int) AS day,
       |  $dn AS day_name,
       |  cast(dayofweek(date_value) + 1 as int) AS day_of_week,
       |  cast(dayofyear(date_value) as int) AS day_of_year,
       |  dayofweek(date_value) + 1 IN (1, 7) AS is_weekend,
       |  false AS is_holiday,
       |  cast(CASE WHEN month(date_value) <= 6 THEN year(date_value) ELSE year(date_value) + 1 END as int) AS fiscal_year,
       |  cast(CASE WHEN month(date_value) <= 3 THEN 1 WHEN month(date_value) <= 6 THEN 2
       |            WHEN month(date_value) <= 9 THEN 3 ELSE 4 END as int) AS fiscal_quarter,
       |  CASE WHEN month(date_value) IN (12, 1, 2) THEN 'Winter'
       |       WHEN month(date_value) IN (3, 4, 5) THEN 'Spring'
       |       WHEN month(date_value) IN (6, 7, 8) THEN 'Summer'
       |       ELSE 'Fall' END AS season
       |FROM spine""".stripMargin
  }

  lazy val q43Sql: String = dimDuckSql + " ORDER BY date_value"

  /** v13 oracle: the same join/rollup with the dim inlined as a CTE —
    * DuckDB reproduces the dim itself, not just the join. */
  private lazy val v13Sql =
    s"""WITH dim_time AS (
       |$dimDuckSql)
       |$v13Body""".stripMargin

  def all: Seq[graft.Q] = Seq(
    graft.Q("q43_calendar_dim", (s, _) => calendarDim(s), Some(q43Sql)),
    graft.Q("v13_dau_calendar", (s, d) => dauCalendar(s, d), Some(v13Sql)))
}
