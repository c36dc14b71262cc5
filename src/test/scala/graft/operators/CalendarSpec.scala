package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.analytics.Calendar

class CalendarSpec extends SparkSuite {

  test("dim spans 2020-2030 inclusive with unique keys") {
    val dim = Calendar.dimTime(spark)
    assert(dim.count() === 4018L) // 11 years incl. 3 leap days
    assert(dim.select("time_key").distinct().count() === 4018L)
    val bounds = dim.agg(min("date_value"), max("date_value")).head()
    assert(bounds.get(0).toString === "2020-01-01")
    assert(bounds.get(1).toString === "2030-12-31")
  }

  test("fiscal year/quarter and season follow the reference CASE math") {
    val dim = Calendar.dimTime(spark).filter(
      col("date_value").isin("2024-02-29", "2024-07-01", "2024-12-31"))
      .orderBy("date_value").collect()
    val feb = dim(0); val jul = dim(1); val dec = dim(2)
    assert(feb.getAs[Int]("fiscal_year") === 2024) // month <= 6 -> same year
    assert(feb.getAs[Int]("fiscal_quarter") === 1)
    assert(feb.getAs[String]("season") === "Winter")
    assert(jul.getAs[Int]("fiscal_year") === 2025) // month > 6 -> next year
    assert(jul.getAs[Int]("fiscal_quarter") === 3)
    assert(jul.getAs[String]("season") === "Summer")
    assert(dec.getAs[String]("season") === "Winter")
    assert(dec.getAs[Int]("time_key") === 20241231)
  }

  test("weekend flag uses the Sunday=1/Saturday=7 convention") {
    val dim = Calendar.dimTime(spark)
      .filter(col("date_value").isin("2024-01-06", "2024-01-07", "2024-01-08"))
      .orderBy("date_value")
      .select("day_name", "is_weekend").collect()
    assert(dim.map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
      Seq(("Saturday", true), ("Sunday", true), ("Monday", false)))
  }

  test("upsertCalendar is idempotent and only appends missing dates") {
    val full = Calendar.dimTime(spark, "2024-01-01", "2024-01-10")
    val partial = full.filter(col("day") <= 5)
    val once = Calendar.upsertCalendar(partial, full)
    assert(once.count() === 10L)
    val twice = Calendar.upsertCalendar(once, full)
    assert(twice.count() === 10L, "re-running the insert must be a no-op")
  }
}
