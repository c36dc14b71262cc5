package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Skew-mitigation utilities (SURVEY §4 — the reference delegates skew to
  * AQE; these are the explicit tools for when a hot key defeats even
  * AQE's skew-split, e.g. a power-law user or a null-heavy join key).
  */
object Skew {

  /** Two-phase salted aggregation: spread each hot group over `saltBuckets`
    * partial groups, aggregate, then merge. Correct for decomposable
    * aggregates (sum/count/min/max). The partial pass gets map-side
    * combine on (key, salt); the merge pass groups only #keys×salt rows.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** Salted broadcast-side replication for a skewed join: explode the
    * small side `saltBuckets`× with a salt column, salt the big side's
    * key row-wise, join on (key, salt). Distributes one hot key across
    * `saltBuckets` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }

  /** q49 — the salted two-phase aggregation under the oracle gate:
    * per-event-type totals over the fixture's power-law type column
    * (a handful of values over every row — exactly the shape that melts
    * a single reducer at 100 TB), computed through [[saltedSumCount]]
    * and oracle-compared against a PLAIN one-shot GROUP BY in DuckDB.
    * The hash match IS the proof that salting is a pure execution-shape
    * rewrite. The value rides the Det decimal accumulator through both
    * phases, so the two-level re-association cannot drift a ULP. */
  def saltedAggStats(events: DataFrame): DataFrame = {
    val prepared = events.select(col("event_type"),
      col("value").cast("decimal(18,6)").as("v"))
    saltedSumCount(prepared, Seq("event_type"), "v")
      .select(col("event_type"),
        col("sum_v").cast("double").as("total_value"),
        col("cnt"))
      .orderBy(asc_nulls_last("event_type"))
  }

  private val q49Sql =
    """SELECT event_type,
      | cast(sum(cast(value as decimal(18,6))) as double) AS total_value,
      | count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** q50 — the salted skewed JOIN under the oracle gate: every events
    * row carries one of five hot key values (the worst-case join skew —
    * a handful of keys owning the whole fact), joined to a tiny category
    * dim through [[saltedJoin]] (dim exploded 16×, fact salted row-wise,
    * equi-join on (key, salt)) and rolled up per category. The DuckDB
    * oracle runs the PLAIN inner join — the hash match proves the salt
    * column is invisible in the result, like q49 does for aggregation. */
  def saltedJoinStats(spark: org.apache.spark.sql.SparkSession,
                      events: DataFrame): DataFrame = {
    import spark.implicits._
    val dim = Seq(
      ("view", "passive"), ("click", "engagement"), ("purchase", "conversion"),
      ("signup", "conversion"), ("error", "fault"))
      .toDF("event_type", "category")
    val fact = events.select(col("event_type"),
      col("value").cast("decimal(18,6)").as("v"))
    saltedJoin(fact, dim, "event_type")
      .groupBy("category")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("total_value"))
      .orderBy("category")
  }

  private val q50Sql =
    """SELECT category, count(*) AS n_events,
      | cast(sum(cast(value as decimal(18,6))) as double) AS total_value
      |FROM events e JOIN (VALUES
      |  ('view','passive'), ('click','engagement'), ('purchase','conversion'),
      |  ('signup','conversion'), ('error','fault')) AS d(event_type, category)
      |  ON e.event_type = d.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q49_salted_agg", (s, d) => saltedAggStats(Tables.events(s, d)), Some(q49Sql)),
    Q("q50_salted_join", (s, d) => saltedJoinStats(s, Tables.events(s, d)), Some(q50Sql)))
}
