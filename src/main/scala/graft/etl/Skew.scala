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

  // q80 runs on a memoized session CLONE (the StreamingOracle gate-
  // session pattern): broadcast joins disabled so the skewed join
  // actually sort-merges, and the AQE skew thresholds sized to the
  // fixture (production defaults are 256 MB partitions — harness
  // sizing, not semantics; at 100 TB you keep the defaults). The
  // caller's session never sees these knobs.
  private def skewSession(
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    graft.SessionClones.cloned("aqe-skew-gate", spark) { s =>
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2048")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1024")
    }

  /** q80 — the SAME hot-key join problem as q50, solved by AQE's
    * `OptimizeSkewedJoin` instead of manual salting: four of the five
    * event types collapse to one derived key, so ~80% of the fact lands
    * in a single shuffle partition that would pin its reducer for the
    * whole stage. With broadcast disabled (the 100 TB case — both sides
    * too big), AQE observes the finished map stage, splits the
    * oversized partitions into advisory-sized chunks, and duplicates
    * the matching build-side partition per chunk —
    * `SortMergeJoin(skew=true)` + `AQEShuffleRead ... skewed` in the
    * final plan (PlanSpec pins both). The build side must be a plain
    * shuffled relation (a literal dim, like q50's): `OptimizeSkewedJoin`
    * duplicates shuffle-READ partitions, so an aggregate between the
    * join and the build-side shuffle (e.g. a distinct-derived dim)
    * makes the join ineligible — a real planning constraint worth
    * pinning. The DuckDB oracle replays the PLAIN join: the hash match
    * proves the runtime re-plan is invisible in the result, completing
    * the skew triptych — q49 salted agg, q50 salted join (explicit
    * tools), q80 the optimizer doing it for you. */
  def aqeSkewJoinStats(spark: org.apache.spark.sql.SparkSession,
                       sfDir: String): DataFrame = {
    val s = skewSession(spark)
    import s.implicits._
    // AQE splits a skewed reduce partition at MAP-OUTPUT boundaries, and
    // the single-file fixture scans as ONE map task — an unsplittable
    // hot partition. The round-robin repartition restores the
    // multi-mapper reality of any production scan (a 100 TB fact has
    // thousands of mappers; this is fixture shaping, not semantics).
    val keyed = Tables.events(s, sfDir).repartition(32).select(
      when(col("event_type") === "error", lit("error"))
        .otherwise(lit("hot")).as("k"),
      col("value").cast("decimal(18,6)").as("v"))
    val dim = Seq(("hot", "bulk"), ("error", "fault")).toDF("k", "k_class")
    keyed.join(dim, Seq("k"))
      .groupBy("k_class")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("total_value"))
      .orderBy("k_class")
  }

  private val q80Sql =
    """WITH f AS (SELECT CASE WHEN event_type = 'error' THEN 'error'
      |                       ELSE 'hot' END AS k,
      |                  cast(value as decimal(18,6)) AS v FROM events)
      |SELECT k_class, count(*) AS n_events, cast(sum(v) as double) AS total_value
      |FROM f JOIN (VALUES ('hot', 'bulk'), ('error', 'fault')) AS d(k, k_class)
      |  USING (k)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q49_salted_agg", (s, d) => saltedAggStats(Tables.events(s, d)), Some(q49Sql)),
    Q("q50_salted_join", (s, d) => saltedJoinStats(s, Tables.events(s, d)), Some(q50Sql)),
    Q("q80_aqe_skew_join", (s, d) => aqeSkewJoinStats(s, d), Some(q80Sql)))
}
