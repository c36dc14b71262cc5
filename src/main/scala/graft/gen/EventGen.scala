package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded, fully-distributed generator of reference-shaped
  * event fixtures (SURVEY §7.2 item 2; schemas from
  * /root/reference/data-generation/schemas.py:119-304, distributions from
  * data_generator.py:85-91 device mix, :268-282 durations, :291-292
  * Pareto content popularity).
  *
  * Pure column expressions over `spark.range` — pseudo-randomness is
  * `xxhash64(seed, key, salt)` reduced to uniforms, so the output is
  * identical for a given (seed, n) on any cluster layout, with no
  * driver-side loops and no UDFs. One session row explodes into its
  * events; playback positions are monotone within a session by
  * construction (the schemas.py:381-411 sequence invariant).
  */
object EventGen {

  /** Uniform [0,1) from a hashed key — ANSI-safe (pmod, no abs). */
  private def u(seed: Long, key: Column, salt: Int): Column =
    pmod(xxhash64(lit(seed), key, lit(salt)), lit(1000000L)).cast("double") / 1000000.0

  private def pick(uCol: Column, weighted: Seq[(String, Double)]): Column = {
    val cum = weighted.scanLeft(0.0)(_ + _._2).tail
    weighted.zip(cum).foldLeft(lit(null).cast("string")) { case (acc, ((v, _), c)) =>
      when(uCol < c && acc.isNull, v).otherwise(acc)
    }
  }

  // device mix ~ data_generator.py:85-91; platforms; tiers ~ :150
  private val deviceMix = Seq(
    "mobile" -> 0.45, "desktop" -> 0.25, "smart_tv" -> 0.15,
    "tablet" -> 0.10, "game_console" -> 0.03, "streaming_stick" -> 0.02)
  private val platformMix = Seq(
    "ios" -> 0.30, "android" -> 0.30, "web" -> 0.20, "roku" -> 0.10, "tvos" -> 0.10)
  private val tierMix = Seq(
    "free" -> 0.50, "basic" -> 0.25, "premium" -> 0.20, "enterprise" -> 0.05)
  private val countryMix = Seq(
    "US" -> 0.40, "GB" -> 0.15, "DE" -> 0.15, "IN" -> 0.15, "BR" -> 0.15)

  /** Generate `nSessions` video-watch sessions, each a `session_start`,
    * `eventsPerSession` video events with monotone playback positions
    * (seek events are forward seeks along the watch ramp), a
    * `video_complete` when the watch reached ≥95% (data_generator.py:611),
    * and always a closing `session_end`. */
  def videoSessions(spark: SparkSession, nSessions: Long,
                    eventsPerSession: Int = 8, seed: Long = 42L): DataFrame = {
    val sess = spark.range(nSessions)
      .withColumn("session_id", concat(lit("s-"), lpad(col("id").cast("string"), 10, "0")))
      .withColumn("user_id", pmod(xxhash64(lit(seed), col("id"), lit(1)), lit(10000L)))
      .withColumn("device_type", pick(u(seed, col("id"), 2), deviceMix))
      .withColumn("platform", pick(u(seed, col("id"), 3), platformMix))
      .withColumn("subscription_tier", pick(u(seed, col("id"), 4), tierMix))
      .withColumn("country", pick(u(seed, col("id"), 5), countryMix))
      // Pareto-ish content popularity (data_generator.py:291-292):
      // video k chosen with probability ∝ 1/k^~1.4
      .withColumn("video_id",
        floor(pow(u(seed, col("id"), 6) + lit(1e-6), lit(-0.7))).cast("long"))
      // duration model ~ data_generator.py:268-282 (short/mid/long form)
      .withColumn("content_duration",
        when(u(seed, col("id"), 7) < 0.5, 300)
          .when(u(seed, col("id"), 7) < 0.8, 1200).otherwise(5400))
      .withColumn("session_start_ts",
        timestamp_seconds(lit(1704067200L) +
          pmod(xxhash64(lit(seed), col("id"), lit(8)), lit(30L * 86400))))
      .withColumn("watched_frac", u(seed, col("id"), 9))

    val n = eventsPerSession
    val events = sess
      // idx 0 = session_start … idx n+1 = complete-or-last-play …
      // idx n+2 = session_end (every session closes)
      .withColumn("idx", explode(expr(s"sequence(0, ${n + 2})")))
      .withColumn("event_type",
        when(col("idx") === 0, "session_start")
          .when(col("idx") === n + 2, "session_end")
          .when(col("idx") === n + 1,
            when(col("watched_frac") >= 0.95, "video_complete").otherwise("video_pause"))
          .when(col("idx") === 1, "video_play")
          .when(u(seed, xxhash64(col("id"), col("idx")), 10) < 0.15, "video_buffer")
          .when(u(seed, xxhash64(col("id"), col("idx")), 10) < 0.25, "video_seek")
          .otherwise("video_play"))
      // monotone positions: idx/n of the watched span; a video_complete
      // tail implies position ≥ 95% of duration; session events carry no
      // position (session family has none, schemas.py:279-304)
      .withColumn("playback_position",
        when(col("idx") === 0 || col("idx") === n + 2, lit(null).cast("long"))
          .when(col("event_type") === "video_complete", col("content_duration").cast("long"))
          .when(col("idx") === n + 1,
            floor(col("content_duration") * col("watched_frac")).cast("long"))
          .otherwise(floor(col("content_duration") * col("watched_frac") *
            (col("idx").cast("double") / n)).cast("long")))
      .withColumn("event_timestamp",
        timestamp_seconds(unix_timestamp(col("session_start_ts")) + col("idx") * 30))
      .withColumn("event_id",
        md5(concat_ws(":", lit(seed), col("session_id"), col("idx"))))
      .withColumn("device_id", concat(lit("d-"), pmod(col("user_id"), lit(3L))))
      .withColumn("app_version", lit("4.1.2"))
    // types conform to graft.core.Schemas (string ids, int positions —
    // schemas.py serializes UUIDs/ids as strings) so output zips with the
    // declared StructTypes without caller-side casts
    events.select(
      col("event_id"), col("event_type"), col("event_timestamp"),
      col("user_id").cast("string").as("user_id"), col("session_id"),
      col("device_id"), col("device_type"), col("platform"),
      col("subscription_tier"), col("country"), col("app_version"),
      col("video_id").cast("string").as("video_id"),
      col("content_duration").cast("int").as("content_duration"),
      col("playback_position").cast("int").as("playback_position"))
  }

  /** Ad events with the reference's rates: every impression, ~2% CTR,
    * ~15% skip (data_generator.py:714-733). */
  def adEvents(spark: SparkSession, nImpressions: Long, seed: Long = 42L): DataFrame = {
    val base = spark.range(nImpressions)
      .withColumn("ad_id", concat(lit("ad-"), pmod(col("id"), lit(500L))))
      .withColumn("user_id", pmod(xxhash64(lit(seed), col("id"), lit(20)), lit(10000L)))
      .withColumn("ad_type",
        pick(u(seed, col("id"), 21), Seq("pre_roll" -> 0.5, "mid_roll" -> 0.35, "banner" -> 0.15)))
      .withColumn("ad_duration", when(u(seed, col("id"), 22) < 0.6, 15).otherwise(30))
      .withColumn("event_timestamp",
        timestamp_seconds(lit(1704067200L) +
          pmod(xxhash64(lit(seed), col("id"), lit(23)), lit(30L * 86400))))
      .withColumn("u_click", u(seed, col("id"), 24))
      .withColumn("u_skip", u(seed, col("id"), 25))
    val impressions = base.withColumn("event_type", lit("ad_impression"))
    val clicks = base.filter(col("u_click") < 0.02).withColumn("event_type", lit("ad_click"))
    val skips = base.filter(col("u_click") >= 0.02 && col("u_skip") < 0.15)
      .withColumn("event_type", lit("ad_skip"))
    val completes = base.filter(col("u_click") >= 0.02 && col("u_skip") >= 0.15)
      .withColumn("event_type", lit("ad_complete"))
    impressions.unionByName(clicks).unionByName(skips).unionByName(completes)
      .withColumn("event_id", md5(concat_ws(":", lit(seed), col("id"), col("event_type"))))
      .select("event_id", "event_type", "event_timestamp", "user_id",
        "ad_id", "ad_type", "ad_duration")
  }
}
