package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._

/** The medallion lakehouse pipeline (reference: §3.1/§3.2 —
  * real_time_streaming.py stage chain, delta_setup.py:120-388 layer
  * schemas, etl_framework.py:412-488 job phases), over engine-managed
  * partitioned parquet.
  *
  * Layers are decoupled through storage exactly like the reference's
  * Delta hops: each layer's directory is the next stage's (batch or
  * file-stream) source. The transformations are pure DataFrame →
  * DataFrame so the same code runs batch and streaming.
  */
object Medallion {

  final case class Layout(root: String) {
    val raw = s"$root/raw"
    val bronze = s"$root/bronze"
    val silverSessions = s"$root/silver_sessions"
    val goldDaily = s"$root/gold_daily_user_metrics"
    val quarantine = s"$root/quarantine"
  }

  /** Raw → bronze: validate, quarantine invalid rows, dedup-keep-latest
    * (reference bronze build: real_time_streaming.py:226-252 +
    * etl_framework.py:429-441). Returns (bronze, quarantined). */
  def toBronze(raw: DataFrame): (DataFrame, DataFrame) = {
    val rules = Seq(
      Quality.Rule("null_user", col("user_id").isNull),
      Quality.Rule("null_ts", col("ts").isNull),
      Quality.Rule("neg_value", col("value") < 0))
    // the quarantine side carries the DLQ error-context envelope
    // (consumer.py:167-203): tags, source, quarantined-at timestamp
    val (clean, quarantined) =
      Quality.quarantineWithContext(Quality.validate(raw, rules), "events_raw")
    val deduped = Dedup.keepLatest(
      clean.drop("_dq_errors", "_dq_valid", "_dq_score"),
      Seq("event_id"), Seq(col("ts"), col("event_id")))
    (deduped, quarantined)
  }

  /** Bronze → silver: per-user-day session rollup
    * (reference: etl_framework.py:606-629 silver_video_sessions). */
  def toSilverSessions(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("day", to_date(col("ts")))
      .groupBy("user_id", "day")
      .agg(
        min(unix_timestamp(col("ts"))).as("first_ts_s"),
        max(unix_timestamp(col("ts"))).as("last_ts_s"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("uniq_types"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
        davg(col("value")).as("avg_value"))

  /** Silver → gold: daily user metrics with the reference's collect_set
    * array columns (delta_setup.py:366-386, device_types/countries →
    * here the event-type set), emitted sorted for determinism. */
  def toGoldDaily(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("day", to_date(col("ts")))
      .groupBy("user_id", "day")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("uniq_types"),
        array_join(sort_array(collect_set(col("event_type"))), ",").as("event_types"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
        dsum(col("value")).as("total_value"),
        min(unix_timestamp(col("ts"))).as("first_ts_s"),
        max(unix_timestamp(col("ts"))).as("last_ts_s"))
      .withColumn("engagement_score",
        col("n_events").cast("double") * 0.3 + col("uniq_types").cast("double") * 0.7)

  /** Batch run of the whole pipeline onto disk; returns per-layer row
    * counts. Raw is written time-partitioned so every downstream
    * date-filtered read gets partition pruning. */
  def runBatch(spark: SparkSession, events: DataFrame, layout: Layout): Map[String, Long] = {
    graft.sources.Writers.writePartitioned(events, "ts", layout.raw, SaveMode.Overwrite)
    val raw = spark.read.parquet(layout.raw).drop("year", "month", "day")
    val (bronze, quarantined) = toBronze(raw)
    bronze.write.mode(SaveMode.Overwrite).parquet(layout.bronze)
    quarantined.write.mode(SaveMode.Overwrite).parquet(layout.quarantine)
    val bronzeDf = spark.read.parquet(layout.bronze)
    toSilverSessions(bronzeDf).write.mode(SaveMode.Overwrite).parquet(layout.silverSessions)
    toGoldDaily(bronzeDf).write.mode(SaveMode.Overwrite).parquet(layout.goldDaily)
    Map(
      "raw" -> spark.read.parquet(layout.raw).count(),
      "bronze" -> bronzeDf.count(),
      "quarantine" -> spark.read.parquet(layout.quarantine).count(),
      "silver_sessions" -> spark.read.parquet(layout.silverSessions).count(),
      "gold_daily" -> spark.read.parquet(layout.goldDaily).count())
  }
}
