package graft.core

import org.apache.spark.sql.types._

/** The reference's event data model as explicit Spark StructTypes
  * (SURVEY §1; reference: schemas.py:119-304 Pydantic models,
  * delta_setup.py:120-388 Delta DDL). Wire format is row-oriented JSON
  * with these fields; UUIDs and enums serialize as strings, datetimes as
  * timestamps (schemas.py:152).
  */
object Schemas {

  /** Common envelope, every event family (schemas.py:119-152). */
  val envelope: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("event_timestamp", TimestampType, nullable = false),
    StructField("user_id", StringType),
    StructField("session_id", StringType, nullable = false),
    StructField("device_id", StringType, nullable = false),
    StructField("ip_address", StringType),
    StructField("user_agent", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("city", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("device_type", StringType),
    StructField("platform", StringType),
    StructField("app_version", StringType),
    StructField("referrer", StringType),
    StructField("campaign_id", StringType),
    StructField("ab_test_variant", StringType)))

  private def extend(extra: Seq[StructField]): StructType =
    StructType(envelope.fields ++ extra)

  /** video_events (schemas.py:155-206; delta_setup.py:139-201). */
  val videoEvent: StructType = extend(Seq(
    StructField("video_id", StringType),
    StructField("content_title", StringType),
    StructField("content_type", StringType),
    StructField("content_duration", IntegerType),
    StructField("content_genre", StringType),
    StructField("playback_position", IntegerType),
    StructField("video_quality", StringType),
    StructField("buffer_duration", DoubleType),
    StructField("startup_time", DoubleType),
    StructField("bitrate", IntegerType),
    StructField("dropped_frames", IntegerType),
    StructField("bandwidth", DoubleType),
    StructField("error_code", StringType),
    StructField("error_message", StringType),
    StructField("seek_from_position", IntegerType),
    StructField("seek_to_position", IntegerType)))

  /** user_interactions (schemas.py:209-239; delta_setup.py:204-244). */
  val userInteraction: StructType = extend(Seq(
    StructField("content_id", StringType),
    StructField("content_type", StringType),
    StructField("interaction_context", StringType),
    StructField("comment_text", StringType),
    StructField("share_platform", StringType),
    StructField("subscription_tier", StringType)))

  /** ad_events (schemas.py:242-276; delta_setup.py:247-295). */
  val adEvent: StructType = extend(Seq(
    StructField("ad_id", StringType),
    StructField("ad_type", StringType),
    StructField("ad_duration", IntegerType),
    StructField("ad_position", IntegerType),
    StructField("content_id", StringType),
    StructField("view_duration", IntegerType),
    StructField("skip_position", IntegerType),
    StructField("click_position", IntegerType),
    StructField("ad_price", DoubleType),
    StructField("currency", StringType),
    StructField("error_code", StringType)))

  /** session_events (schemas.py:279-304; delta_setup.py:298-338). */
  val sessionEvent: StructType = extend(Seq(
    StructField("session_duration", IntegerType),
    StructField("page_views", IntegerType),
    StructField("videos_watched", IntegerType),
    StructField("subscription_tier", StringType),
    StructField("previous_device_id", StringType),
    StructField("app_crashes", IntegerType),
    StructField("network_errors", IntegerType)))

  /** Raw-layer envelope with Kafka provenance + the original JSON
    * (delta_setup.py:125-135). */
  val rawEnvelope: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("event_timestamp", TimestampType),
    StructField("ingestion_timestamp", TimestampType),
    StructField("source_topic", StringType),
    StructField("source_partition", IntegerType),
    StructField("source_offset", LongType),
    StructField("raw_data", StringType),
    StructField("processing_metadata", MapType(StringType, StringType))))

  /** Topic routing by event-type prefix (producer.py:532-538). */
  def topicFor(eventType: String): String = eventType match {
    case t if t.startsWith("video_")   => "video_events"
    case t if t.startsWith("user_")    => "user_interactions"
    case t if t.startsWith("ad_")      => "ad_events"
    case _                             => "session_events"
  }

  /** Enum domains (schemas.py:51-116). */
  val deviceTypes = Seq("mobile", "desktop", "smart_tv", "tablet", "game_console", "streaming_stick")
  val subscriptionTiers = Seq("free", "basic", "premium", "enterprise")
  val videoEventTypes = Seq("video_play", "video_pause", "video_stop", "video_seek",
    "video_buffer", "video_error", "video_quality_change", "video_complete")
}
