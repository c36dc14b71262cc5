package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.core.Schemas
import graft.functions.Det._

/** The reference's 4-family event taxonomy exercised end-to-end: raw JSON
  * envelope → `from_json` parse → `topicFor` routing → per-family bronze
  * (reference: real_time_streaming.py:226-252 per-topic bronze split,
  * producer.py:532-538 prefix routing, topics.py:599-663 per-topic schema
  * validation).
  *
  * Two registered oracle-exact queries prove the wire round-trip: the
  * Spark side serializes every event THROUGH JSON and parses it back with
  * the family schema before aggregating, while the DuckDB oracle computes
  * the same rollup directly from the source columns — any field the
  * parse dropped or mangled breaks the hash compare.
  */
object Taxonomy {

  /** Column-level mirror of [[Schemas.topicFor]] (prefix routing). */
  def topicForCol(eventType: Column): Column =
    when(eventType.startsWith("video_"), "video_events")
      .when(eventType.startsWith("user_"), "user_interactions")
      .when(eventType.startsWith("ad_"), "ad_events")
      .otherwise("session_events")

  /** Driver-fixture event_type → a representative taxonomy type in each
    * of the four families (so the 5-type fixture exercises all topics). */
  private def taxonomyType(c: Column): Column =
    when(c === "view", "video_play")
      .when(c === "error", "video_error")
      .when(c === "click", "user_like")
      .when(c === "purchase", "ad_click")
      .otherwise("session_start") // signup

  // device_type derivation used by the conformance check: negative-value
  // rows map OUT of the enum domain (the reference's invalid-event shape)
  private def deviceTypeCol: Column =
    when(col("value") < 0, "unknown")
      .when(col("value") < 100, "mobile")
      .otherwise("desktop")

  private val payloadSchema = StructType(Seq(
    StructField("user_id", StringType),
    StructField("session_id", StringType),
    StructField("device_type", StringType),
    StructField("playback_position", LongType),
    StructField("content_id", StringType),
    StructField("ad_price", DoubleType),
    StructField("session_duration", LongType)))

  /** events fixture → raw wire envelope: taxonomy event type, prefix-routed
    * topic, and the family payload serialized to a JSON string
    * (delta_setup.py:125-135 raw_data column). */
  def toRawEnvelope(events: DataFrame): DataFrame = {
    val etype = taxonomyType(col("event_type"))
    val payload = struct(
      col("user_id").cast("string").as("user_id"),
      col("user_id").cast("string").as("session_id"),
      deviceTypeCol.as("device_type"),
      when(etype.startsWith("video_"), floor(col("value"))).as("playback_position"),
      when(etype === "user_like", concat(lit("c-"), col("user_id"))).as("content_id"),
      when(etype.startsWith("ad_"), col("value")).as("ad_price"),
      when(etype === "session_start", floor(col("value"))).as("session_duration"))
    events.select(
      col("event_id").cast("string").as("event_id"),
      etype.as("event_type"),
      col("ts").as("event_timestamp"),
      topicForCol(etype).as("source_topic"),
      to_json(payload).as("raw_data"))
  }

  /** P1 over the envelope: parse raw_data back with the payload schema
    * and star-expand next to the envelope columns. */
  def parseRouted(raw: DataFrame): DataFrame =
    raw.select(col("event_id"), col("event_type"), col("event_timestamp"),
        col("source_topic"), from_json(col("raw_data"), payloadSchema).as("p"))
      .select(col("event_id"), col("event_type"), col("event_timestamp"),
        col("source_topic"), col("p.*"))

  /** Generic per-topic bronze split for reference-shaped frames (used by
    * the EventGen end-to-end spec with the full family StructTypes). */
  def wrapEnvelope(events: DataFrame, tsCol: String = "event_timestamp"): DataFrame =
    events.select(
      col("event_id"), col("event_type"), col(tsCol).as("event_timestamp"),
      topicForCol(col("event_type")).as("source_topic"),
      to_json(struct(events.columns.map(col).toIndexedSeq: _*)).as("raw_data"))

  def bronzeFor(raw: DataFrame, topic: String, schema: StructType): DataFrame =
    raw.filter(col("source_topic") === topic)
      .select(from_json(col("raw_data"), schema).as("e"))
      .select(col("e.*"))

  /** q44 — raw→parse→route round-trip rollup: per (topic, type) counts
    * plus a per-family payload checksum that only survives if the
    * family-specific field made it through the JSON wire intact. */
  def familyRouting(events: DataFrame): DataFrame =
    parseRouted(toRawEnvelope(events))
      .withColumn("payload_checksum", coalesce(
        col("playback_position"),
        col("session_duration"),
        floor(col("ad_price")),
        length(col("content_id")).cast("long")))
      .groupBy("source_topic", "event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("uniq_users"),
        sum(col("payload_checksum")).as("checksum_sum"))
      .orderBy("source_topic", "event_type")

  // The oracle maps types/topics with the same CASE math and derives each
  // family's checksum directly from `value`/`user_id` — no JSON involved,
  // so it independently checks the Spark side's wire round-trip.
  private val q44Sql =
    """WITH m AS (
      |  SELECT CASE event_type WHEN 'view' THEN 'video_play' WHEN 'error' THEN 'video_error'
      |              WHEN 'click' THEN 'user_like' WHEN 'purchase' THEN 'ad_click'
      |              ELSE 'session_start' END AS event_type,
      |         user_id, value FROM events),
      |r AS (
      |  SELECT CASE event_type WHEN 'video_play' THEN 'video_events'
      |              WHEN 'video_error' THEN 'video_events'
      |              WHEN 'user_like' THEN 'user_interactions'
      |              WHEN 'ad_click' THEN 'ad_events'
      |              ELSE 'session_events' END AS source_topic,
      |         event_type, user_id,
      |         CASE WHEN event_type IN ('video_play', 'video_error', 'session_start', 'ad_click')
      |              THEN cast(floor(value) as bigint)
      |              ELSE cast(2 + length(cast(user_id as varchar)) as bigint) END AS payload_checksum
      |  FROM m)
      |SELECT source_topic, event_type, count(*) AS n,
      |  count(DISTINCT user_id) AS uniq_users,
      |  cast(sum(payload_checksum) as bigint) AS checksum_sum
      |FROM r GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** q45 — schema-conformance validation driven from declared StructTypes
    * (topics.py:599-663): required-field + enum-domain rules derived
    * mechanically by [[Quality.rulesFromSchema]], rolled up per topic. */
  def schemaConformance(events: DataFrame): DataFrame = {
    val conformSchema = StructType(Seq(
      StructField("event_id", StringType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("event_timestamp", TimestampType, nullable = false),
      StructField("session_id", StringType, nullable = false)))
    val rules = Quality.rulesFromSchema(conformSchema,
      Map("device_type" -> Schemas.deviceTypes))
    Quality.validate(parseRouted(toRawEnvelope(events)), rules)
      .groupBy("source_topic")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_dq_valid"), 1).otherwise(0)).as("n_valid"),
        sum(when(col("_dq_errors").contains("null_session_id"), 1).otherwise(0)).as("null_session"),
        sum(when(col("_dq_errors").contains("domain_device_type"), 1).otherwise(0)).as("bad_device"),
        davg(col("_dq_score")).as("avg_score"))
      .orderBy("source_topic")

  }

  // 5 derived rules (4 required fields + 1 enum domain); only session_id
  // (null user) and device_type ('unknown' for negative values) can fire
  // on the fixture, so the oracle scores 1 - violations/5 directly.
  private val q45Sql = {
    val score = "cast(1.0 as double) - cast(v_null + v_dom as double)/cast(5.0 as double)"
    s"""WITH m AS (
       |  SELECT CASE event_type WHEN 'view' THEN 'video_play' WHEN 'error' THEN 'video_error'
       |              WHEN 'click' THEN 'user_like' WHEN 'purchase' THEN 'ad_click'
       |              ELSE 'session_start' END AS event_type,
       |         user_id, value FROM events),
       |r AS (
       |  SELECT CASE event_type WHEN 'video_play' THEN 'video_events'
       |              WHEN 'video_error' THEN 'video_events'
       |              WHEN 'user_like' THEN 'user_interactions'
       |              WHEN 'ad_click' THEN 'ad_events'
       |              ELSE 'session_events' END AS source_topic,
       |         CASE WHEN user_id IS NULL THEN 1 ELSE 0 END AS v_null,
       |         CASE WHEN (CASE WHEN value < 0 THEN 'unknown'
       |                         WHEN value < 100 THEN 'mobile'
       |                         ELSE 'desktop' END)
       |              NOT IN (${Schemas.deviceTypes.map("'" + _ + "'").mkString(", ")})
       |              THEN 1 ELSE 0 END AS v_dom
       |  FROM m)
       |SELECT source_topic, count(*) AS n,
       |  cast(sum(CASE WHEN v_null + v_dom = 0 THEN 1 ELSE 0 END) as bigint) AS n_valid,
       |  cast(sum(v_null) as bigint) AS null_session,
       |  cast(sum(v_dom) as bigint) AS bad_device,
       |  ${sqlDavg(score)} AS avg_score
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q44_family_routing", (s, d) => familyRouting(Tables.events(s, d)), Some(q44Sql)),
    Q("q45_schema_conformance", (s, d) => schemaConformance(Tables.events(s, d)), Some(q45Sql)))
}
