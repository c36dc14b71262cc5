package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.etl.Ingest

class SchemasSpec extends SparkSuite {
  import spark.implicits._

  test("JSON wire round-trip: struct → to_json → from_json star-expand keeps values") {
    // build reference-shaped video events from the generator, serialize
    // to the JSON wire format, and re-ingest through the P1 parse path
    // (generator output types conform to Schemas directly — no casts)
    val gen = graft.gen.EventGen.videoSessions(spark, 50)
      .filter(col("event_type").startsWith("video_"))
      .select("event_id", "event_type", "event_timestamp", "user_id",
        "session_id", "device_id", "device_type", "platform", "app_version",
        "video_id", "content_duration", "playback_position")

    val wire = gen.select(
      col("event_id").as("k"),
      to_json(struct(gen.columns.map(col).toIndexedSeq: _*)).as("raw_data"))

    val parsed = Ingest.parseJson(wire, "raw_data", Schemas.videoEvent, keep = Seq("k"))
    assert(parsed.count() === gen.count())
    // every envelope + video field from the schema is present
    Schemas.videoEvent.fields.foreach(f => assert(parsed.columns.contains(f.name)))
    // spot-check a value survives the round trip
    val before = gen.orderBy("event_id").select("playback_position").as[Int].collect()
    val after = parsed.orderBy("event_id").select("playback_position")
      .collect().map(_.getInt(0))
    assert(before.toSeq === after.toSeq)
  }

  test("topic routing follows the reference's prefix rules") {
    assert(Schemas.topicFor("video_play") === "video_events")
    assert(Schemas.topicFor("user_like") === "user_interactions")
    assert(Schemas.topicFor("ad_click") === "ad_events")
    assert(Schemas.topicFor("session_start") === "session_events")
    assert(Schemas.topicFor("device_change") === "session_events")
  }
}
