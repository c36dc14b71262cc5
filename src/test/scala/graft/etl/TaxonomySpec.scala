package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Schemas
import graft.gen.EventGen

/** The reference's core pipeline shape end-to-end over reference-shaped
  * fixtures: EventGen events → raw JSON envelope → topicFor routing →
  * per-family bronze (from_json with the declared family StructTypes) →
  * family gold, asserting per-family row conservation and that
  * family-specific columns survive to gold
  * (reference: real_time_streaming.py:226-252). */
class TaxonomySpec extends SparkSuite {
  import spark.implicits._

  private lazy val video = EventGen.videoSessions(spark, nSessions = 40)
  private lazy val ads = EventGen.adEvents(spark, nImpressions = 200)

  private lazy val raw =
    Taxonomy.wrapEnvelope(video).unionByName(Taxonomy.wrapEnvelope(ads))

  test("routing conserves rows per family across the JSON wire") {
    val rawByTopic = raw.groupBy("source_topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected straight from the generators, before any wrapping
    val expected = video.unionByName(ads, allowMissingColumns = true)
      .groupBy(Taxonomy.topicForCol(col("event_type")).as("t")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rawByTopic === expected)
    assert(rawByTopic.keySet === Set("video_events", "user_interactions",
      "ad_events", "session_events") -- (if (rawByTopic.contains("user_interactions")) Nil
                                         else Seq("user_interactions")))

    // every family bronze holds exactly its routed rows — none lost in parse
    val bronzeCounts = Map(
      "video_events" -> Taxonomy.bronzeFor(raw, "video_events", Schemas.videoEvent).count(),
      "ad_events" -> Taxonomy.bronzeFor(raw, "ad_events", Schemas.adEvent).count(),
      "session_events" -> Taxonomy.bronzeFor(raw, "session_events", Schemas.sessionEvent).count())
    bronzeCounts.foreach { case (topic, n) =>
      assert(n === rawByTopic.getOrElse(topic, 0L), s"row loss in $topic bronze")
    }
    assert(bronzeCounts.values.sum + rawByTopic.getOrElse("user_interactions", 0L)
      === raw.count())
  }

  test("family-specific columns survive raw -> bronze -> gold") {
    val videoBronze = Taxonomy.bronzeFor(raw, "video_events", Schemas.videoEvent)
    // video family: playback_position parsed back as int, monotone data
    val goldVideo = videoBronze
      .withColumn("day", to_date(col("event_timestamp")))
      .groupBy("day", "event_type")
      .agg(max("playback_position").as("max_pos"), count(lit(1)).as("n"))
    assert(goldVideo.agg(max("max_pos")).head().getInt(0) > 0,
      "playback_position must survive the JSON wire to gold")

    // ad family: ad_duration keeps the generator's 15/30 domain
    val adBronze = Taxonomy.bronzeFor(raw, "ad_events", Schemas.adEvent)
    val durs = adBronze.select("ad_duration").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(durs === Set(15, 30))

    // session family: session ids parse back non-null for session events
    val sessBronze = Taxonomy.bronzeFor(raw, "session_events", Schemas.sessionEvent)
    assert(sessBronze.filter(col("session_id").isNull).count() === 0L)
  }

  test("per-topic bronze split runs under Structured Streaming (reference RT shape)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, Long)]
    val stream = input.toDF().toDF("event_id", "event_type", "event_timestamp", "playback_position")
    // same pure transforms as batch: wrap -> route -> per-family parse
    val raw = Taxonomy.wrapEnvelope(stream)
    val videoQ = Taxonomy.bronzeFor(raw, "video_events", Schemas.videoEvent)
      .writeStream.format("memory").queryName("video_bronze").outputMode("append").start()
    val adQ = Taxonomy.bronzeFor(raw, "ad_events", Schemas.adEvent)
      .writeStream.format("memory").queryName("ad_bronze").outputMode("append").start()
    try {
      input.addData(
        ("e1", "video_play", Timestamp.valueOf("2024-01-01 10:00:00"), 30L),
        ("e2", "ad_impression", Timestamp.valueOf("2024-01-01 10:00:10"), 0L),
        ("e3", "video_buffer", Timestamp.valueOf("2024-01-01 10:00:20"), 45L))
      videoQ.processAllAvailable(); adQ.processAllAvailable()
      val video = spark.table("video_bronze").select("event_id", "playback_position")
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(video === Map("e1" -> 30, "e3" -> 45), "video family routed + parsed")
      assert(spark.table("ad_bronze").select("event_id").as[String].collect().toSeq
        === Seq("e2"), "ad family routed to its own bronze")
    } finally { videoQ.stop(); adQ.stop() }
  }

  test("bronze parse honours the declared family schema types") {
    val videoBronze = Taxonomy.bronzeFor(raw, "video_events", Schemas.videoEvent)
    val fields = videoBronze.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("playback_position") === "integer")
    assert(fields("event_timestamp") === "timestamp")
    assert(fields("content_duration") === "integer")
  }
}
