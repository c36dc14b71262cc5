package graft.gen

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Sequence invariants from the reference's validators
  * (schemas.py:341-411), used here as test oracles per SURVEY §5. */
class EventGenSpec extends SparkSuite {

  private lazy val ev = EventGen.videoSessions(spark, nSessions = 200)

  test("generation is deterministic for a fixed seed") {
    val a = EventGen.videoSessions(spark, 50).collect().map(_.toString).sorted
    val b = EventGen.videoSessions(spark, 50).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("exactly one session_start per session, and it precedes every event") {
    val starts = ev.filter(col("event_type") === "session_start")
      .groupBy("session_id").count().filter(col("count") =!= 1).count()
    assert(starts === 0)
    val bad = ev.alias("e").join(
        ev.filter(col("event_type") === "session_start")
          .select(col("session_id"), col("event_timestamp").as("start_ts")),
        Seq("session_id"))
      .filter(col("event_timestamp") < col("start_ts")).count()
    assert(bad === 0)
  }

  test("playback position is monotone non-decreasing within a session (no seeks backward needed)") {
    val w = Window.partitionBy("session_id").orderBy("event_timestamp")
    val regressions = ev.filter(col("playback_position").isNotNull)
      .withColumn("prev", lag(col("playback_position"), 1).over(w))
      .filter(col("prev").isNotNull && col("playback_position") < col("prev"))
      .count()
    assert(regressions === 0)
  }

  test("video_complete implies position >= 95% of duration") {
    val bad = ev.filter(col("event_type") === "video_complete" &&
      col("playback_position") < col("content_duration") * 0.95).count()
    assert(bad === 0)
  }

  test("ad events follow the reference rates: every impression, ~2% CTR, ~15% skip") {
    val ads = EventGen.adEvents(spark, 20000)
    val counts = ads.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts("ad_impression").toDouble
    assert(n === 20000.0)
    val ctr = counts("ad_click") / n
    assert(ctr > 0.01 && ctr < 0.03) // target 0.02
    val skip = counts("ad_skip") / n
    assert(skip > 0.12 && skip < 0.18) // target ~0.147 of all
    assert(counts.values.sum === 40000L) // each impression has exactly one outcome
  }

  test("device mix roughly follows the reference distribution") {
    val total = ev.select("session_id").distinct().count().toDouble
    val mobile = ev.filter(col("event_type") === "session_start" &&
      col("device_type") === "mobile").count() / total
    assert(mobile > 0.3 && mobile < 0.6) // target 0.45
  }
}
