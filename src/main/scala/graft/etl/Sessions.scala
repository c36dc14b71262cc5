package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Det._

/** Session analytics (reference: etl_framework.py:293-316 enrichment,
  * :606-629 rollup).
  */
object Sessions {

  /** W2 — per-event session enrichment: unbounded-partition window
    * aggregates attached to every event row. One shuffle on the session
    * key; no orderBy in the window spec, so the frame is the whole
    * partition (cheap — no running-state sort needed beyond the hash).
    */
  def enrich(events: DataFrame, sessionKey: String): DataFrame = {
    val w = Window.partitionBy(sessionKey)
    events
      .withColumn("session_events", count(lit(1)).over(w))
      .withColumn("session_start_s", min(unix_timestamp(col("ts"))).over(w))
      .withColumn("session_end_s", max(unix_timestamp(col("ts"))).over(w))
      .withColumn("session_duration_s", col("session_end_s") - col("session_start_s"))
  }

  /** A4 — batch session rollup with derived engagement metrics.
    * The reference uses nondeterministic `first(device_type)`; we use
    * min/max so results are order-independent (same information content).
    */
  def rollup(events: DataFrame, sessionKey: String): DataFrame = {
    events
      .groupBy(sessionKey)
      .agg(
        min(unix_timestamp(col("ts"))).as("session_start_s"),
        max(unix_timestamp(col("ts"))).as("session_end_s"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("uniq_types"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
        davg(col("value")).as("avg_value"),
        min(col("event_type")).as("first_type_alpha"),
        max(col("event_type")).as("last_type_alpha"))
      .withColumn("session_duration_min",
        (col("session_end_s") - col("session_start_s")).cast("double") / 60.0)
      .withColumn("completion_rate",
        col("purchases").cast("double") / col("n_events"))
      .withColumn("engagement_score",
        col("n_events").cast("double") * 0.3 + col("uniq_types").cast("double") * 0.7)
  }
}
