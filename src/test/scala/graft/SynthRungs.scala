package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The synthesized skew-ladder fixtures, shared by every harness that
  * measures them (LadderScale, ABLadder) so a rung's SHAPE is defined
  * once — a drifted copy would silently measure a different regime.
  * Each builder writes the sides to parquet under `dir` (the production
  * shape: the auto routers' stats passes read sampled PRUNED scans, not
  * recomputes of an in-memory lineage) and returns the reader frames;
  * an already-written rung is reused. */
object SynthRungs {

  private val Epoch = "to_timestamp('2024-01-01 00:00:00')"
  private val Hot = 777L

  private def writeOnce(spark: SparkSession, path: String)(df: => DataFrame): DataFrame = {
    val p = new java.io.File(path)
    if (!p.exists()) df.write.parquet(path)
    spark.read.parquet(path)
  }

  /** Right-heavy as-of at 16M right rows: ONE key owns half the right
    * (8M × 32 B = 256 MB — 4.7% inside the 256 MiB task budget, the
    * hysteresis rung) against a 1M-row left touching the key sparsely
    * (1-in-200 → far under the hot-share threshold). */
  def rightHot16M(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val r = writeOnce(spark, s"$dir/synth_asof_r.parquet") {
      spark.range(16000000L).select(
        when(col("id") % 2 === 0, lit(Hot))
          .otherwise(pmod(col("id"), lit(1000)) + 10000L).as("k"),
        expr(s"timestamp_micros(unix_micros($Epoch) + id * 1000000)").as("t"),
        col("id").as("pid"))
    }
    val l = writeOnce(spark, s"$dir/synth_asof_l.parquet") {
      spark.range(1000000L).select(
        col("id").as("lid"),
        when(col("id") % 200 === 0, lit(Hot))
          .otherwise(pmod(col("id"), lit(1000)) + 10000L).as("k"),
        expr(s"timestamp_micros(unix_micros($Epoch) + id * 16000000)").as("t"))
    }
    (l, r)
  }

  /** Both-hot as-of PAST the budget on both sides (the 56M rung): one
    * key carries 30% of a 32M left (9.6M × 32 B = 307 MB) AND 50% of a
    * 24M right (12M × 32 B = 384 MB) — the both-overflow class the r15
    * pricing resolves (left share in [0.2, 0.4) keeps the router off
    * the left-global short-circuit). */
  def bothHotBig56M(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val r = writeOnce(spark, s"$dir/synth_bhb_r.parquet") {
      spark.range(24000000L).select(
        when(col("id") % 2 === 0, lit(Hot))
          .otherwise(pmod(col("id"), lit(1000)) + 10000L).as("k"),
        expr(s"timestamp_micros(unix_micros($Epoch) + id * 1000000)").as("t"),
        col("id").as("pid"))
    }
    val l = writeOnce(spark, s"$dir/synth_bhb_l.parquet") {
      spark.range(32000000L).select(
        col("id").as("lid"),
        when(col("id") % 10 < 3, lit(Hot))
          .otherwise(pmod(col("id"), lit(1000)) + 10000L).as("k"),
        expr(s"timestamp_micros(unix_micros($Epoch) + id * 2000000)").as("t"))
    }
    (l, r)
  }
}
