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

  /** The 8M×2 burst-overlap rung (the r15 demoted-cold-path rung,
    * ladderscale_r15's `overlap_synth_8Mx2`): 75% of each side sits on
    * one burst instant, window lengths 1–7 min, natural 100 s spread
    * elsewhere. Whole sides ≈ 8M × 32 B = 256 MB — inside the task
    * budget, so the auto ladder's correct answer is "do nothing"; the
    * rung measures what that answer COSTS (r15: a 38% stats premium;
    * r16's pre-histogram gate is judged on cutting it). */
  def overlapBurst8Mx2(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val minute = 60L * 1000000L
    def side(path: String, burstTs: String, idCol: String, sCol: String,
             eCol: String): DataFrame =
      writeOnce(spark, path) {
        val base = spark.range(8000000L).select(
          col("id").as(idCol),
          when(col("id") % 4 =!= 3, to_timestamp(lit(burstTs)))
            .otherwise(timestamp_micros(
              unix_micros(to_timestamp(lit("2024-01-01 00:00:00"))) +
                col("id") * 100000000L)).as(sCol))
        base.withColumn(eCol, timestamp_micros(
          unix_micros(col(sCol)) + (col(idCol) % 7 + 1) * minute))
      }
    (side(s"$dir/synth_ov8_l.parquet", "2024-01-15 12:00:00", "w_id", "w_start", "w_end"),
      side(s"$dir/synth_ov8_r.parquet", "2024-01-20 06:00:00", "e_id", "e_start", "e_end"))
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
