package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (Test/runMain graft.Q56Probe): where does the 56M
  * both-hot grid rung's wall-clock go — the stats/decision phase vs
  * the gridded join itself — and what do the decision's boundaries
  * look like. Used to bisect the r14 tip's regression on the rung. */
object Q56Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scratch = java.nio.file.Files.createTempDirectory("graft_q56")
    val hot = 777L
    val epoch = "to_timestamp('2024-01-01 00:00:00')"
    spark.range(24000000L).select(
        when(col("id") % 2 === 0, lit(hot))
          .otherwise(pmod(col("id"), lit(1000)) + 10000L).as("k"),
        expr(s"timestamp_micros(unix_micros($epoch) + id * 1000000)").as("t"),
        col("id").as("pid"))
      .write.parquet(s"$scratch/r.parquet")
    spark.range(32000000L).select(
        col("id").as("lid"),
        when(col("id") % 10 < 3, lit(hot))
          .otherwise(pmod(col("id"), lit(1000)) + 10000L).as("k"),
        expr(s"timestamp_micros(unix_micros($epoch) + id * 2000000)").as("t"))
      .write.parquet(s"$scratch/l.parquet")
    val lSyn = spark.read.parquet(s"$scratch/l.parquet")
    val rSyn = spark.read.parquet(s"$scratch/r.parquet")

    def once(): (Double, Double, String) = {
      val t0 = System.nanoTime()
      val (df, dec) = operators.AsOfJoin.asofJoinAutoStats(lSyn, rSyn, "k", "t",
        Seq("pid"), tieBreak = Some("pid"))
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      CacheScope.releaseAll()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, dec.mode)
    }
    once() // warm
    val runs = (1 to 3).map(_ => once())
    println(f"q56 stats=${runs.map(_._1).min}%.2f s  join=${runs.map(_._2).min}%.2f s  mode=${runs.head._3}")
    // dump the AQE-final executed plan + the decision for diffing
    sys.env.get("GRAFT_PROBE_PLAN").foreach { out =>
      val (df, dec) = operators.AsOfJoin.asofJoinAutoStats(lSyn, rSyn, "k", "t",
        Seq("pid"), tieBreak = Some("pid"))
      df.count()
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (s"decision: $dec\n\n" + df.queryExecution.executedPlan.toString)
          .getBytes("UTF-8"))
      CacheScope.releaseAll()
    }
  }
}
