package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (Test/runMain graft.Q106Probe): where does q106's
  * wall-clock go — the stats/decision phase (driver-side jobs inside
  * asofJoinAutoStats) vs the routed join itself. */
object Q106Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)

    def once(): (Double, Double, String) = {
      val events = Tables.events(spark, sfDir)
      val hotKey = lit(1234567L)
      val lhs = events.select(col("event_id"), col("event_type"),
        when(col("user_id") % 211 === 0, hotKey).otherwise(col("user_id")).as("user_id"),
        col("ts"))
      val right = events.filter(col("event_type") === "purchase")
        .select(
          when(col("user_id") % 2 === 0, hotKey).otherwise(col("user_id")).as("user_id"),
          col("ts"), col("event_id").as("pid"), col("value").as("pval"))
      val t0 = System.nanoTime()
      val (df, dec) = operators.AsOfJoin.asofJoinAutoStats(lhs, right, "user_id", "ts",
        Seq("pid", "pval", "ts"), tieBreak = Some("pid"), minFullRows = 0L,
        taskAbsorbBytes = 0L)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      CacheScope.releaseAll()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, dec.mode)
    }
    once() // warm
    val runs = (1 to 5).map(_ => once())
    val stats = runs.map(_._1).min
    val join = runs.map(_._2).min
    println(f"q106 stats=$stats%.3f s  join=$join%.3f s  mode=${runs.head._3}")
  }
}
