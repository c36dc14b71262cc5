package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose the auto-stats pass cost for q100/q101 at a
  * given scale. `Test/runMain graft.StatsBench <sfDir>`.
  *
  * NOTE: the "stats:" phases below are a FROZEN round-12 snapshot of
  * RangeJoin's internals (sample fraction 0.1 / seed 42, the 7-minute
  * width literal, the +63 bin-walk span) kept verbatim so the
  * decomposition cited in PLANS_r12 stays reproducible; if the engine's
  * constants are retuned, re-derive these from RangeJoin before trusting
  * new numbers. The "full" rows call the real registry paths and cannot
  * drift. */
object StatsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.events(spark, sfDir)
    ev.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stats] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { pass =>
      println(s"-- pass $pass --")
      // q94 baseline: hand-picked width+salt, no stats
      time("q94 hand-salted full")(
        graft.operators.RangeJoin.skewedPointInWindowRollup(ev).count())
      CacheScope.releaseAll()
      // q100 decomposed: the stats phases then the join
      val ivs = graft.operators.RangeJoin.skewedWindows(ev)
      val mags0 = ivs.filter(col("w_start") < col("w_end"))
        .select(unix_micros(col("w_start")).as("__s"), unix_micros(col("w_end")).as("__e"))
      val mags = time("stats: sample+persist+p95")({
        val m = mags0.sample(withReplacement = false, 0.1, 42L).persist()
        m.agg(percentile_approx(col("__e") - col("__s"), lit(0.95), lit(10000))).head()
        m
      })
      time("stats: hot-bin histogram (2 actions)")({
        val w = 420000000L
        val firstBin = floor(col("__s") / w).cast("long")
        val lastBin = floor((col("__e") - 1) / w).cast("long")
        val keys = mags.select(explode(sequence(firstBin,
          least(greatest(lastBin, firstBin), firstBin + 63))).as("__k"))
        val counts = keys.filter(col("__k").isNotNull).groupBy("__k").count().persist()
        counts.agg(max("count"), sum("count")).head()
        counts.filter(col("count") >= lit(0.2 * 60000)).collect()
        counts.unpersist()
      })
      mags.unpersist()
      CacheScope.releaseAll()
      time("q100 auto full")(
        graft.operators.RangeJoin.autoSkewedPointInWindowRollup(ev).count())
      CacheScope.releaseAll()
      time("q101 auto full")(
        graft.operators.AsOfJoin.all.find(_.name.startsWith("q101")).get.run(spark, sfDir).count())
      CacheScope.releaseAll()
      time("q98 hand full")(
        graft.operators.AsOfJoin.all.find(_.name.startsWith("q98")).get.run(spark, sfDir).count())
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
