package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time the l55 gate's phases at a given scale.
  * `Test/runMain graft.L55Probe <sfDir>`. */
object L55Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, sfDir).count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[l55] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { pass =>
      println(s"-- pass $pass --")
      time("sigstore warm")(graft.llm.SigStore.portable(spark, sfDir).count())
      val df = time("gate (stream+drain)")(
        graft.streaming.StreamingOracle.streamingIncrementalDedup(spark, sfDir))
      time("rollup collect")(df.count())
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
