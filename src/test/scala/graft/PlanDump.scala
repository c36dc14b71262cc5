package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan of a registered query (after a real
  * run, so AQE's final plan is shown). `Test/runMain graft.PlanDump
  * <sfDir> <queryName...>`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString)
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
