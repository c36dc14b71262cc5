package graft

import org.apache.spark.sql.SparkSession

/** Scratch micro-bench (Test/runMain graft.AsOfMicroBench): broadcast
  * as-of rollup with whole-stage codegen on vs off, warm best-of-5 at
  * sf0.1 — the measurement behind the PLANS_r10 codegen receipt. */
object AsOfMicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val off = SessionClones.cloned("asof-codegen-off", spark) { s =>
      s.conf.set("spark.sql.codegen.wholeStage", "false") }

    def run(s: SparkSession, bcast: Boolean): Long =
      operators.AsOfJoin.asofRollup(
        Tables.events(s, sfDir), Tables.orders(s, sfDir),
        native = Some(Some(bcast))).count()

    def timed(s: SparkSession, bcast: Boolean): Double = {
      val t0 = System.nanoTime(); run(s, bcast); (System.nanoTime() - t0) / 1e9
    }
    for (bcast <- Seq(true, false)) {
      val label = if (bcast) "broadcast" else "merge"
      // interleaved best-of-10 so box drift hits both sessions equally
      run(spark, bcast); run(spark, bcast); run(off, bcast); run(off, bcast)
      val pairs = (1 to 10).map(_ => (timed(spark, bcast), timed(off, bcast)))
      val on = pairs.map(_._1).min
      val noGen = pairs.map(_._2).min
      println(f"asof-$label%s rollup sf0.1: codegen=on $on%.3f s  codegen=off $noGen%.3f s")
    }
    spark.stop()
  }
}
