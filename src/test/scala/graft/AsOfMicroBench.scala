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

    // The PLANS_r10 §5 wide-left control: 19-column left (events + 12
    // derived strings), full output width forced via toRdd.count —
    // union-window composition vs the native merge exec.
    {
      import org.apache.spark.sql.functions._
      def wideLeft(s: SparkSession) =
        (1 to 12).foldLeft(Tables.events(s, sfDir).select("event_id", "user_id", "ts", "event_type")) {
          (df, i) => df.withColumn(s"d$i",
            concat(col("event_type"), lit("_"), (col("user_id") % i).cast("string")))
        }
      def rightSide(s: SparkSession) = Tables.orders(s, sfDir).select(
        col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("o_totalprice").as("oprice"))
      def comp(): Long = operators.AsOfJoin.asofJoin(
        wideLeft(spark), rightSide(spark), "user_id", "ts",
        Seq("okey", "oprice"), Some("okey")).queryExecution.toRdd.count()
      def native(): Long = operators.AsOfJoin.asofJoinNative(
        wideLeft(spark), rightSide(spark), "user_id", "ts",
        Seq("okey", "oprice"), tieBreak = Some("okey"),
        broadcast = Some(false)).queryExecution.toRdd.count()
      comp(); native(); comp(); native()
      val ps = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); comp(); val c = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); native(); val n = (System.nanoTime() - t1) / 1e9
        (c, n)
      }
      println(f"asof wide-left(19col) sf0.1: composition ${ps.map(_._1).min}%.3f s  merge-exec ${ps.map(_._2).min}%.3f s")
    }
    spark.stop()
  }
}
