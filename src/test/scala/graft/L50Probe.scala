package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (Test/runMain graft.L50Probe): where does
  * l50_heavy_trigrams' wall-clock go at sf0.01 vs sf0.1 (the one
  * non-adjudicated >3× scalesmoke row of r17, 0.71 s → 2.25 s)?
  * Phase split: pass 1 = the Misra–Gries sketch over the exploded
  * trigram stream; pass 2 = the exact re-count of the ≤ capacity−1
  * broadcast candidates over the same stream. Both are Θ(total chars)
  * scans by construction — this prints the measured split and the
  * corpus char totals so the adjudication carries numbers, and flags
  * anything that is NOT tracking the char total. */
object L50Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // heap comes from the forked JVM's -Xmx (build.sbt javaOptions,
      // SPARK_DRIVER_MEM): spark.driver.memory is inert in local mode
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)

    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      val docs = Tables.documents(spark, sf).cache()
      val nDocs = docs.count()
      val chars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
      val grams = docs.filter(length(col("text")) >= 3)
        .select(explode(expr("char_ngrams(text, 3)")).as("g"))
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      (1 to 3).foreach { round =>
        // pass 1: stream length + MG sketch (one aggregation)
        val ((n, cands), t1) = time {
          val sk = grams.agg(count(lit(1)).as("n"),
            expr("misra_gries(g, 128)").as("sk")).collect()(0)
          (sk.getLong(0), sk.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)))
        }
        // pass 2: exact counts of the broadcast candidates
        val (kept, t2) = time {
          val cdf = spark.createDataFrame(
            spark.sparkContext.parallelize(cands.map(org.apache.spark.sql.Row(_)), 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("g",
                org.apache.spark.sql.types.StringType, nullable = false))))
          grams.join(broadcast(cdf), Seq("g"))
            .groupBy("g").agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") * lit(128L) > lit(n))
            .count()
        }
        // the full registered query, end to end
        val (_, tAll) = time {
          graft.llm.TextStats.heavyTrigrams(Tables.documents(spark, sf)).collect()
        }
        println(f"L50PROBE sf=$sf round=$round docs=$nDocs chars=$chars " +
          f"grams=$n cands=${cands.length} kept=$kept " +
          f"pass1=$t1%.3f pass2=$t2%.3f full=$tAll%.3f")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
