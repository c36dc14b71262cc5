package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (Test/runMain graft.L03Probe): where does
  * l03_dedup_simhash's wall-clock go at sf0.01 vs sf0.1 — the one
  * remaining >3× scalesmoke row with a stable denominator and no
  * profile (r18 verdict #3, 7.5× at ×10 chars)? Phase split mirrors
  * the registered pipeline (same expressions, bucket cap, and
  * first-eligible-band residual):
  *
  *  - fp    = the codegen'd 64-bit xxhash64 SimHash fingerprint
  *            (one map-side pass, Θ(total chars));
  *  - band  = 4-band explode + per-bucket row_number cap (shuffle of
  *            4N rows on (band_id, band_val));
  *  - pairs = the banded self-join's candidate-pair count (the term
  *            that grows superlinearly if bucket occupancy rises with
  *            corpus size — fixed 2^16 band space);
  *  - full  = the registered query end-to-end (fingerprints prebuilt,
  *            as in the l03 registration via SigStore).
  *
  * Prints per-scale bucket-occupancy stats (max / p99 / Σ C(n,2)) so
  * the adjudication names the growth term with numbers.
  */
object L03Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      val docs = Tables.documents(spark, sf).cache()
      val nDocs = docs.count()
      val chars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)

      (1 to 3).foreach { round =>
        // phase 1: fingerprint build (the SigStore.nativeSimhash work)
        val fp = docs.select(col("doc_id"),
          expr("simhash64(split(text, ' '))").as("simhash"))
        val (_, tFp) = time { fp.count() }
        val fpC = fp.persist()
        fpC.count()

        // phase 2: band explode + bucket cap (the shared banded frame)
        val banded = fpC
          .withColumn("bands", array((0 until 4).map(k =>
            expr(s"shiftright(simhash, ${16 * k}) & 65535")): _*))
          .select(col("doc_id"), col("simhash"),
            posexplode(col("bands")).as(Seq("band_id", "band_val")))
        val capped = banded.withColumn("__rn", row_number().over(
            Window.partitionBy("band_id", "band_val").orderBy("doc_id")))
          .filter(col("__rn") <= graft.llm.TextDedup.MaxBucketDefault).drop("__rn")
        val (nBand, tBand) = time { capped.count() }

        // bucket occupancy: the growth term candidate-pair volume rides
        val occ = banded.groupBy("band_id", "band_val").count()
        val stats = occ.agg(max("count").as("mx"),
          expr("percentile_approx(count, 0.99)").as("p99"),
          sum(expr("count * (count - 1) / 2")).as("pairs_ub")).collect()(0)

        // phase 3: candidate pairs (pre-rank join volume)
        val a = capped.select(col("doc_id").as("id_a"), col("band_id"), col("band_val"))
        val b = capped.select(col("doc_id").as("id_b"), col("band_id"), col("band_val"))
        val (nPairs, tPairs) = time {
          a.join(b, Seq("band_id", "band_val"))
            .filter(col("id_a") < col("id_b")).count()
        }

        // phase 4: the registered query end-to-end, fingerprints prebuilt
        val (_, tFull) = time {
          graft.llm.TextDedup.simhashNearDup(docs, fpOpt = Some(fpC)).collect()
        }
        fpC.unpersist()

        println(f"L03PROBE sf=$sf round=$round docs=$nDocs chars=$chars " +
          f"banded=$nBand bucket_max=${stats.getLong(0)} " +
          f"bucket_p99=${stats.get(1)} pairs_ub=${stats.get(2)} " +
          f"pairs=$nPairs fp=$tFp%.3f band=$tBand%.3f " +
          f"pairjoin=$tPairs%.3f full=$tFull%.3f")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
