package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× document-corpus stress for the fixed-state tier (dev harness,
  * test scope — the ScaleSmoke twin for VERDICT r9 item 7): the
  * heavy-hitter (l50, Misra-Gries) and LM-familiarity (l51, bigram
  * model) operators carry state bounded by the SKETCH (127 counters) or
  * the VOCABULARY (model tables), not the corpus — so at 100× documents
  * their cost must stay ~linear in scan work and their OUTPUT must stay
  * the same size (the same heavy trigrams, the same model arity). The
  * dedup family got its 10× pass in SCALING_r07; this probes the two
  * operators whose 100 TB argument is "state cannot grow".
  *
  * Amplification: shifted doc_id copies with text kept (the ScaleSmoke
  * recipe) — repeated text is exactly the regime a heavy-hitter sketch
  * and an n-gram LM see in a crawl.
  *
  * Run: sbt "Test/runMain graft.DocScale100"
  */
object DocScale100 {

  private def amplifyDocs(spark: SparkSession, base: String, copies: Int,
                          out: String): String = {
    val raw = spark.read.parquet(s"$base/documents.parquet")
    (0 until copies).map { k =>
      raw.withColumn("doc_id", col("doc_id") + lit(k * 1000000000L))
    }.reduce(_ unionByName _).write.parquet(s"$out/documents.parquet")
    out
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)

    val scratch = java.nio.file.Files.createTempDirectory("graft_doc100x")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      if (Files.exists(scratch))
        Files.walk(scratch).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }))
    // the 1×/10×/100× rungs; each dir carries only documents — the two
    // probed queries read nothing else
    val rungs: Seq[(Int, String)] = Seq(1, 10, 100).map { c =>
      val d = scratch.resolve(s"x$c").toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      c -> amplifyDocs(spark, base, c, d)
    }

    val registry = SparkEntry.queries
    def run(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = registry(name)(spark, dir).count()
      CacheScope.releaseAll()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    println("query,copies,sec,out_rows")
    for (name <- Seq("l50_heavy_trigrams", "l51_lm_familiarity");
         (c, dir) <- rungs) {
      run(name, dir) // warm-up (codegen, shared-frame build)
      val (sec, rows) = run(name, dir)
      println(f"$name,$c,$sec%.2f,$rows")
      Console.flush()
    }
    spark.stop()
  }
}
