package graft

/** Scratch probe (Test/runMain graft.StreamGateProbe): the recurring
  * streaming-fixture scalesmoke rows (q73/q85/q91 at 3.2–3.8× per ×10
  * data, r18 verdict #6) adjudicated ONCE with a phase model instead
  * of every round by eye. Each registered gate is timed through its
  * REGISTERED path (fixture dirs memoized by the warm-up, stream
  * re-executed per call — exactly the ScaleSmoke protocol) at THREE
  * fixture scales, three timed runs each. A micro-batch gate's cost is
  * t(rows) ≈ a + b·rows: `a` is trigger/checkpoint/state machinery
  * (scale-independent), `b` the data term. Fitting the three medians
  * names the growth term: a ×10 ratio of ~3.5 on a 1–2 s base is the
  * fixed term amortizing, not superlinear data cost — this prints the
  * numbers SCALING_r19 records so the smoke can cite them. */
object StreamGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)
    val registry = SparkEntry.queries
    val gates = Seq("q73_streaming_session_window",
      "q85_streaming_asof_enrich", "q91_streaming_range_join")
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    def run(n: String, dir: String): Double = {
      val t0 = System.nanoTime()
      registry(n)(spark, dir).count()
      CacheScope.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    gates.foreach { n =>
      sfs.foreach { dir =>
        val rows = Tables.events(spark, dir).count()
        run(n, dir) // warm-up: builds the memoized fixture dir + codegen
        val ts = (1 to 3).map(_ => run(n, dir))
        println(f"STREAMGATE q=$n sf=$dir events=$rows " +
          f"t1=${ts(0)}%.2f t2=${ts(1)}%.2f t3=${ts(2)}%.2f " +
          f"median=${ts.sorted.apply(1)}%.2f")
        Console.flush()
      }
    }
    spark.stop()
  }
}
