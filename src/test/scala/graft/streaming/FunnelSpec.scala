package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSuite
import Funnel._

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  test("streaming funnel tracks strict progression incrementally across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = Funnel.streamingFunnel(spark, input.toDS())
    val query = out.writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      // batch 1: user 1 clicks BEFORE any view — no step 2 yet
      input.addData(FunnelEvent(1, "click", 100), FunnelEvent(1, "purchase", 150))
      query.processAllAvailable()
      // batch 2: a LATE view at t=50 validates the t=100 click and the
      // t=150 purchase retroactively — the buffered minima make the
      // recomputation find both
      input.addData(FunnelEvent(1, "view", 50))
      query.processAllAvailable()
      // batch 3: user 2 runs the steps in order but strictly out of
      // progression: purchase precedes its click → step 3 stays open
      input.addData(
        FunnelEvent(2, "view", 10), FunnelEvent(2, "purchase", 20),
        FunnelEvent(2, "click", 30))
      query.processAllAvailable()

      val rows = spark.table("funnel").collect()
        .map(r => (r.getAs[Long]("user_id"),
          Option(r.getAs[java.lang.Long]("t1")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t2")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t3")).map(_.toLong))).toSet
      assert(rows.contains((1L, None, None, None)),
        s"before the view nothing counts: $rows")
      assert(rows.contains((1L, Some(50L), Some(100L), Some(150L))),
        s"the late view must validate the earlier click+purchase: $rows")
      assert(rows.contains((2L, Some(10L), Some(30L), None)),
        s"a purchase before its click must not complete the funnel: $rows")
    } finally query.stop()
  }

  test("a completed step never regresses when invalid stragglers flood the buffer") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = Funnel.streamingFunnel(spark, input.toDS(), bufK = 4)
    val query = out.writeStream.format("memory").queryName("funnel_noregress")
      .outputMode("update").start()
    try {
      input.addData(FunnelEvent(1, "view", 10), FunnelEvent(1, "click", 12))
      query.processAllAvailable()
      // a flood of clicks BEFORE the view (never valid unless a still-
      // earlier view arrives) must not evict the already-valid click —
      // the old smallest-k-overall buffer did exactly that
      input.addData((1L to 6L).map(t => FunnelEvent(1, "click", t)): _*)
      query.processAllAvailable()
      val last = spark.table("funnel_noregress").collect()
        .map(r => (Option(r.getAs[java.lang.Long]("t1")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t2")).map(_.toLong)))
      assert(last.contains((Some(10L), Some(12L))) && !last.contains((Some(10L), None)),
        s"valid click must survive the pending flood: ${last.toSeq}")
      // and when an even earlier view lands, the best pending click wins
      input.addData(FunnelEvent(1, "view", 0))
      query.processAllAvailable()
      val after = spark.table("funnel_noregress").collect()
        .map(r => (Option(r.getAs[java.lang.Long]("t1")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t2")).map(_.toLong)))
      assert(after.contains((Some(0L), Some(1L))),
        s"the lowered threshold must promote the smallest pending click: ${after.toSeq}")
    } finally query.stop()
  }

  test("a falling threshold inside a large pending band resolves exactly (no bufK mis-validation)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = Funnel.streamingFunnel(spark, input.toDS())
    val query = out.writeStream.format("memory").queryName("funnel_band")
      .outputMode("update").start()
    try {
      // 20 pending clicks — well beyond the old bufK=8 heuristic bound
      input.addData((100L to 119L).map(t => FunnelEvent(1, "click", t)): _*)
      query.processAllAvailable()
      // a late view at 112 lands INSIDE the pending band: the exact t2 is
      // the click at 112; the old heuristic kept only the 8 smallest
      // pendings (100..107) and would have reported no click at all
      input.addData(FunnelEvent(1, "view", 112))
      query.processAllAvailable()
      val rows = spark.table("funnel_band").collect()
        .map(r => (Option(r.getAs[java.lang.Long]("t1")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t2")).map(_.toLong))).toSet
      assert(rows.contains((Some(112L), Some(112L))),
        s"the exact in-band click must validate, regardless of band size: $rows")
    } finally query.stop()
  }

  test("watermark evicts pending state and excludes late input without changing on-time results") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    // the watermarked column must STAY in the plan feeding the stateful
    // operator (watermark presence is read off the child's output
    // attributes); as[FunnelEvent] binds by name and tolerates the extra
    val withWm = input.toDS()
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", "5 seconds")
      .as[FunnelEvent]
    val out = Funnel.streamingFunnel(spark, withWm)
    val query = out.writeStream.format("memory").queryName("funnel_wm")
      .outputMode("update").start()
    def userRows(uid: Long) = spark.table("funnel_wm").collect()
      .filter(_.getAs[Long]("user_id") == uid)
      .map(r => (Option(r.getAs[java.lang.Long]("t1")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("t2")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("t3")).map(_.toLong)))
    try {
      // batch 1: clicks + a purchase, all pending (no view yet); watermark
      // after this batch = 120 - 5 = 115
      input.addData((100L to 110L).map(t => FunnelEvent(1, "click", t))
        :+ FunnelEvent(1, "purchase", 120): _*)
      query.processAllAvailable()
      // batch 2: another user far ahead advances the watermark to 295 —
      // every pending entry of user 1 is now unreachable (a view that
      // could validate them would have to arrive below the watermark)
      input.addData(FunnelEvent(2, "view", 300))
      query.processAllAvailable()
      // batch 3: a LATE view at 50 (< wm 295) is excluded by the contract;
      // user 1's state must stay step-less — under the old heuristic this
      // view would have (wrongly, per the contract) validated the band
      input.addData(FunnelEvent(1, "view", 50))
      query.processAllAvailable()
      assert(userRows(1).last === ((None, None, None)),
        s"late input below the watermark must be excluded: ${userRows(1).toSeq}")
      // batch 4: an on-time view — t1 completes; the evicted clicks sat
      // below the view, so eviction is invisible in the result (exactly
      // the batch funnel over the on-time events)
      input.addData(FunnelEvent(1, "view", 296))
      query.processAllAvailable()
      assert(userRows(1).last === ((Some(296L), None, None)),
        s"on-time results must match the batch funnel: ${userRows(1).toSeq}")
    } finally query.stop()
  }

  test("property: any batch partitioning of any event sequence yields the one-batch answer") {
    // the monotone-recomputation claim, brute-forced: 500 random event
    // sequences, each folded through `advance` under a random partition
    // into micro-batches (random sizes AND random arrival order), must
    // land in the same (t1, t2, t3) as the single-batch evaluation
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "purchase")
    for (iter <- 1 to 500) {
      val n = 1 + rnd.nextInt(24)
      val events = Seq.fill(n)(FunnelEvent(1, types(rnd.nextInt(3)), rnd.nextInt(50).toLong))
      val shuffled = rnd.shuffle(events)
      // random partition into 1..6 batches
      val cuts = Seq.fill(rnd.nextInt(5))(rnd.nextInt(n + 1)).sorted
      val batches = (Seq(0) ++ cuts ++ Seq(n)).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b)
      }.toSeq
      val folded = batches.foldLeft(Funnel.emptyBuf)(
        (buf, b) => Funnel.advance(buf, b, None, Int.MaxValue))
      val oneShot = Funnel.advance(Funnel.emptyBuf, events, None, Int.MaxValue)
      assert((folded.minView, folded.validClick, folded.validPurchase) ===
        ((oneShot.minView, oneShot.validClick, oneShot.validPurchase)),
        s"iter $iter: batches=$batches events=$events")
    }
  }

  test("batch mode (no watermark) admits negative-epoch timestamps") {
    import spark.implicits._
    val ds = Seq(FunnelEvent(1, "view", -100), FunnelEvent(1, "click", -50)).toDS()
    val out = Funnel.streamingFunnel(spark, ds).collect()
    assert(out.toSeq === Seq(FunnelUpdate(1, Some(-100L), Some(-50L), None)),
      s"pre-1970 events must not be treated as late when no watermark exists: ${out.toSeq}")
  }

  test("streaming funnel state agrees with the batch funnel on the fixture") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.events(spark, sfDir("0.001"))
    // run the stateful operator in BATCH mode (one invocation per key)
    val ds = events.select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
      .as[FunnelEvent]
    val streamed = Funnel.streamingFunnel(spark, ds, bufK = Int.MaxValue)
      .collect().map(u => u.user_id -> ((u.t1, u.t2, u.t3))).toMap
    // the batch reference: stacked window minima (q58's per-user stage)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val batch = events
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts_s"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts_s") >= col("t1"), col("ts_s"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts_s") >= col("t2"), col("ts_s"))).over(w))
      .groupBy("user_id")
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((opt(1), opt(2), opt(3)))
      }.toMap
    assert(streamed === batch,
      "stateful funnel must reproduce the batch window formulation exactly")
    assert(batch.values.exists(_._3.isDefined), "fixture must complete some funnels")
  }
}
