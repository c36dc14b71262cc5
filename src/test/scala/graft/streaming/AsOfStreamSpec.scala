package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSuite
import AsOfStream._

/** Stream-stream backward as-of: watermark-exact finalization, pinned
  * against the batch as-of operator on the same rows. */
class AsOfStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)
  private def l(k: Long, s: Long, id: Long) = AsOfInput(k, ts(s), isRight = false, id, 0.0)
  private def r(k: Long, s: Long, id: Long, pay: Double) = AsOfInput(k, ts(s), isRight = true, id, pay)

  private def run(batches: Seq[Seq[AsOfInput]], delay: String = "30 seconds"): Seq[AsOfMatch] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsOfInput]
    val out = AsOfStream.asofStream(input.toDS(), delay)
    val name = s"asof_stream_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      spark.table(name).as[AsOfMatch].collect().toSeq
    } finally query.stop()
  }

  test("lefts finalize only when the watermark passes them; late rights cannot change an emitted match") {
    val out = run(Seq(
      // batch 1: two rights and a left at t=50 — watermark still unset, nothing emits
      Seq(r(1, 10, 1, 1.0), r(1, 40, 2, 2.0), l(1, 50, 100)),
      // batch 2: a left at t=35 (above wm=20) buffers; the sentinel right
      // at t=200 will advance the watermark to 170 NEXT batch
      Seq(l(1, 35, 101), r(1, 200, 9, 9.0)),
      // batch 3: watermark=170 → both lefts finalize
      Seq(r(2, 500, 99, 0.0))))
    val byId = out.map(m => m.left_id -> m).toMap
    assert(byId(100L).asof_id === Some(2L)) // last right <= 50 is t=40
    assert(byId(101L).asof_id === Some(1L)) // cross-batch: right from batch 1, left from batch 2
    assert(out.length === 2)
  }

  test("equal-timestamp rights resolve to the greatest id; no prior right gives a null match") {
    val out = run(Seq(
      Seq(r(1, 30, 5, 5.0), r(1, 30, 7, 7.0), l(1, 30, 100), l(2, 30, 200)),
      Seq(r(9, 500, 1, 0.0)), // sentinel advances the watermark
      Seq(r(9, 501, 2, 0.0))))
    val byId = out.map(m => m.left_id -> m).toMap
    assert(byId(100L).asof_id === Some(7L) && byId(100L).asof_payload === Some(7.0))
    assert(byId(200L).asof_id === None && byId(200L).asof_payload === None)
  }

  test("a left below the watermark at arrival is dropped, not mis-matched (the late-data contract)") {
    val out = run(Seq(
      Seq(r(1, 10, 1, 1.0), r(1, 900, 2, 2.0)), // watermark jumps to 870 after this batch
      Seq(l(1, 100, 100)),                      // arrives below wm=870 → late, dropped
      Seq(r(9, 2000, 3, 0.0))))
    assert(!out.exists(_.left_id == 100L), s"late left must be dropped: $out")
  }

  test("random-batching invariance: 300 simulated batchings match brute force exactly-once") {
    // The q69-funnel treatment for the as-of state machine: drive the
    // extracted transition (`AsOfStream.resolve`) through a stubbed
    // GroupState under randomized arrival batchings with simulated
    // Spark watermark semantics (pre-batch watermark, strict late
    // filter), and require emissions == brute-force as-of over the
    // SURVIVING rows below the final watermark — each left exactly
    // once, never twice, never early.
    import org.apache.spark.sql.streaming.GroupState
    final class Stub(var value: Option[AsOfBuf], wmMs: Long) extends GroupState[AsOfBuf] {
      override def exists: Boolean = value.isDefined
      override def get: AsOfBuf = value.get
      override def getOption: Option[AsOfBuf] = value
      override def update(s: AsOfBuf): Unit = value = Some(s)
      override def remove(): Unit = value = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(ms: Long): Unit = throw new UnsupportedOperationException
      override def setTimeoutDuration(s: String): Unit = throw new UnsupportedOperationException
      var timeoutMs: Option[Long] = None
      override def setTimeoutTimestamp(ms: Long): Unit = timeoutMs = Some(ms)
      override def setTimeoutTimestamp(ms: Long, d: String): Unit = throw new UnsupportedOperationException
      override def setTimeoutTimestamp(d: java.sql.Date): Unit = throw new UnsupportedOperationException
      override def setTimeoutTimestamp(d: java.sql.Date, s: String): Unit = throw new UnsupportedOperationException
      override def getCurrentWatermarkMs: Long = wmMs
      override def getCurrentProcessingTimeMs: Long = 0L
    }
    val delayMs = 10000L
    val rnd = new scala.util.Random(42)
    for (caseNo <- 1 to 300) {
      // random rows over two keys, ids unique, second granularity
      val rows = (1 to (5 + rnd.nextInt(35))).map { i =>
        AsOfInput(1L + rnd.nextInt(2), ts(rnd.nextInt(100).toLong),
          isRight = rnd.nextBoolean(), 1000L + i, (1000 + i).toDouble)
      }
      // random batching preserving nothing (arrival order is the shuffle)
      val shuffled = rnd.shuffle(rows)
      val nBatches = 1 + rnd.nextInt(6)
      val batches = shuffled.grouped(math.max(1, math.ceil(shuffled.size.toDouble / nBatches).toInt)).toSeq
      val states = scala.collection.mutable.Map[Long, Stub]()
      val emitted = scala.collection.mutable.ArrayBuffer[AsOfMatch]()
      val survivors = scala.collection.mutable.ArrayBuffer[AsOfInput]()
      var wmMs = 0L
      var maxSeenMs = 0L
      def stepKey(k: Long, data: Seq[AsOfInput]): Unit = {
        val st = states.getOrElseUpdate(k, new Stub(None, wmMs))
        val fresh = new Stub(st.value, wmMs)
        emitted ++= AsOfStream.resolve(Long.MaxValue)(k, data.iterator, fresh)
        fresh.timeoutMs = fresh.timeoutMs.orElse(st.timeoutMs)
        states(k) = fresh
      }
      batches.foreach { b =>
        val live = b.filter(_.ts.getTime >= wmMs) // strict late filter
        survivors ++= live
        live.groupBy(_.key).foreach { case (k, data) => stepKey(k, data) }
        // fire pending event-time timeouts for data-less keys
        // (snapshot — stepKey mutates the map)
        states.toSeq.foreach { case (k, st) =>
          if (!live.exists(_.key == k) && st.value.isDefined &&
              st.timeoutMs.exists(_ < wmMs)) stepKey(k, Nil)
        }
        maxSeenMs = math.max(maxSeenMs, b.map(_.ts.getTime).max)
        wmMs = math.max(wmMs, maxSeenMs - delayMs) // watermark advances between batches
      }
      // the engine's no-data batch at the final watermark
      states.keys.toSeq.foreach(k => if (states(k).value.isDefined) stepKey(k, Nil))
      // brute-force truth over survivors below the final watermark
      val finalWmUs = wmMs * 1000L
      val lefts = survivors.filter(a => !a.isRight)
      val rights = survivors.filter(_.isRight)
      val expected = lefts
        .filter(_.ts.getTime * 1000 < finalWmUs)
        .map { l =>
          val m = rights.filter(r => r.key == l.key && !r.ts.after(l.ts))
            .sortBy(r => (r.ts.getTime, r.id)).lastOption
          l.id -> m.map(_.id)
        }.toMap
      val got = emitted.map(m => m.left_id -> m.asof_id).toMap
      assert(emitted.size === got.size, s"case $caseNo: a left emitted twice: $emitted")
      assert(got === expected, s"case $caseNo: batching ${batches.map(_.size)} diverged")
    }
  }

  test("forward with tolerance: first-within wins, beyond-bound nulls, equal-ts takes smallest id") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsOfInput]
    val out = AsOfStream.asofStreamForward(input.toDS(), "30 seconds", toleranceUs = 60L * 1000000L)
    val name = s"asof_fwd_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(
        l(1, 100, 100), r(1, 130, 1, 1.0), r(1, 150, 2, 2.0), // first within 60s → id 1
        l(2, 100, 200), r(2, 170, 3, 3.0),                    // beyond 60s → null
        l(3, 100, 300), r(3, 100, 5, 5.0), r(3, 100, 4, 4.0)) // equal ts → smallest id 4
      query.processAllAvailable()
      input.addData(r(9, 900, 9, 0.0)) // watermark past every window
      query.processAllAvailable()
      input.addData(r(9, 901, 9, 0.0))
      query.processAllAvailable()
      val byId = spark.table(name).as[AsOfMatch].collect().map(m => m.left_id -> m.asof_id).toMap
      assert(byId(100L) === Some(1L))
      assert(byId(200L) === None)
      assert(byId(300L) === Some(4L))
    } finally query.stop()
  }

  test("forward random-batching invariance: 300 simulated batchings match brute force exactly-once") {
    import org.apache.spark.sql.streaming.GroupState
    final class Stub(var value: Option[AsOfBuf], wmMs: Long) extends GroupState[AsOfBuf] {
      override def exists: Boolean = value.isDefined
      override def get: AsOfBuf = value.get
      override def getOption: Option[AsOfBuf] = value
      override def update(s: AsOfBuf): Unit = value = Some(s)
      override def remove(): Unit = value = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(ms: Long): Unit = throw new UnsupportedOperationException
      override def setTimeoutDuration(s: String): Unit = throw new UnsupportedOperationException
      var timeoutMs: Option[Long] = None
      override def setTimeoutTimestamp(ms: Long): Unit = timeoutMs = Some(ms)
      override def setTimeoutTimestamp(ms: Long, d: String): Unit = throw new UnsupportedOperationException
      override def setTimeoutTimestamp(d: java.sql.Date): Unit = throw new UnsupportedOperationException
      override def setTimeoutTimestamp(d: java.sql.Date, s: String): Unit = throw new UnsupportedOperationException
      override def getCurrentWatermarkMs: Long = wmMs
      override def getCurrentProcessingTimeMs: Long = 0L
    }
    val delayMs = 10000L
    val tolUs = 20L * 1000000L
    val rnd = new scala.util.Random(7)
    for (caseNo <- 1 to 300) {
      val rows = (1 to (5 + rnd.nextInt(35))).map { i =>
        AsOfInput(1L + rnd.nextInt(2), ts(rnd.nextInt(100).toLong),
          isRight = rnd.nextBoolean(), 1000L + i, (1000 + i).toDouble)
      }
      val shuffled = rnd.shuffle(rows)
      val nBatches = 1 + rnd.nextInt(6)
      val batches = shuffled.grouped(math.max(1, math.ceil(shuffled.size.toDouble / nBatches).toInt)).toSeq
      val states = scala.collection.mutable.Map[Long, Stub]()
      val emitted = scala.collection.mutable.ArrayBuffer[AsOfMatch]()
      val survivors = scala.collection.mutable.ArrayBuffer[AsOfInput]()
      var wmMs = 0L
      var maxSeenMs = 0L
      def stepKey(k: Long, data: Seq[AsOfInput]): Unit = {
        val st = states.getOrElseUpdate(k, new Stub(None, wmMs))
        val fresh = new Stub(st.value, wmMs)
        emitted ++= AsOfStream.resolveForward(tolUs)(k, data.iterator, fresh)
        fresh.timeoutMs = fresh.timeoutMs.orElse(st.timeoutMs)
        states(k) = fresh
      }
      batches.foreach { b =>
        val live = b.filter(_.ts.getTime >= wmMs)
        survivors ++= live
        live.groupBy(_.key).foreach { case (k, data) => stepKey(k, data) }
        states.toSeq.foreach { case (k, st) =>
          if (!live.exists(_.key == k) && st.value.isDefined &&
              st.timeoutMs.exists(_ < wmMs)) stepKey(k, Nil)
        }
        maxSeenMs = math.max(maxSeenMs, b.map(_.ts.getTime).max)
        wmMs = math.max(wmMs, maxSeenMs - delayMs)
      }
      states.keys.toSeq.foreach(k => if (states(k).value.isDefined) stepKey(k, Nil))
      val finalWmUs = wmMs * 1000L
      val lefts = survivors.filter(a => !a.isRight)
      val rights = survivors.filter(_.isRight)
      val expected = lefts
        .filter(l => l.ts.getTime * 1000 + tolUs < finalWmUs)
        .map { l =>
          val lUs = l.ts.getTime * 1000
          val m = rights.filter(r => r.key == l.key &&
              r.ts.getTime * 1000 >= lUs && r.ts.getTime * 1000 <= lUs + tolUs)
            .sortBy(r => (r.ts.getTime, r.id)).headOption
          l.id -> m.map(_.id)
        }.toMap
      val got = emitted.map(m => m.left_id -> m.asof_id).toMap
      assert(emitted.size === got.size, s"case $caseNo: a left emitted twice")
      assert(got === expected, s"case $caseNo: batching ${batches.map(_.size)} diverged")
    }
  }

  test("nearest with tolerance: closer side wins, tie prefers backward, beyond-bound nulls") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsOfInput]
    val out = AsOfStream.asofStreamNearest(input.toDS(), "30 seconds",
      toleranceUs = 60L * 1000000L)
    val name = s"asof_near_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(
        l(1, 100, 100), r(1, 95, 1, 1.0), r(1, 103, 2, 2.0),  // 5 back vs 3 fwd → fwd id 2
        l(2, 100, 200), r(2, 95, 3, 3.0), r(2, 105, 4, 4.0),  // 5 vs 5 tie → backward id 3
        l(3, 100, 300), r(3, 200, 5, 5.0),                    // 100 > 60 → null
        l(4, 100, 400), r(4, 50, 6, 6.0), r(4, 45, 7, 7.0))   // only back in bound → id 6
      query.processAllAvailable()
      input.addData(r(9, 900, 9, 0.0))
      query.processAllAvailable()
      input.addData(r(9, 901, 9, 0.0))
      query.processAllAvailable()
      val byId = spark.table(name).as[AsOfMatch].collect().map(m => m.left_id -> m.asof_id).toMap
      assert(byId(100L) === Some(2L))
      assert(byId(200L) === Some(3L))
      assert(byId(300L) === None)
      assert(byId(400L) === Some(6L))
    } finally query.stop()
  }

  // minimal GroupState stub shared by the transition-level tests below
  private final class StubState(var value: Option[AsOfBuf], wmMs: Long)
      extends org.apache.spark.sql.streaming.GroupState[AsOfBuf] {
    override def exists: Boolean = value.isDefined
    override def get: AsOfBuf = value.get
    override def getOption: Option[AsOfBuf] = value
    override def update(s: AsOfBuf): Unit = value = Some(s)
    override def remove(): Unit = value = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(ms: Long): Unit = throw new UnsupportedOperationException
    override def setTimeoutDuration(s: String): Unit = throw new UnsupportedOperationException
    var timeoutMs: Option[Long] = None
    override def setTimeoutTimestamp(ms: Long): Unit = timeoutMs = Some(ms)
    override def setTimeoutTimestamp(ms: Long, d: String): Unit = throw new UnsupportedOperationException
    override def setTimeoutTimestamp(d: java.sql.Date): Unit = throw new UnsupportedOperationException
    override def setTimeoutTimestamp(d: java.sql.Date, s: String): Unit = throw new UnsupportedOperationException
    override def getCurrentWatermarkMs: Long = wmMs
    override def getCurrentProcessingTimeMs: Long = 0L
  }

  test("finite horizon: rights-only state registers a timeout and is removed once idle past the horizon") {
    val horizonUs = 60L * 1000000L // 60 s
    // batch 1: one right at t=100s, no lefts, watermark 0
    val s1 = new StubState(None, 0L)
    AsOfStream.resolve(horizonUs)(1L, Iterator(r(1, 100, 1, 1.0)), s1).toList
    assert(s1.value.exists(_.rights.nonEmpty), "right history retained")
    val rightUs = s1.value.get.rights.head.tsUs
    assert(s1.timeoutMs === Some((rightUs + horizonUs) / 1000L + 1L),
      "rights-only state must register an event-time timeout at newest+horizon")
    // timeout fires: watermark has passed newest + horizon → state removed
    val wmPast = (rightUs + horizonUs) / 1000L + 2L
    val s2 = new StubState(s1.value, wmPast)
    AsOfStream.resolve(horizonUs)(1L, Iterator.empty, s2).toList
    assert(s2.value === None, "idle rights-only state must be removed past the horizon")
    // and a left probing beyond the horizon sees null (eviction contract)
    val s3 = new StubState(None, wmPast)
    AsOfStream.resolve(horizonUs)(1L, Iterator(l(1, 100 + 3600, 500)), s3).toList
    val s4 = new StubState(s3.value, wmPast + 7200L * 1000L)
    val out = AsOfStream.resolve(horizonUs)(1L, Iterator.empty, s4).toList
    assert(out.map(m => m.left_id -> m.asof_id) === List(500L -> None))
  }

  test("infinite horizon (default) keeps the dominant right for arbitrarily late lefts") {
    val s1 = new StubState(None, 0L)
    AsOfStream.resolve(Long.MaxValue)(1L, Iterator(r(1, 10, 1, 1.0)), s1).toList
    assert(s1.timeoutMs === None, "no timeout for rights-only state at infinite horizon")
    val lateWmMs = ts(0).getTime + 365L * 86400 * 1000 // a year later
    val s2 = new StubState(s1.value, lateWmMs)
    AsOfStream.resolve(Long.MaxValue)(1L, Iterator(l(1, 366L * 86400, 500)), s2).toList
    val s3 = new StubState(s2.value, lateWmMs + 367L * 86400 * 1000)
    val out = AsOfStream.resolve(Long.MaxValue)(1L, Iterator.empty, s3).toList
    assert(out.map(m => m.left_id -> m.asof_id) === List(500L -> Some(1L)))
  }

  test("forward rights-only state registers a watermark timeout and removes when it passes") {
    val tolUs = 30L * 1000000L
    val s1 = new StubState(None, 0L)
    AsOfStream.resolveForward(tolUs)(1L, Iterator(r(1, 100, 1, 1.0)), s1).toList
    val rightUs = s1.value.get.rights.head.tsUs
    assert(s1.timeoutMs === Some(rightUs / 1000L + 1L),
      "forward rights-only state must re-fire when the watermark passes the newest right")
    val s2 = new StubState(s1.value, rightUs / 1000L + 2L)
    AsOfStream.resolveForward(tolUs)(1L, Iterator.empty, s2).toList
    assert(s2.value === None, "forward rights below the watermark must drop entirely")
  }

  test("pre-epoch event times finalize under the clamped watermark instead of buffering forever") {
    // Spark's global watermark is clamped at ≥ 0, so a pre-epoch left can
    // never be passed by it; the late-data contract finalizes it at once.
    val preEpoch = AsOfInput(1L, new Timestamp(-86400000L), isRight = false, 42L, 0.0)
    val rPre = AsOfInput(1L, new Timestamp(-172800000L), isRight = true, 7L, 7.0)
    val s1 = new StubState(None, 0L)
    val out = AsOfStream.resolve(Long.MaxValue)(1L, Iterator(rPre, preEpoch), s1).toList
    assert(out.map(m => m.left_id -> m.asof_id) === List(42L -> Some(7L)),
      "pre-epoch left must finalize against the watermark-0 floor, not hang")
    val s2 = new StubState(None, 0L)
    val outF = AsOfStream.resolveForward(1000000L)(1L, Iterator(preEpoch), s2).toList
    assert(outF.map(m => m.left_id -> m.asof_id) === List(42L -> None))
  }

  test("nearest random-batching invariance: 300 simulated batchings match brute force exactly-once") {
    val delayMs = 10000L
    val tolUs = 20L * 1000000L
    val rnd = new scala.util.Random(13)
    for (caseNo <- 1 to 300) {
      val rows = (1 to (5 + rnd.nextInt(35))).map { i =>
        AsOfInput(1L + rnd.nextInt(2), ts(rnd.nextInt(100).toLong),
          isRight = rnd.nextBoolean(), 1000L + i, (1000 + i).toDouble)
      }
      val shuffled = rnd.shuffle(rows)
      val nBatches = 1 + rnd.nextInt(6)
      val batches = shuffled.grouped(math.max(1, math.ceil(shuffled.size.toDouble / nBatches).toInt)).toSeq
      val states = scala.collection.mutable.Map[Long, StubState]()
      val emitted = scala.collection.mutable.ArrayBuffer[AsOfMatch]()
      val survivors = scala.collection.mutable.ArrayBuffer[AsOfInput]()
      var wmMs = 0L
      var maxSeenMs = 0L
      def stepKey(k: Long, data: Seq[AsOfInput]): Unit = {
        val st = states.getOrElseUpdate(k, new StubState(None, wmMs))
        val fresh = new StubState(st.value, wmMs)
        emitted ++= AsOfStream.resolveNearest(tolUs)(k, data.iterator, fresh)
        fresh.timeoutMs = fresh.timeoutMs.orElse(st.timeoutMs)
        states(k) = fresh
      }
      batches.foreach { b =>
        val live = b.filter(_.ts.getTime >= wmMs)
        survivors ++= live
        live.groupBy(_.key).foreach { case (k, data) => stepKey(k, data) }
        states.toSeq.foreach { case (k, st) =>
          if (!live.exists(_.key == k) && st.value.isDefined &&
              st.timeoutMs.exists(_ < wmMs)) stepKey(k, Nil)
        }
        maxSeenMs = math.max(maxSeenMs, b.map(_.ts.getTime).max)
        wmMs = math.max(wmMs, maxSeenMs - delayMs)
      }
      states.keys.toSeq.foreach(k => if (states(k).value.isDefined) stepKey(k, Nil))
      val finalWmUs = wmMs * 1000L
      val lefts = survivors.filter(a => !a.isRight)
      val rights = survivors.filter(_.isRight)
      val expected = lefts
        .filter(l => l.ts.getTime * 1000 + tolUs < finalWmUs)
        .map { l =>
          val lUs = l.ts.getTime * 1000
          val inWin = rights.filter(r => r.key == l.key &&
            math.abs(r.ts.getTime * 1000 - lUs) <= tolUs)
          val bw = inWin.filter(_.ts.getTime * 1000 <= lUs)
            .sortBy(r => (r.ts.getTime, r.id)).lastOption
          val fw = inWin.filter(_.ts.getTime * 1000 > lUs)
            .sortBy(r => (r.ts.getTime, r.id)).headOption
          val m = (bw, fw) match {
            case (Some(b), Some(f)) =>
              if (lUs - b.ts.getTime * 1000 <= f.ts.getTime * 1000 - lUs) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
          l.id -> m.map(_.id)
        }.toMap
      val got = emitted.map(m => m.left_id -> m.asof_id).toMap
      assert(emitted.size === got.size, s"case $caseNo: a left emitted twice")
      assert(got === expected, s"case $caseNo: batching ${batches.map(_.size)} diverged")
    }
  }

  test("right-history dominance pruning keeps results exact across many batches") {
    // rights arrive far apart; lefts interleave so the floor moves and
    // old rights prune — every match must still equal the batch operator
    val batches = Seq(
      Seq(r(1, 10, 1, 1.0), r(1, 20, 2, 2.0), l(1, 25, 100)),
      Seq(r(1, 100, 3, 3.0), l(1, 110, 101)),
      Seq(r(1, 300, 4, 4.0), l(1, 290, 102), l(1, 310, 103)),
      Seq(r(1, 900, 9, 9.0)),  // advances watermark past everything real
      Seq(r(2, 2000, 99, 0.0)))
    val out = run(batches)
    val all = batches.flatten
    val lefts = all.filter(a => !a.isRight && a.key == 1)
    val rights = all.filter(a => a.isRight && a.key == 1)
    val lDf = lefts.map(a => (a.key, a.ts, a.id)).toDF("user_id", "ts", "lid")
    val rDf = rights.map(a => (a.key, a.ts, a.id, a.payload)).toDF("user_id", "ts", "rid", "rv")
    val batch = graft.operators.AsOfJoin
      .asofJoin(lDf, rDf, "user_id", "ts", Seq("rid", "rv"), tieBreak = Some("rid"))
      .collect().map(x => x.getAs[Long]("lid") ->
        Option(x.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    val streamed = out.filter(_.key == 1).map(m => m.left_id -> m.asof_id).toMap
    assert(streamed === batch.filter { case (lid, _) => streamed.contains(lid) })
    // every real left except any in the final un-finalized tail emitted
    assert(streamed.keySet === Set(100L, 101L, 102L, 103L))
  }
}
