package graft.streaming

import graft.SparkSuite
import graft.etl.SnapshotMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._

/** The streaming SOURCE over the snapshot store: offsets are committed
  * epochs, batches are net change rows, compaction epochs plan to zero
  * file reads, recovery replays deterministically, vacuumed history
  * fails loudly. */
class SnapshotStreamSpec extends SparkSuite {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_snapstream").toString

  private def upsert(store: String, rows: Seq[(Long, String, String, Long)]): Long =
    SnapshotMerge.upsert(spark, store,
      rows.toDF("id", "v", "day", "ts"), Seq("id"), "day")

  private def feedSet(df: DataFrame): Set[(String, Long, String, String)] =
    collectable(df).collect().map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("id"),
      r.getAs[String]("v"), r.getAs[String]("day"))).toSet

  /** getBatch returns the v1-contract STREAMING-marked frame, which the
    * engine splices rather than executes; to assert on its rows the
    * spec unwraps the marker (batch semantics are identical — the
    * LogicalRDD's lineage IS the already-planned batch diff). */
  private def collectable(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
          org.apache.spark.sql.execution.LogicalRDD(lr.output, lr.rdd)(
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
      case _ => df
    }

  test("live stream: initial snapshot, per-merge net diffs, zero-row compaction trigger") {
    val root = freshDir()
    val store = s"$root/A"
    upsert(store, Seq((1L, "a", "d1", 10L), (2L, "b", "d1", 10L), (3L, "c", "d2", 10L)))

    val sink = s"$root/sink"
    val q = spark.readStream.format(SnapshotStream.Format)
      .option("path", store).load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(sink)
      }
      .start()
    try {
      q.processAllAvailable()
      val boot = spark.read.parquet(sink)
      assert(feedSet(boot) === Set(
        ("insert", 1L, "a", "d1"), ("insert", 2L, "b", "d1"), ("insert", 3L, "c", "d2")))
      assert(boot.select("_commit_epoch").distinct().as[Long].collect().toSeq === Seq(1L))

      // epoch 2: update id2, MOVE id3 d2→d1, insert id4
      upsert(store, Seq((2L, "b2", "d1", 20L), (3L, "c", "d1", 10L), (4L, "d", "d3", 20L)))
      q.processAllAvailable()
      val afterMerge = spark.read.parquet(sink).filter(col("_commit_epoch") === 2L)
      assert(feedSet(afterMerge) === Set(
        ("delete", 2L, "b", "d1"), ("insert", 2L, "b2", "d1"),
        ("delete", 3L, "c", "d2"), ("insert", 3L, "c", "d1"),
        ("insert", 4L, "d", "d3")))

      // epoch 3: pure compaction — the batch must carry ZERO rows (the
      // dataChange=false manifest is skipped at planning time)
      val rowsBefore = spark.read.parquet(sink).count()
      assert(SnapshotMerge.compact(spark, store, maxFilesPerPartition = 0).contains(3L))
      q.processAllAvailable()
      assert(spark.read.parquet(sink).count() === rowsBefore,
        "a compaction epoch must stream zero rows")
      val compactBatches = q.recentProgress.filter(p =>
        p.batchId > 0 && p.numInputRows == 0)
      assert(compactBatches.nonEmpty,
        s"the offset must still advance across the compact epoch: " +
          q.recentProgress.map(p => (p.batchId, p.numInputRows)).toSeq)

      // epoch 4 after the compact: the diff reads the COMPACTED version
      upsert(store, Seq((1L, "a2", "d1", 40L)))
      q.processAllAvailable()
      val afterCompactMerge = spark.read.parquet(sink).filter(col("_commit_epoch") === 4L)
      assert(feedSet(afterCompactMerge) === Set(
        ("delete", 1L, "a", "d1"), ("insert", 1L, "a2", "d1")))
    } finally q.stop()
  }

  test("getBatch is a pure function of the offset range (deterministic recovery replay)") {
    val store = s"${freshDir()}/A"
    upsert(store, Seq((1L, "a", "d1", 10L), (2L, "b", "d2", 10L)))
    upsert(store, Seq((1L, "a2", "d1", 20L), (3L, "c", "d2", 20L)))
    val src = new SnapshotStreamSource(spark, Map("path" -> store))
    def batch(): Set[(String, Long, String, String)] =
      feedSet(src.getBatch(Some(LongOffset(1L)), LongOffset(2L)))
    val first = batch()
    assert(first === Set(
      ("delete", 1L, "a", "d1"), ("insert", 1L, "a2", "d1"), ("insert", 3L, "c", "d2")))
    assert(batch() === first, "a replayed range must reproduce itself exactly")
    // the returned frame satisfies the v1 contract: the plan IS
    // streaming while its internals execute as a batch diff
    assert(src.getBatch(Some(LongOffset(1L)), LongOffset(2L)).isStreaming)
    // initial batch (no start offset) = full snapshot at the end epoch
    assert(feedSet(src.getBatch(None, LongOffset(1L))) === Set(
      ("insert", 1L, "a", "d1"), ("insert", 2L, "b", "d2")))
  }

  test("planning: compaction-only ranges touch no partitions; merges touch exactly theirs") {
    val store = s"${freshDir()}/A"
    upsert(store, Seq((1L, "a", "d1", 10L), (2L, "b", "d2", 10L)))   // epoch 1
    upsert(store, Seq((1L, "a2", "d1", 20L)))                        // epoch 2: d1
    assert(SnapshotMerge.compact(spark, store, maxFilesPerPartition = 0).contains(3L))
    assert(SnapshotMerge.changedPartsBetween(spark, store, 1L, 2L) === Set("day=d1"))
    assert(SnapshotMerge.changedPartsBetween(spark, store, 2L, 3L) === Set.empty[String],
      "a pure-compact range must plan to zero partitions")
    assert(SnapshotMerge.changedPartsBetween(spark, store, 1L, 3L) === Set("day=d1"),
      "merge-then-compact still reads the merged partition")
    assert(SnapshotMerge.streamingChanges(spark, store, 2L, 3L, withDeletes = true)
      .count() === 0L)
  }

  test("epochLineage: multi-epoch batches stamp true commit epochs; compact epochs contribute nothing; back-and-forth keys keep both legs; a vacuumed hole fails loudly") {
    val store = s"${freshDir()}/A"
    upsert(store, Seq((1L, "a", "d1", 10L), (2L, "b", "d2", 10L)))  // epoch 1
    upsert(store, Seq((1L, "a2", "d1", 20L), (3L, "c", "d2", 20L))) // epoch 2
    assert(SnapshotMerge.compact(spark, store,
      maxFilesPerPartition = 0).contains(3L))                       // epoch 3
    upsert(store, Seq((2L, "b2", "d2", 40L)))                       // epoch 4
    val src = new SnapshotStreamSource(spark,
      Map("path" -> store, "epochLineage" -> "true"))
    def lineage(from: Long, to: Long): Set[(Long, String, Long, String)] =
      collectable(src.getBatch(Some(LongOffset(from)), LongOffset(to)))
        .collect().map(r => (r.getAs[Long]("_commit_epoch"),
          r.getAs[String]("_change_type"), r.getAs[Long]("id"),
          r.getAs[String]("v"))).toSet
    // one batch spanning (1, 4]: every row at ITS epoch, nothing at the
    // compact epoch 3
    assert(lineage(1L, 4L) === Set(
      (2L, "delete", 1L, "a"), (2L, "insert", 1L, "a2"), (2L, "insert", 3L, "c"),
      (4L, "delete", 2L, "b"), (4L, "insert", 2L, "b2")))
    // an all-compaction range plans to the correctly-shaped empty batch
    assert(collectable(src.getBatch(Some(LongOffset(2L)), LongOffset(3L)))
      .count() === 0L)
    // a key changed and changed BACK: the net mode cancels it; lineage
    // keeps both legs at their true epochs (Delta CDF's per-commit
    // semantics — changes are per commit, never netted across commits)
    upsert(store, Seq((3L, "cX", "d2", 50L)))  // epoch 5
    upsert(store, Seq((3L, "c", "d2", 20L)))   // epoch 6: the epoch-2 row again
    val net = new SnapshotStreamSource(spark, Map("path" -> store))
    assert(collectable(net.getBatch(Some(LongOffset(4L)), LongOffset(6L)))
      .count() === 0L, "the net mode cancels a back-and-forth key")
    assert(lineage(4L, 6L) === Set(
      (5L, "delete", 3L, "c"), (5L, "insert", 3L, "cX"),
      (6L, "delete", 3L, "cX"), (6L, "insert", 3L, "c")))
    // lineage cannot be reconstructed across a vacuumed hole: a missing
    // INTERIOR manifest fails loudly with the retention message (the
    // net mode only needs the endpoints)
    val gone = new java.io.File(store, "_GRAFT_SNAP_5")
    assert(gone.delete())
    new java.io.File(store, "._GRAFT_SNAP_5.crc").delete()
    val err = intercept[IllegalArgumentException] {
      src.getBatch(Some(LongOffset(4L)), LongOffset(6L))
    }
    assert(err.getMessage.contains("epochLineage") &&
      err.getMessage.contains("vacuum(keep)"), err.getMessage)
  }

  test("a widening inside a lineage range unions as nulls; a pin newer than the batch pads missing columns instead of wedging") {
    val store = s"${freshDir()}/A"
    upsert(store, Seq((1L, "a", "d1", 10L), (2L, "b", "d1", 10L)))  // epoch 1
    upsert(store, Seq((1L, "a2", "d1", 20L)))                        // epoch 2 (pre-widening)
    SnapshotMerge.upsert(spark, store,                               // epoch 3: widens with tag
      Seq((2L, "b2", "d1", 30L, "t")).toDF("id", "v", "day", "ts", "tag"),
      Seq("id"), "day")
    // both sources pin the POST-widening schema (tag present)
    val lin = new SnapshotStreamSource(spark,
      Map("path" -> store, "epochLineage" -> "true"))
    // r18 review #1: the strict unionByName threw AnalysisException on a
    // lineage range spanning the widening, wedging the stream on its own
    // replayed range — pre-widening sub-diffs must surface tag as null
    val rows = collectable(lin.getBatch(Some(LongOffset(1L)), LongOffset(3L)))
      .collect().map(r => (r.getAs[Long]("_commit_epoch"),
        r.getAs[String]("_change_type"), r.getAs[Long]("id"),
        r.getAs[String]("v"), r.getAs[String]("tag"))).toSet
    assert(rows === Set(
      (2L, "delete", 1L, "a", null), (2L, "insert", 1L, "a2", null),
      (3L, "delete", 2L, "b", null), (3L, "insert", 2L, "b2", "t")))
    // the same wedge existed in NET mode whenever the replayed range
    // ended BEFORE the widening epoch (a paced restart): the pinned
    // column the batch lacks pads as null — exactly what the widened
    // store answers for those rows itself
    val net = new SnapshotStreamSource(spark, Map("path" -> store))
    val preWiden = collectable(net.getBatch(Some(LongOffset(1L)), LongOffset(2L)))
    assert(preWiden.columns.contains("tag"))
    assert(preWiden.collect().forall(_.getAs[String]("tag") == null),
      "a pre-widening net batch must pad the pinned column with nulls")
    val initial = collectable(net.getBatch(None, LongOffset(1L)))
    assert(initial.collect().forall(_.getAs[String]("tag") == null),
      "a replayed pre-widening initial snapshot must pad, not wedge")
  }

  test("an epochLineage feed applies per commit through changeApplySink: inserted-then-deleted keys stay deleted, twice-updated keys stay unique") {
    val root = freshDir()
    val store = s"$root/A"
    val down = s"$root/down"
    upsert(store, Seq((1L, "a", "d1", 10L)))                      // epoch 1
    def start() = Streams.changeApplySink(
      spark.readStream.format(SnapshotStream.Format)
        .option("path", store).option("epochLineage", "true").load(),
      down, s"$root/ckpt", Seq("id"), "day").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()                // downstream @1
    // backlog: a key inserted THEN deleted, and a key updated TWICE —
    // the two shapes a net apply of a lineage feed corrupts (r18
    // review #2: resurrection and duplicate postimages)
    upsert(store, Seq((9L, "z", "d1", 20L)))                      // epoch 2
    SnapshotMerge.deleteWhere(spark, store, col("id") === 9L)     // epoch 3
    upsert(store, Seq((1L, "a2", "d1", 40L)))                     // epoch 4
    upsert(store, Seq((1L, "a3", "d1", 50L)))                     // epoch 5
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()                // ONE batch (1,5]
    val state = SnapshotMerge.read(spark, down).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v")))
    assert(state.toSet === Set((1L, "a3")), s"got ${state.toSeq}")
    assert(state.length === 1, "a twice-updated key must stay unique")
    // one downstream commit per upstream epoch, each a TRUE upstream
    // snapshot: id 9 exists exactly between its insert and its delete
    val epochs = SnapshotMerge.committedEpochs(spark, down)
    assert(epochs === Seq(1L, 2L, 3L, 4L, 5L), s"per-epoch slices: $epochs")
    def has9(e: Long): Boolean = SnapshotMerge.read(spark, down, Some(e))
      .filter(col("id") === 9L).count() > 0
    assert(has9(2L) && !has9(3L),
      "intermediate downstream epochs must reproduce true upstream snapshots")
  }

  test("withDeletes=false emits only the keyed final rows; maxEpochsPerTrigger paces the offset and survives a restart") {
    val root = freshDir()
    val store = s"$root/A"
    upsert(store, Seq((1L, "a", "d1", 10L)))
    upsert(store, Seq((1L, "a2", "d1", 20L)))
    upsert(store, Seq((2L, "b", "d2", 30L)))
    upsert(store, Seq((3L, "c", "d2", 40L)))
    val meta = s"$root/srcmeta"
    val src = new SnapshotStreamSource(spark,
      Map("path" -> store, "withDeletes" -> "false", "maxEpochsPerTrigger" -> "1"),
      Some(meta))
    // the replayed range seeds the pacing floor at its end epoch (2)
    assert(feedSet(src.getBatch(Some(LongOffset(1L)), LongOffset(2L))) === Set(
      ("insert", 1L, "a2", "d1")))
    // tip is 4, floor is 2 → the cap BINDS: one epoch per poll
    val o1 = src.getOffset.map(_.asInstanceOf[LongOffset].offset)
    val o2 = src.getOffset.map(_.asInstanceOf[LongOffset].offset)
    val o3 = src.getOffset.map(_.asInstanceOf[LongOffset].offset)
    assert(o1 === Some(3L) && o2 === Some(4L) && o3 === Some(4L),
      s"the cap must advance ONE epoch per poll to the tip: $o1 $o2 $o3")
    // RESTART: a fresh source over the same metadata dir restores the
    // pacing floor — the first post-restart poll must not hand the
    // uncapped tip to one batch (the r16 review's backlogged-recovery
    // hole)
    upsert(store, Seq((4L, "d", "d3", 50L)))
    upsert(store, Seq((5L, "e", "d3", 60L)))
    val restarted = new SnapshotStreamSource(spark,
      Map("path" -> store, "withDeletes" -> "false", "maxEpochsPerTrigger" -> "1"),
      Some(meta))
    val r1 = restarted.getOffset.map(_.asInstanceOf[LongOffset].offset)
    assert(r1 === Some(5L),
      s"restart must resume pacing from the persisted floor (4), not the tip: $r1")
  }

  test("a pacing floor stale behind the committed offset fails loudly, self-heals, and commit() durably refreshes the floor") {
    val root = freshDir()
    val store = s"$root/A"
    upsert(store, Seq((1L, "a", "d1", 10L)))
    upsert(store, Seq((2L, "b", "d1", 20L)))
    upsert(store, Seq((3L, "c", "d1", 30L)))
    upsert(store, Seq((4L, "d", "d1", 40L)))
    val meta = s"$root/srcmeta"
    // plant a floor of 1 while the engine's committed offset is 3 — the
    // floor-write-failed-then-crash state (r16 ADVICE)
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(meta))
    java.nio.file.Files.write(java.nio.file.Path.of(meta, "graft_pacing_floor"),
      "1".getBytes("UTF-8"))
    val src = new SnapshotStreamSource(spark,
      Map("path" -> store, "maxEpochsPerTrigger" -> "1"), Some(meta))
    // the stale floor makes the poll offer 2 — BEHIND the committed 3
    assert(src.getOffset.map(_.asInstanceOf[LongOffset].offset) === Some(2L))
    // the engine pairs that end with its committed start 3 → inverted;
    // planning it would silently net zero rows, regress the checkpoint,
    // and re-deliver epochs to a non-idempotent sink — fail LOUDLY
    val e = intercept[IllegalArgumentException] {
      src.getBatch(Some(LongOffset(3L)), LongOffset(2L))
    }
    assert(e.getMessage.contains("inverted"), e.getMessage)
    // ...and the failure re-seeded the floor from the committed start,
    // so a restarted source proceeds correctly: 4 = floor(3) + cap(1)
    val healed = new SnapshotStreamSource(spark,
      Map("path" -> store, "maxEpochsPerTrigger" -> "1"), Some(meta))
    assert(healed.getOffset.map(_.asInstanceOf[LongOffset].offset) === Some(4L))
    // commit() refreshes the floor file even when the in-memory floor
    // already holds the value — the exact state a failed getOffset
    // write leaves behind
    java.nio.file.Files.delete(java.nio.file.Path.of(meta, "graft_pacing_floor"))
    healed.commit(LongOffset(4L))
    val back = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of(meta, "graft_pacing_floor")), "UTF-8").trim
    assert(back === "4", s"commit must durably refresh the floor: $back")
  }

  test("vacuumed history fails the replay loudly; schema evolution upstream keeps the pinned projection") {
    val store = s"${freshDir()}/A"
    upsert(store, Seq((1L, "a", "d1", 10L)))
    val src = new SnapshotStreamSource(spark, Map("path" -> store))
    upsert(store, Seq((1L, "a2", "d1", 20L)))
    upsert(store, Seq((1L, "a3", "d1", 30L)))
    SnapshotMerge.vacuum(spark, store, keep = 1, graceMs = -1000L)
    val e = intercept[IllegalArgumentException] {
      src.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)

    // additive evolution mid-stream: the source keeps its PINNED schema
    val store2 = s"${freshDir()}/B"
    upsert(store2, Seq((1L, "a", "d1", 10L)))
    val src2 = new SnapshotStreamSource(spark, Map("path" -> store2))
    SnapshotMerge.upsert(spark, store2,
      Seq((2L, "b", "d1", 20L, "tagged")).toDF("id", "v", "day", "ts", "tag"),
      Seq("id"), "day")
    val widened = src2.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    assert(widened.columns.toSeq ===
      Seq("id", "v", "day", "ts", "_change_type", "_commit_epoch"),
      "new upstream columns are projected away until a restart repins")
    assert(feedSet(widened) === Set(("insert", 2L, "b", "d1")))

    // an empty store refuses to start (no schema to pin)
    val none = intercept[IllegalStateException] {
      new SnapshotStreamSource(spark, Map("path" -> s"${freshDir()}/empty"))
    }
    assert(none.getMessage.contains("no committed snapshot"), none.getMessage)
  }

  test("offset polls cost O(1) FS ops on a ~10³-epoch store: the tip pointer answers without listing the manifest directory") {
    val store = s"${freshDir()}/A"
    upsert(store, Seq((1L, "a", "d1", 10L)))
    // fabricate a 1000-epoch history: committedEpochs/tipEpoch read only
    // manifest NAMES + the pointer, so copies of the epoch-1 manifest
    // under bumped names are indistinguishable from real commits for
    // offset discovery (their content still parses — same schema/parts)
    val m1 = java.nio.file.Path.of(store, "_GRAFT_SNAP_1")
    (2 to 1000).foreach { e =>
      java.nio.file.Files.copy(m1, java.nio.file.Path.of(store, s"_GRAFT_SNAP_$e"))
    }
    java.nio.file.Files.write(java.nio.file.Path.of(store, "_GRAFT_TIP"),
      "1000".getBytes("UTF-8"))
    // the local FS keeps a checksum sidecar for the pointer; the raw
    // overwrite above stales it, which tipEpoch would (correctly) treat
    // as a torn pointer and fall back — this spec wants the HOT path
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Path.of(store, "._GRAFT_TIP.crc"))
    val hits0 = SnapshotMerge.tipPointerHits.get()
    val fb0 = SnapshotMerge.tipListingFallbacks.get()
    val src = new SnapshotStreamSource(spark, Map("path" -> store))
    (1 to 100).foreach { _ =>
      assert(src.getOffset.map(_.asInstanceOf[LongOffset].offset) === Some(1000L))
    }
    assert(SnapshotMerge.tipPointerHits.get() === hits0 + 100,
      "every poll must be answered by the pointer")
    assert(SnapshotMerge.tipListingFallbacks.get() === fb0,
      "no poll may fall back to the O(total epochs) listing")
  }

  test("keys mode: updates stream as pre/post image pairs per batch; pure inserts and deletes keep their types; bad options are refused") {
    val root = freshDir()
    val store = s"$root/A"
    val feed = s"$root/feed"
    upsert(store, Seq((1L, "a", "d1", 10L), (2L, "b", "d2", 10L)))
    val q = spark.readStream.format(SnapshotStream.Format)
      .option("path", store).option("keys", "id").load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(feed)
      }
      .start()
    try {
      q.processAllAvailable()
      // epoch 2: update key 1 (value change), MOVE key 2 d2→d1 with a
      // value change, insert key 3
      upsert(store, Seq((1L, "a2", "d1", 20L), (2L, "b2", "d1", 20L),
        (3L, "c", "d2", 20L)))
      q.processAllAvailable()
      // epoch 3: pure delete
      SnapshotMerge.deleteWhere(spark, store, col("id") === 3L)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(feed).collect()
      .map(r => (r.getAs[Long]("_commit_epoch"), r.getAs[String]("_change_type"),
        r.getAs[Long]("id"), r.getAs[String]("v"), r.getAs[String]("day"))).toSet
    assert(rows === Set(
      (1L, "insert", 1L, "a", "d1"), (1L, "insert", 2L, "b", "d2"),
      (2L, "update_preimage", 1L, "a", "d1"), (2L, "update_postimage", 1L, "a2", "d1"),
      (2L, "update_preimage", 2L, "b", "d2"), (2L, "update_postimage", 2L, "b2", "d1"),
      (2L, "insert", 3L, "c", "d2"),
      (3L, "delete", 3L, "c", "d2")),
      s"keyed classification per batch, moved keys paired across partitions: $rows")
    // keys mode needs both diff sides
    val both = intercept[IllegalArgumentException] {
      new SnapshotStreamSource(spark,
        Map("path" -> store, "keys" -> "id", "withDeletes" -> "false"))
    }
    assert(both.getMessage.contains("withDeletes"), both.getMessage)
    // a key that is not a store column is refused at construction
    val bad = intercept[IllegalArgumentException] {
      new SnapshotStreamSource(spark, Map("path" -> store, "keys" -> "nope"))
    }
    assert(bad.getMessage.contains("not a store column"), bad.getMessage)
  }

  test("a live downstream stream converges across an upstream RESTORE (the rollback diff flows as a normal net batch)") {
    val root = freshDir()
    val a = s"$root/bronze"
    val b = s"$root/silver"
    upsert(a, Seq((1L, "a", "d1", 10L), (2L, "b", "d2", 10L)))
    val q = Streams.changeApplySink(
      spark.readStream.format(SnapshotStream.Format).option("path", a).load(),
      b, s"$root/ckpt", Seq("id"), "day").start()
    try {
      q.processAllAvailable()
      // epoch 2: update key 1, insert key 3 — the merge the restore undoes
      upsert(a, Seq((1L, "a2", "d1", 20L), (3L, "c", "d3", 20L)))
      q.processAllAvailable()
      // epoch 3: RESTORE to epoch 1 (dataChange=true, metadata-only) —
      // the stream must deliver the INVERSE diff and the downstream
      // store must forget the rolled-back merge, key 3 included
      assert(SnapshotMerge.restoreTo(spark, a, 1L).contains(3L))
      q.processAllAvailable()
      def state(store: String): Map[Long, (String, String, Long)] =
        SnapshotMerge.read(spark, store).collect().map(r =>
          r.getAs[Long]("id") ->
            ((r.getAs[String]("v"), r.getAs[String]("day"), r.getAs[Long]("ts")))).toMap
      assert(state(b) === state(a),
        "downstream must converge across the restore")
      assert(state(b) === Map(1L -> ("a", "d1", 10L), 2L -> ("b", "d2", 10L)),
        "the restored state is the epoch-1 snapshot — the rolled-back " +
          "merge's update AND its insert are both undone downstream")
      // a post-restore merge keeps flowing
      upsert(a, Seq((4L, "d", "d1", 40L)))
      q.processAllAvailable()
      assert(state(b) === state(a) && state(b).contains(4L))
    } finally q.stop()
  }

  test("a keys-mode stream chained through changeApplySink converges: postimages land as upserts, preimages are superseded") {
    val root = freshDir()
    val a = s"$root/bronze"
    val b = s"$root/silver"
    upsert(a, Seq((1L, "a", "d1", 10L), (2L, "b", "d2", 10L)))
    val q = Streams.changeApplySink(
      spark.readStream.format(SnapshotStream.Format)
        .option("path", a).option("keys", "id").load(),
      b, s"$root/ckpt", Seq("id"), "day").start()
    try {
      q.processAllAvailable()
      // a batch whose net diff is ALL updates (the r17 review's exact
      // failure case: no insert rows, only pre/post pairs)
      upsert(a, Seq((1L, "a2", "d1", 20L), (2L, "b2", "d2", 20L)))
      q.processAllAvailable()
      // mixed batch: update + move + insert, then a pure delete
      upsert(a, Seq((2L, "b3", "d1", 30L), (3L, "c", "d3", 30L)))
      q.processAllAvailable()
      SnapshotMerge.deleteWhere(spark, a, col("id") === 1L)
      q.processAllAvailable()
      def state(store: String): Map[Long, (String, String, Long)] =
        SnapshotMerge.read(spark, store).collect().map(r =>
          r.getAs[Long]("id") ->
            ((r.getAs[String]("v"), r.getAs[String]("day"), r.getAs[Long]("ts")))).toMap
      assert(state(b) === state(a),
        "the downstream store must converge across update-only, mixed, " +
          "and delete batches of a keyed stream")
      assert(state(b) === Map(2L -> ("b3", "d1", 30L), 3L -> ("c", "d3", 30L)))
    } finally q.stop()
  }

  test("medallion chaining: changeApplySink converges the downstream store to the upstream final state, deletes included") {
    val root = freshDir()
    val a = s"$root/bronze"
    val b = s"$root/silver"
    upsert(a, Seq((1L, "a", "d1", 10L), (2L, "b", "d1", 10L), (3L, "c", "d2", 10L)))
    // deletes flow (the default): the upstream runs a predicate DELETE
    // below, whose only downstream trace is its delete CDF rows
    val q = Streams.changeApplySink(
      spark.readStream.format(SnapshotStream.Format).option("path", a).load(),
      b, s"$root/ckpt", Seq("id"), "day").start()
    try {
      q.processAllAvailable()
      // upstream merge with update + moved key + insert, then compact
      upsert(a, Seq((2L, "b2", "d1", 20L), (3L, "c", "d1", 10L), (4L, "d", "d3", 20L)))
      q.processAllAvailable()
      SnapshotMerge.compact(spark, a, maxFilesPerPartition = 0)
      q.processAllAvailable()
      upsert(a, Seq((4L, "d2", "d3", 40L)))
      q.processAllAvailable()
      // upstream predicate DELETE (the erasure case, r16 review): the
      // downstream keyed apply must actually REMOVE the key
      SnapshotMerge.deleteWhere(spark, a, col("id") === 2L)
      q.processAllAvailable()
      def state(store: String): Map[Long, (String, String, Long)] =
        SnapshotMerge.read(spark, store).collect().map(r =>
          r.getAs[Long]("id") ->
            ((r.getAs[String]("v"), r.getAs[String]("day"), r.getAs[Long]("ts")))).toMap
      assert(!state(a).contains(2L))
      assert(state(b) === state(a),
        "downstream must converge across merges, a compact, AND a predicate delete")
      // the zero-row compact batch must not have burned a downstream
      // epoch: 4 data-changing upstream commits → 4 downstream epochs
      val bEpochs = SnapshotMerge.committedEpochs(spark, b)
      assert(bEpochs.size === 4,
        s"4 data-changing upstream epochs → 4 downstream epochs, got $bEpochs")
    } finally q.stop()
  }

  test("epochLineage with no explicit pacing defaults a bounded recovery width; explicit pacing and net mode are unchanged") {
    val root = freshDir()
    val store = s"$root/A"
    // a 70-epoch backlog past the stream's floor (epoch 2): wider than
    // the 64-epoch lineage default, so the cap must BIND
    (1 to 70).foreach(i => upsert(store, Seq((i % 5L, s"v$i", "d1", i.toLong))))
    assert(SnapshotStream.DefaultLineageEpochsPerTrigger === 64L,
      "the spec's backlog math pins the documented default")
    val meta = s"$root/srcmeta"
    val src = new SnapshotStreamSource(spark,
      Map("path" -> store, "epochLineage" -> "true"), Some(meta))
    // an engine replay seeds the floor at 2 (the restart-with-backlog
    // shape the default exists for)
    collectable(src.getBatch(Some(LongOffset(1L)), LongOffset(2L))).collect()
    val o1 = src.getOffset.map(_.asInstanceOf[LongOffset].offset)
    assert(o1 === Some(2L + 64L),
      s"lineage with no explicit pacing must offer floor + 64, not the tip: $o1")
    // the capped batch plans and executes (64 union branches, bounded)
    val batch = collectable(src.getBatch(Some(LongOffset(2L)), LongOffset(66L)))
    val es = batch.select("_commit_epoch").distinct()
      .collect().map(_.getLong(0))
    assert(es.min >= 3L && es.max <= 66L && es.length <= 64,
      s"per-batch lineage span must stay within the default cap: ${es.sorted.toSeq}")
    val o2 = src.getOffset.map(_.asInstanceOf[LongOffset].offset)
    assert(o2 === Some(70L), s"the next poll reaches the tip: $o2")
    // an explicit maxEpochsPerTrigger still overrides the default
    val explicit = new SnapshotStreamSource(spark,
      Map("path" -> store, "epochLineage" -> "true",
        "maxEpochsPerTrigger" -> "100"), Some(s"$root/srcmeta2"))
    collectable(explicit.getBatch(Some(LongOffset(1L)), LongOffset(2L))).collect()
    assert(explicit.getOffset.map(_.asInstanceOf[LongOffset].offset) === Some(70L),
      "an explicit cap wider than the backlog must offer the tip")
    // net mode keeps its unbounded default: ONE diff whatever the range
    val net = new SnapshotStreamSource(spark,
      Map("path" -> store), Some(s"$root/srcmeta3"))
    collectable(net.getBatch(Some(LongOffset(1L)), LongOffset(2L))).collect()
    assert(net.getOffset.map(_.asInstanceOf[LongOffset].offset) === Some(70L),
      "net mode with no pacing option must stay unpaced")
  }
}
