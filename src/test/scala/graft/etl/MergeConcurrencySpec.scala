package graft.etl

import graft.SparkSuite
import graft.sources.CommitMarker
import org.apache.spark.sql.functions._

/** Concurrent-writer detect-and-fail for the MERGE parquet stores (r14
  * verdict #5): two interleaved upserts cannot corrupt the store — the
  * one that committed first wins, the other aborts cleanly BEFORE
  * touching any partition, and the store afterwards holds exactly the
  * winner's merge. */
object MergeConcurrencySpec {
  // interleave injection shared with executor threads (local mode, one
  // JVM): the racing writer's epoch-file create, fired exactly once
  // from inside the victim's merge computation
  val racerFired = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile var racerTarget: java.io.File = _
}

class MergeConcurrencySpec extends SparkSuite {

  import spark.implicits._

  private def freshStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mcs").toString + "/store"
    Seq((1L, "a", "d1", 10L), (2L, "b", "d1", 10L), (3L, "c", "d2", 10L))
      .toDF("id", "v", "day", "ts")
      .write.partitionBy("day").parquet(dir)
    dir
  }

  private def readStore(dir: String): Map[Long, (String, Long)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("v"), r.getAs[Long]("ts"))).toMap

  test("serial upserts claim successive epochs and all succeed") {
    val dir = freshStore()
    assert(CommitMarker.currentEpoch(spark, dir) === 0L)
    Merge.upsertIntoParquet(spark, dir,
      Seq((2L, "b2", "d1", 20L)).toDF("id", "v", "day", "ts"), Seq("id"), "day")
    assert(CommitMarker.currentEpoch(spark, dir) === 1L)
    Merge.upsertIntoParquet(spark, dir,
      Seq((4L, "d", "d2", 30L)).toDF("id", "v", "day", "ts"), Seq("id"), "day")
    assert(CommitMarker.currentEpoch(spark, dir) === 2L)
    assert(readStore(dir) === Map(
      1L -> ("a", 10L), 2L -> ("b2", 20L), 3L -> ("c", 10L), 4L -> ("d", 30L)))
  }

  test("two interleaved upserts: one succeeds, one aborts cleanly, the store holds the winner's merge") {
    // deterministic interleave at the protocol level: writer B reads
    // base epoch 0 (by starting from the same fresh store state), then
    // writer A commits epoch 1 in between — B's publish-time claim of
    // epoch 1 must fail. The other writer having committed is exactly
    // what CommitMarker.claimEpochFrom arbitrates, so simulating B as
    // (read base, stage, claim) reproduces the race without timing
    // luck; the end-to-end loser path (staging cleaned, partitions
    // untouched) is pinned in the next test.
    val dir = freshStore()
    val baseB = CommitMarker.currentEpoch(spark, dir) // B's stale read: 0
    Merge.upsertIntoParquet(spark, dir, // A runs fully: commits epoch 1
      Seq((2L, "fromA", "d1", 20L)).toDF("id", "v", "day", "ts"), Seq("id"), "day")
    val e = intercept[CommitMarker.ConcurrentWriteException] {
      CommitMarker.claimEpochFrom(spark, dir, baseB) // B's publish gate
    }
    assert(e.getMessage.contains("aborted before touching any partition"),
      s"the loser's error must state the contract: ${e.getMessage}")
    assert(readStore(dir)(2L) === ("fromA", 20L), "the winner's merge holds")
  }

  test("the losing upsert leaves no trace: partitions untouched, staging cleaned, retry succeeds") {
    val dir = freshStore()
    Merge.upsertIntoParquet(spark, dir,
      Seq((2L, "fromA", "d1", 20L)).toDF("id", "v", "day", "ts"), Seq("id"), "day")
    val before = readStore(dir)
    // the racer commits epoch 2 INSIDE writer B's own merge window:
    // a typed-filter closure on B's source fires on B's first action —
    // deterministically after B read base epoch 1 at entry and before
    // B's publish-time claim of epoch 2 (local mode: same JVM)
    MergeConcurrencySpec.racerFired.set(false)
    MergeConcurrencySpec.racerTarget = new java.io.File(dir, "_GRAFT_EPOCH_2")
    val sourceB = Seq((3L, "fromB", "d2", 30L)).toDF("id", "v", "day", "ts")
      .filter { (_: org.apache.spark.sql.Row) =>
        if (MergeConcurrencySpec.racerFired.compareAndSet(false, true))
          MergeConcurrencySpec.racerTarget.createNewFile()
        true
      }
    val e = intercept[CommitMarker.ConcurrentWriteException] {
      Merge.upsertIntoParquet(spark, dir, sourceB, Seq("id"), "day")
    }
    assert(e.getMessage.contains("epoch"), e.getMessage)
    assert(readStore(dir) === before, "the loser must not touch the store")
    // no staging leftovers from the aborted writer
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("__staging")),
      s"aborted staging must be cleaned: ${parent.listFiles().map(_.getName).toSeq}")
    // the retry (fresh base read, past the racer's epoch) applies B's
    // merge on top of the winner
    Merge.upsertIntoParquet(spark, dir,
      Seq((3L, "fromB", "d2", 30L)).toDF("id", "v", "day", "ts"), Seq("id"), "day")
    assert(readStore(dir)(3L) === ("fromB", 30L))
    assert(readStore(dir)(2L) === ("fromA", 20L), "the winner's merge survives the retry")
  }

  test("epoch files are invisible to readers and pruned to bounded metadata") {
    val dir = freshStore()
    (1 to 5).foreach { i =>
      Merge.upsertIntoParquet(spark, dir,
        Seq((10L + i, s"v$i", "d1", i.toLong)).toDF("id", "v", "day", "ts"),
        Seq("id"), "day")
    }
    assert(CommitMarker.currentEpoch(spark, dir) === 5L)
    // underscore-prefixed files are hidden from Spark's file index
    assert(spark.read.parquet(dir).count() === 8L)
    // pruned: at most the current and previous epoch files survive
    val epochs = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("_GRAFT_EPOCH_")).toSeq
    assert(epochs.size <= 2, s"epoch files must stay bounded: $epochs")
  }
}
