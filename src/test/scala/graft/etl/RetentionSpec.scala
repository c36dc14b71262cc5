package graft.etl

import graft.SparkSuite
import graft.streaming.{SnapshotStream, SnapshotStreamSource}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._

/** Every RETENTION failure points at the one runbook section (r17
  * verdict #6): the vacuum(keep) ≥ checkpoint-lag + recovery-window and
  * graceMs > longest-publish-window rules live in README.md "Retention
  * sizing", and each of the four failure surfaces — streaming replay,
  * lineage holes, restore targets, publish grace — names it instead of
  * restating (or drifting from) the sizing prose. */
class RetentionSpec extends SparkSuite {

  import spark.implicits._

  private val Pointer = "Retention sizing"

  private def freshStore(): String =
    java.nio.file.Files.createTempDirectory("graft_retention").toString + "/store"

  private def upsert(store: String, rows: Seq[(Long, String, String, Long)]): Long =
    SnapshotMerge.upsert(spark, store,
      rows.toDF("id", "v", "day", "ts"), Seq("id"), "day")

  private def dropManifest(store: String, e: Long): Unit = {
    assert(new java.io.File(store, s"_GRAFT_SNAP_$e").delete())
    new java.io.File(store, s"._GRAFT_SNAP_$e.crc").delete()
  }

  test("every retention failure names the runbook: streaming replay, lineage hole, restore manifest, restore data, publish grace") {
    val store = freshStore()
    upsert(store, Seq((1L, "a", "d1", 10L)))  // epoch 1
    upsert(store, Seq((1L, "a2", "d1", 20L))) // epoch 2
    upsert(store, Seq((2L, "b", "d2", 30L)))  // epoch 3

    // 1) a streaming replay whose endpoint was vacuumed
    val src = new SnapshotStreamSource(spark, Map("path" -> store))
    val lineageSrc = new SnapshotStreamSource(spark,
      Map("path" -> store, "epochLineage" -> "true"))
    dropManifest(store, 2L)
    val replay = intercept[IllegalArgumentException] {
      src.getBatch(Some(LongOffset(2L)), LongOffset(3L))
    }
    assert(replay.getMessage.contains("vacuum(keep)") &&
      replay.getMessage.contains(Pointer), replay.getMessage)

    // 2) an epochLineage range with a vacuumed INTERIOR epoch (the net
    // mode only needs endpoints; lineage needs every epoch)
    val hole = intercept[IllegalArgumentException] {
      lineageSrc.getBatch(Some(LongOffset(1L)), LongOffset(3L))
    }
    assert(hole.getMessage.contains("epochLineage") &&
      hole.getMessage.contains("vacuum(keep)") &&
      hole.getMessage.contains(Pointer), hole.getMessage)

    // 3) a restore target whose manifest is gone
    val mgone = intercept[IllegalArgumentException] {
      SnapshotMerge.restoreTo(spark, store, 2L)
    }
    assert(mgone.getMessage.contains("vacuum(keep)") &&
      mgone.getMessage.contains(Pointer), mgone.getMessage)

    // 4) a restore target whose manifest survives but whose data is gone
    val d = new java.io.File(store, "day=d1/__e=1")
    d.listFiles().foreach(_.delete()); assert(d.delete())
    val dgone = intercept[IllegalStateException] {
      SnapshotMerge.restoreTo(spark, store, 1L)
    }
    assert(dgone.getMessage.contains("was vacuumed") &&
      dgone.getMessage.contains(Pointer), dgone.getMessage)

    // 5) a publish outliving the vacuum grace: its moved-in dirs swept
    // before the manifest commit (the pre-commit seam stands in for the
    // cross-thread sweep)
    val store2 = freshStore()
    upsert(store2, Seq((1L, "a", "d1", 10L)))
    SnapshotMerge.publishPreCommitHook = () => {
      new java.io.File(store2, "day=d2").listFiles().foreach { ed =>
        ed.listFiles().foreach(_.delete()); ed.delete()
      }
    }
    try {
      val grace = intercept[java.io.IOException] {
        upsert(store2, Seq((9L, "z", "d2", 90L)))
      }
      assert(grace.getMessage.contains("graceMs") &&
        grace.getMessage.contains(Pointer), grace.getMessage)
    } finally SnapshotMerge.publishPreCommitHook = () => ()
    // the aborted publish retracted cleanly: the store still reads
    assert(SnapshotMerge.read(spark, store2).count() === 1L)

    // the runbook section the messages name actually exists
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    assert(readme.contains("## Retention sizing"),
      "the runbook section every message points at must exist")
  }
}
