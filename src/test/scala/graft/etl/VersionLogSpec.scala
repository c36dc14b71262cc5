package graft.etl

import graft.SparkSuite

class VersionLogSpec extends SparkSuite {
  import spark.implicits._

  test("commit/read/history/restore/vacuum round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vlog").toString + "/t"
    val v0 = VersionLog.commit(spark, Seq((1, "a")).toDF("id", "tag"), dir)
    val v1 = VersionLog.commit(spark, Seq((1, "a"), (2, "b")).toDF("id", "tag"), dir)
    val v2 = VersionLog.commit(spark, Seq((9, "z")).toDF("id", "tag"), dir)
    assert(Seq(v0, v1, v2) === Seq(0, 1, 2))
    assert(VersionLog.history(spark, dir) === Seq(0, 1, 2))

    assert(VersionLog.read(spark, dir).count() === 1) // current = v2
    assert(VersionLog.read(spark, dir, Some(1)).count() === 2) // time travel

    VersionLog.restore(spark, dir, 1)
    assert(VersionLog.read(spark, dir).count() === 2)
    assert(VersionLog.currentVersion(spark, dir) === Some(1))

    // change feed v1 → v2: (1,a),(2,b) → (9,z) = 1 insert + 2 deletes
    val feed = VersionLog.changes(spark, dir, 1, 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(feed === Set((9, "z", "insert"), (1, "a", "delete"), (2, "b", "delete")))

    // vacuum keeps current and newer; drops strictly older than cur-keep+1
    val dropped = VersionLog.vacuum(spark, dir, keep = 1)
    assert(dropped === Seq(0))
    assert(VersionLog.history(spark, dir) === Seq(1, 2))
  }

  test("missing _current pointer falls back to the newest snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vlog_fb").toString + "/t"
    VersionLog.commit(spark, Seq((1, "a")).toDF("id", "tag"), dir)
    VersionLog.commit(spark, Seq((1, "a"), (2, "b")).toDF("id", "tag"), dir)
    // simulate a crash that lost the pointer file
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_current"), false)
    assert(VersionLog.currentVersion(spark, dir) === Some(1))
    assert(VersionLog.read(spark, dir).count() === 2)
  }
}
