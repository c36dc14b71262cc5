package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S10 analog — a minimal manifest-file version log over parquet
  * snapshots (reference: delta_setup.py:548-634 VACUUM/history/restore).
  * Layout:
  *
  * {{{
  *   dir/_versions/v=3/...parquet   // immutable snapshot
  *   dir/_current                   // single-line pointer: "3"
  * }}}
  *
  * Single-writer (matching the reference's usage). `read` without a
  * version follows the pointer; with one, it time-travels. `restore`
  * moves only the pointer — old snapshots stay readable until `vacuum`.
  */
object VersionLog {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def currentPath(dir: String) = new Path(dir, "_current")

  def history(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val vdir = new Path(dir, "_versions")
    if (!f.exists(vdir)) Seq.empty
    else f.listStatus(vdir).map(_.getPath.getName).collect {
      case s if s.startsWith("v=") => s.stripPrefix("v=").toInt
    }.sorted.toSeq
  }

  /** Follows the `_current` pointer; if the pointer file is missing but
    * snapshots exist (a crash mid-`setPointer`, or an out-of-band delete)
    * it falls back to the newest snapshot rather than failing the table —
    * the one state that loses is a crash during a backward `restore`,
    * where the fallback resumes at the newest snapshot instead of the
    * intended older one (the restore can simply be re-issued). */
  def currentVersion(spark: SparkSession, dir: String): Option[Int] = {
    val f = fs(spark, dir)
    val p = currentPath(dir)
    if (!f.exists(p)) history(spark, dir).lastOption
    else {
      val in = f.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  /** Write `df` as the next snapshot and advance the pointer; returns the
    * new version number. */
  def commit(spark: SparkSession, df: DataFrame, dir: String): Int = {
    val next = history(spark, dir).lastOption.getOrElse(-1) + 1
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/_versions/v=$next")
    setPointer(spark, dir, next)
    next
  }

  /** Read the current snapshot, or time-travel to `version`. */
  def read(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, dir))
      .getOrElse(throw new IllegalStateException(s"no versions at $dir"))
    spark.read.parquet(s"$dir/_versions/v=$v")
  }

  /** Point the table back at an old snapshot (reference
    * restoreToVersion). */
  def restore(spark: SparkSession, dir: String, version: Int): Unit = {
    require(history(spark, dir).contains(version), s"unknown version $version")
    setPointer(spark, dir, version)
  }

  /** Change feed between two snapshots (Delta CDF analog,
    * delta_setup.py:461-467 enables CDF): full-row diff — rows only in
    * `to` are inserts, rows only in `from` are deletes; an update
    * surfaces as one of each. Distributed set difference via ONE netted
    * aggregation over both sides ([[NetDiff.tagged]]). */
  def changes(spark: SparkSession, dir: String, fromV: Int, toV: Int): DataFrame = {
    val hist = history(spark, dir)
    require(hist.contains(fromV) && hist.contains(toV),
      s"unknown versions $fromV/$toV (have: ${hist.mkString(",")})")
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV (labels would invert)")
    val before = read(spark, dir, Some(fromV))
    val after = read(spark, dir, Some(toV))
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshot schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    // align by NAME before the positional diff — a reordered commit
    // would otherwise diff same-typed columns positionally and emit garbage
    val beforeAligned = before.select(after.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    NetDiff.tagged(after, beforeAligned)
  }

  /** Drop snapshots older than the current pointer minus `keep`. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 1): Seq[Int] = {
    val f = fs(spark, dir)
    val cur = currentVersion(spark, dir).getOrElse(return Seq.empty)
    val dropped = history(spark, dir).filter(_ < cur - keep + 1)
    dropped.foreach(v => f.delete(new Path(s"$dir/_versions/v=$v"), true))
    dropped
  }

  /** q47 — the change feed exercised end-to-end as a registered query:
    * two deterministic snapshots derived from the events fixture are
    * committed to a fresh version-log table, and `changes(v0, v1)` is
    * rolled up per (change type, event type). The snapshots go through
    * real parquet commits + the pointer protocol — this is S10's
    * CDF/time-travel path under the oracle gate, not a unit test. The
    * oracle is plain EXCEPT ALL / UNION ALL SQL over the same fixture.
    *
    * Snapshot design (all pure functions of `events`):
    *  - v0 = event_id % 10 < 8                       (the baseline)
    *  - v1 = event_id % 10 < 9, minus 'error' rows,  (inserts + deletes)
    *    with click values bumped by 10                (updates → del+ins)
    */
  def changesRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Det.dsum
    val dir = q47Dir(sfDir)
    val ev = graft.Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    val v0 = ev.filter(col("event_id") % 10 < 8)
    val v1 = ev.filter(col("event_id") % 10 < 9)
      .filter(col("event_type").isNull || col("event_type") =!= "error")
      .withColumn("value",
        when(col("event_type") === "click", col("value") + lit(10.0)).otherwise(col("value")))
    // commit once per (JVM, sfDir): the snapshots are pure functions of
    // the fixture, so verify + bench in one session reuse the same
    // version pair instead of re-writing two parquet snapshots per call
    val (a, b) = q47Versions.computeIfAbsent(sfDir, { _ =>
      (commit(spark, v0, dir), commit(spark, v1, dir))
    })
    changes(spark, dir, a, b)
      .groupBy("_change_type", "event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      // nulls-last matches the oracle engine's ORDER BY default (Spark
      // defaults nulls-first) — event_type is nullable by contract
      .orderBy(col("_change_type"), col("event_type").asc_nulls_last)
  }

  // One scratch version-log per (JVM, sfDir), deleted on JVM exit — a
  // fresh createTempDirectory per call would leak two parquet snapshots
  // into /tmp on every verify/bench invocation of q47.
  private val q47Dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val q47Versions = new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()
  private def q47Dir(sfDir: String): String = q47Dirs.computeIfAbsent(sfDir, { _ =>
    val p = java.nio.file.Files.createTempDirectory("graft_vlog_q47")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }))
    p.toString
  })

  private val q47Sql = {
    val dsum = graft.functions.Det.sqlDsum _
    s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
       |a AS (SELECT event_id, event_type, value FROM ev WHERE event_id % 10 < 8),
       |b AS (SELECT event_id, event_type,
       |        CASE WHEN event_type = 'click' THEN value + cast(10.0 as double) ELSE value END AS value
       |      FROM ev WHERE event_id % 10 < 9 AND (event_type <> 'error' OR event_type IS NULL)),
       |ins AS (SELECT * FROM b EXCEPT ALL SELECT * FROM a),
       |del AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
       |feed AS (
       |  SELECT 'insert' AS _change_type, event_type, value FROM ins
       |  UNION ALL SELECT 'delete' AS _change_type, event_type, value FROM del)
       |SELECT _change_type, event_type, count(*) AS n, ${dsum("value")} AS total_value
       |FROM feed GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  }

  def all: Seq[graft.Q] = Seq(
    graft.Q("q47_version_changes", (s, d) => changesRollup(s, d), Some(q47Sql)))

  private def setPointer(spark: SparkSession, dir: String, v: Int): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_current.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // Atomic replace where the FS supports it — the delete-then-rename
    // alternative leaves a visible no-pointer window for crashes and
    // concurrent readers (currentVersion's fallback covers FSes without
    // atomic rename semantics).
    val conf = spark.sparkContext.hadoopConfiguration
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, conf)
    fc.rename(f.makeQualified(tmp), f.makeQualified(currentPath(dir)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
