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
    * delta_setup.py:461-467 enables CDF): full-row diff via exceptAll —
    * rows only in `to` are inserts, rows only in `from` are deletes; an
    * update surfaces as one of each. Distributed set difference, one
    * shuffle per side. */
  def changes(spark: SparkSession, dir: String, fromV: Int, toV: Int): DataFrame = {
    val hist = history(spark, dir)
    require(hist.contains(fromV) && hist.contains(toV),
      s"unknown versions $fromV/$toV (have: ${hist.mkString(",")})")
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV (labels would invert)")
    val before = read(spark, dir, Some(fromV))
    val after = read(spark, dir, Some(toV))
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshot schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    // align by NAME before the positional exceptAll — a reordered commit
    // would otherwise diff same-typed columns positionally and emit garbage
    val beforeAligned = before.select(after.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    import org.apache.spark.sql.functions.lit
    after.exceptAll(beforeAligned).withColumn("_change_type", lit("insert"))
      .unionByName(beforeAligned.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  /** Drop snapshots older than the current pointer minus `keep`. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 1): Seq[Int] = {
    val f = fs(spark, dir)
    val cur = currentVersion(spark, dir).getOrElse(return Seq.empty)
    val dropped = history(spark, dir).filter(_ < cur - keep + 1)
    dropped.foreach(v => f.delete(new Path(s"$dir/_versions/v=$v"), true))
    dropped
  }

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
