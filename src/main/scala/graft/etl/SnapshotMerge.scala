package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.sources.CommitMarker

/** Snapshot-isolated MERGE store over plain parquet — the manifest log
  * that closes the torn-reader window [[Merge.upsertIntoParquet]]
  * documents as its residual scope (reference: delta-lake/delta_setup.py
  * gets this from Delta's transaction log; this is the same protocol on
  * partition granularity, with no Delta jar in the environment).
  *
  * Layout (all control files `_`-prefixed, invisible to Spark scans):
  *
  * {{{
  *   store/day=2024-01-01/__e=3/part-*.parquet   // immutable partition version
  *   store/day=2024-01-02/__e=7/part-*.parquet
  *   store/_GRAFT_SNAP_7                          // manifest: epoch, schema,
  *                                                //   partition -> epoch map
  *   store/_GRAFT_EPOCH_7                         // CommitMarker claim files
  * }}}
  *
  * Why this shape and not [[VersionLog]]'s: VersionLog re-writes the FULL
  * table per commit (fine for small marts, fatal at 100 TB); this store
  * re-writes only the partitions a merge touches (like
  * `Merge.upsertIntoParquet`) but publishes them as NEW `__e={epoch}`
  * subdirectories plus one atomically-renamed manifest, never deleting a
  * file any committed snapshot references. Readers therefore get:
  *
  *  - '''Snapshot isolation''': [[read]] resolves the newest manifest at
  *    PLAN time and pins exactly its files; a concurrent MERGE publishing
  *    epoch N+1 adds new directories and a new manifest but touches
  *    nothing epoch N references, so in-flight reads never see a torn
  *    mix of old and new partitions (the failure mode the swap-based
  *    store accepts and documents).
  *  - '''Time travel''': `read(asOf = Some(e))` for any epoch still
  *    inside the vacuum retention, on the partitioned store rather than
  *    VersionLog's full-copy snapshots.
  *  - '''Detect-and-fail concurrency''': publish rides
  *    [[CommitMarker.claimEpochFrom]] — a merge computed against a stale
  *    snapshot aborts before its manifest (or any reader-visible state)
  *    lands; its already-moved `__e` directories are unreferenced orphans
  *    that [[vacuum]] sweeps.
  *
  * Crash truth table (writer dies at any point):
  *  - before the claim → staging dir self-cleans / is an inert sibling;
  *  - after the claim, before the manifest rename → orphan `__e` dirs
  *    referenced by no manifest (vacuum sweeps); the next writer claims
  *    the next epoch and proceeds;
  *  - the manifest rename is the commit point (atomic on HDFS/local/ABFS
  *    — same FileContext.rename(OVERWRITE) the VersionLog pointer uses).
  *
  * Scale posture: the manifest is O(live partitions) of metadata read
  * once per plan — the same class as Delta's checkpoint, not a data
  * read. Reads hand Spark the explicit partition-version directories
  * with `basePath`, so the partition column stays a partition column:
  * partition pruning and pushed filters behave exactly as on the plain
  * layout. MERGE cost is unchanged from `upsertIntoParquet` (one
  * left-anti shuffle + touched-partition rewrite); publish adds one
  * rename per touched partition and one manifest write.
  *
  * Contract: single logical schema per store (the manifest carries it;
  * sources must present every store column — same contract as the swap
  * store). Vacuumed epochs stop being time-travelable; a reader pinned
  * to a snapshot older than the retention can lose files mid-read —
  * Delta's VACUUM makes the identical trade.
  */
object SnapshotMerge {

  /** One committed table version: its epoch, the logical row schema at
    * commit time, and for each live partition DIRECTORY NAME (Spark's
    * escaped `col=value` form) the epoch whose `__e={epoch}` subdir
    * holds its current rows. */
  final case class Snapshot(epoch: Long, schema: StructType, parts: Map[String, Long])

  private val SnapPrefix = "_GRAFT_SNAP_"
  private val EpochDir = "__e="
  private val EpochCol = "__e"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Epochs with a committed manifest, ascending (committed = the
    * manifest rename landed; foreign files sharing the prefix are
    * skipped, as in CommitMarker). */
  def committedEpochs(spark: SparkSession, store: String): Seq[Long] = {
    val p = new Path(store)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(SnapPrefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(SnapPrefix).toLong).toOption)
      .sorted
  }

  /** Parse the manifest of `epoch`. */
  def snapshot(spark: SparkSession, store: String, epoch: Long): Snapshot = {
    val p = new Path(store, s"$SnapPrefix$epoch")
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    val text =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    var schema: StructType = null
    val parts = Map.newBuilder[String, Long]
    text.split('\n').iterator.map(_.stripSuffix("\r")).filter(_.nonEmpty).foreach {
      case l if l.startsWith("schema\t") =>
        schema = DataType.fromJson(l.substring("schema\t".length)).asInstanceOf[StructType]
      case l if l.startsWith("part\t") =>
        val rest = l.substring("part\t".length)
        val sep = rest.indexOf('\t')
        parts += rest.substring(sep + 1) -> rest.substring(0, sep).toLong
      case _ => () // "epoch\tN" header (redundant with the file name) or unknown
    }
    require(schema != null, s"manifest $p carries no schema line")
    Snapshot(epoch, schema, parts.result())
  }

  /** The newest committed snapshot, if any. */
  def latestSnapshot(spark: SparkSession, store: String): Option[Snapshot] =
    committedEpochs(spark, store).lastOption.map(snapshot(spark, store, _))

  /** Snapshot-isolated read: the newest manifest (or `asOf`) resolved
    * NOW, its partition-version directories handed to the scan
    * explicitly. The returned frame keeps reading that snapshot however
    * late its actions run — later merges only add files. The manifest
    * schema is passed as the user schema (partition values included),
    * so read-back types and column order are exactly the committed
    * logical schema, independent of partition-type inference. */
  def read(spark: SparkSession, store: String, asOf: Option[Long] = None): DataFrame = {
    val epoch = asOf.getOrElse(
      committedEpochs(spark, store).lastOption.getOrElse(
        throw new IllegalStateException(s"no committed snapshot at $store")))
    val snap = snapshot(spark, store, epoch)
    readSnapshot(spark, store, snap)
  }

  private def readSnapshot(spark: SparkSession, store: String, snap: Snapshot): DataFrame = {
    val cols = snap.schema.fields.map(f => col(f.name)).toIndexedSeq
    if (snap.parts.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], snap.schema)
    } else {
      val dirs = snap.parts.toSeq.sortBy(_._1)
        .map { case (name, e) => s"${store.stripSuffix("/")}/$name/$EpochDir$e" }
      spark.read
        .schema(snap.schema.add(EpochCol, LongType))
        .option("basePath", store)
        .parquet(dirs: _*)
        .select(cols: _*)
    }
  }

  /** MERGE upsert (same row semantics as [[Merge.upsert]]: matched keys
    * replaced, unmatched inserted, matched keys whose partition value
    * moved rewritten out of their old partition) committing a new
    * snapshot epoch. Returns the committed epoch. An empty store
    * bootstraps: epoch 1 = the source itself. */
  def upsert(
      spark: SparkSession,
      store: String,
      source: DataFrame,
      keys: Seq[String],
      partitionCol: String): Long = {
    require(source.columns.contains(partitionCol),
      s"source must carry the partition column $partitionCol")
    val storePath = new Path(store)
    val fs = fsOf(spark, storePath)
    val base = latestSnapshot(spark, store)
    // claim base = max(published, claimed): a claim without a manifest is
    // a crashed writer that never published — its epoch number is burnt,
    // its state is invisible, the merge reads the last PUBLISHED snapshot
    val claimBase = math.max(base.map(_.epoch).getOrElse(0L),
      CommitMarker.currentEpoch(spark, store))
    base.foreach { s =>
      require(s.schema.fieldNames.toSet.subsetOf(source.columns.toSet),
        s"source is missing store columns ${s.schema.fieldNames.toSet -- source.columns}")
    }
    val targetRaw = base.map(readSnapshot(spark, store, _))
      .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(source.schema.fields)))
    // SCHEMA EVOLUTION (additive, the Delta mergeSchema shape): a source
    // column the store lacks widens the store — existing rows read it as
    // null; the merged schema (and every later manifest) is the SOURCE's
    // column set and order. Column DROPS are refused by the require
    // above — silently forgetting data is not a merge.
    val target = source.columns.foldLeft(targetRaw) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(source.schema(c).dataType))
    }.select(source.columns.map(col).toIndexedSeq: _*)
    val sourceParts = source.select(partitionCol).distinct()
    val movedParts = target
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .select(partitionCol).distinct()
    val touched = sourceParts.union(movedParts).distinct()
    val affected = target.join(
      broadcast(touched.withColumnRenamed(partitionCol, "__p")),
      target(partitionCol) <=> col("__p"), "left_semi")
    val merged = Merge.upsert(affected, source, keys)
    // partition METADATA (one value per touched partition), collected
    // before any publish step — same bound as Merge.upsertIntoParquet
    val touchedVals = touched.collect().map(r => Option(r.get(0)).map(_.toString))
    val touchedNames = touchedVals.map(partDirName(partitionCol, _)).toSet

    val staging = store.stripSuffix("/") + "__staging_" +
      java.util.UUID.randomUUID().toString.take(8)
    val stagingPath = new Path(staging)
    val next =
      try {
        merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(staging)
        // publish gate — throws ConcurrentWriteException (staging cleaned,
        // nothing reader-visible happened) when any writer committed or
        // claimed since our base read
        CommitMarker.claimEpochFrom(spark, store, claimBase)
      } catch {
        case e: Throwable =>
          try fs.delete(stagingPath, true) catch { case _: Throwable => () }
          throw e
      }
    // ADDITIVE publish: each staged `col=value` dir becomes that
    // partition's `__e={next}` version subdir. Nothing referenced by any
    // committed manifest is deleted or renamed over — a crash mid-loop
    // orphans unreferenced dirs only (vacuum sweeps them).
    val stagedDirs = fs.listStatus(stagingPath).filter(_.isDirectory)
    val stagedNames = stagedDirs.map(_.getPath.getName).toSet
    stagedDirs.foreach { st =>
      val parent = new Path(storePath, st.getPath.getName)
      fs.mkdirs(parent)
      fs.rename(st.getPath, new Path(parent, s"$EpochDir$next"))
    }
    fs.delete(stagingPath, true)
    // a touched partition with no staged dir ended EMPTY (its only rows
    // were matched keys that moved partition): it simply leaves the
    // manifest — no deletion dance, old epochs still time-travel to it
    val baseParts = base.map(_.parts).getOrElse(Map.empty[String, Long])
    val parts = baseParts.filterNot { case (n, _) => touchedNames(n) } ++
      stagedNames.iterator.map(_ -> next)
    writeManifest(fs, spark, storePath, Snapshot(next, merged.schema, parts))
    next
  }

  private def partDirName(partitionCol: String, v: Option[String]): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    v match {
      case Some(s) => s"$partitionCol=${ExternalCatalogUtils.escapePathName(s)}"
      case None    => s"$partitionCol=${ExternalCatalogUtils.DEFAULT_PARTITION_NAME}"
    }
  }

  /** Commit point: write `.{SnapPrefix}{epoch}.inprogress` (dot-hidden,
    * never matches the manifest listing), then atomically rename into
    * place. The claim made `epoch` this writer's alone, so the rename
    * target cannot be contended. */
  private def writeManifest(fs: FileSystem, spark: SparkSession,
                            storePath: Path, snap: Snapshot): Unit = {
    val tmp = new Path(storePath, s".$SnapPrefix${snap.epoch}.inprogress")
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      sb.append("epoch\t").append(snap.epoch).append('\n')
      sb.append("schema\t").append(snap.schema.json).append('\n')
      snap.parts.toSeq.sortBy(_._1).foreach { case (name, e) =>
        sb.append("part\t").append(e).append('\t').append(name).append('\n')
      }
      out.write(sb.result().getBytes("UTF-8"))
    } finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sessionState.newHadoopConf())
    fc.rename(fs.makeQualified(tmp),
      fs.makeQualified(new Path(storePath, s"$SnapPrefix${snap.epoch}")),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Change feed between two committed epochs (Delta CDF analog on the
    * PARTITIONED store — [[VersionLog.changes]] gives the same contract
    * on full-copy snapshots): full-row diff via `exceptAll` — rows only
    * in `toE` are inserts, rows only in `fromE` deletes, an update one
    * of each. Columns are aligned by name against `toE`'s manifest
    * schema (schema evolution adds columns; older snapshots read them
    * as null through their own manifest schema widened here by the
    * positional union contract being name-aligned first). Distributed
    * set difference — one shuffle per side, never a collect. */
  def changes(spark: SparkSession, store: String, fromE: Long, toE: Long): DataFrame = {
    val have = committedEpochs(spark, store)
    require(have.contains(fromE) && have.contains(toE),
      s"unknown epochs $fromE/$toE (have: ${have.mkString(",")})")
    require(fromE <= toE, s"fromE $fromE must be <= toE $toE (labels would invert)")
    val after = read(spark, store, Some(toE))
    val beforeRaw = read(spark, store, Some(fromE))
    // align by NAME to the after-schema before the positional exceptAll;
    // a column the older snapshot never had reads as null
    val before = after.columns.foldLeft(beforeRaw) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(after.schema(c).dataType))
    }.select(after.columns.map(col).toIndexedSeq: _*)
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  /** OPTIMIZE analog with snapshot isolation: rewrite the current
    * snapshot's most FRAGMENTED partitions (file count above
    * `maxFilesPerPartition`) as a new epoch — coalesced output, no
    * logical change, readers of prior epochs untouched. A long-running
    * [[graft.streaming.Streams.snapshotMergeSink]] stream appends one
    * file set per trigger per touched partition; this is the compaction
    * that keeps read amplification bounded without stopping the stream
    * (the epoch claim arbitrates against concurrent merges like any
    * writer). Returns the committed epoch, or None when nothing is
    * fragmented enough to rewrite. */
  def compact(spark: SparkSession, store: String,
              maxFilesPerPartition: Int = 8): Option[Long] = {
    val base = latestSnapshot(spark, store).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $store"))
    val storePath = new Path(store)
    val fs = fsOf(spark, storePath)
    val fragmented = base.parts.filter { case (name, e) =>
      val d = new Path(storePath, s"$name/$EpochDir$e")
      fs.exists(d) && fs.listStatus(d).count(s =>
        s.isFile && !s.getPath.getName.startsWith("_")) > maxFilesPerPartition
    }
    if (fragmented.isEmpty) return None
    val claimBase = math.max(base.epoch, CommitMarker.currentEpoch(spark, store))
    val dirs = fragmented.toSeq.sortBy(_._1)
      .map { case (name, e) => s"${store.stripSuffix("/")}/$name/$EpochDir$e" }
    val rows = spark.read
      .schema(base.schema.add(EpochCol, LongType))
      .option("basePath", store)
      .parquet(dirs: _*)
      .select(base.schema.fields.map(f => col(f.name)).toIndexedSeq: _*)
    val partitionCol = {
      // the partition column is the prefix of every partition dir name
      val n = fragmented.keysIterator.next()
      n.substring(0, n.indexOf('='))
    }
    // one shuffle task per rewritten partition → ONE file per partition
    // (the compaction contract); the shuffle moves only the fragmented
    // partitions' rows, never the table
    val compacted = rows.repartition(math.max(1, fragmented.size), col(partitionCol))
    // same publish protocol as upsert: stage → claim → move in → manifest
    val staging = store.stripSuffix("/") + "__staging_" +
      java.util.UUID.randomUUID().toString.take(8)
    val stagingPath = new Path(staging)
    val next =
      try {
        compacted.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(staging)
        CommitMarker.claimEpochFrom(spark, store, claimBase)
      } catch {
        case e: Throwable =>
          try fs.delete(stagingPath, true) catch { case _: Throwable => () }
          throw e
      }
    val stagedDirs = fs.listStatus(stagingPath).filter(_.isDirectory)
    val stagedNames = stagedDirs.map(_.getPath.getName).toSet
    stagedDirs.foreach { st =>
      val parent = new Path(storePath, st.getPath.getName)
      fs.mkdirs(parent)
      fs.rename(st.getPath, new Path(parent, s"$EpochDir$next"))
    }
    fs.delete(stagingPath, true)
    val parts = base.parts.filterNot { case (n, _) => fragmented.contains(n) } ++
      stagedNames.iterator.map(_ -> next)
    writeManifest(fs, spark, storePath, Snapshot(next, base.schema, parts))
    Some(next)
  }

  /** Drop everything outside the newest `keep` snapshots: older
    * manifests, partition-version dirs they alone reference, and
    * orphaned `__e` dirs from crashed publishes (epoch ≤ newest kept —
    * anything newer may be a publish IN FLIGHT and is left alone).
    * Returns the deleted paths. Readers pinned to a vacuumed snapshot
    * lose isolation — the Delta VACUUM trade, caller-chosen via
    * `keep`. */
  def vacuum(spark: SparkSession, store: String, keep: Int = 1): Seq[String] = {
    require(keep >= 1, "keep must retain at least the current snapshot")
    val storePath = new Path(store)
    val fs = fsOf(spark, storePath)
    val all = committedEpochs(spark, store)
    if (all.isEmpty) return Nil
    val kept = all.takeRight(keep)
    val maxKept = kept.last
    val referenced: Set[(String, Long)] =
      kept.flatMap(e => snapshot(spark, store, e).parts.iterator.map {
        case (n, pe) => (n, pe)
      }).toSet
    val deleted = Seq.newBuilder[String]
    fs.listStatus(storePath).filter(_.isDirectory).foreach { pd =>
      val pname = pd.getPath.getName
      if (!pname.startsWith("_") && !pname.startsWith(".")) {
        var live = 0
        fs.listStatus(pd.getPath).foreach { ed =>
          val en = ed.getPath.getName
          if (en.startsWith(EpochDir)) {
            val e = scala.util.Try(en.stripPrefix(EpochDir).toLong).toOption
            if (e.exists(v => v <= maxKept && !referenced((pname, v)))) {
              fs.delete(ed.getPath, true)
              deleted += ed.getPath.toString
            } else live += 1
          } else live += 1
        }
        if (live == 0) { fs.delete(pd.getPath, true); deleted += pd.getPath.toString }
      }
    }
    all.dropRight(keep).foreach { e =>
      val m = new Path(storePath, s"$SnapPrefix$e")
      if (fs.delete(m, false)) deleted += m.toString
    }
    deleted.result()
  }

  // ------------------------------------------------------------------
  // q110 — the snapshot store end-to-end under the driver's oracle:
  // bootstrap + two MERGE epochs (updates, inserts, and a moved
  // partition key in each), then aggregate the FINAL snapshot through
  // the snapshot reader. The oracle recomputes the same three-state
  // fold declaratively in DuckDB. Store built once per (JVM, sfDir) —
  // the snapshots are pure functions of the events fixture.
  // ------------------------------------------------------------------

  private val q110Dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def q110Store(spark: SparkSession, sfDir: String): String =
    q110Dirs.computeIfAbsent(graft.PathKey(sfDir), { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_snapmerge_q110")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path => JPath}
        import java.util.Comparator
        if (Files.exists(root))
          Files.walk(root).sorted(Comparator.reverseOrder[JPath]())
            .forEach(f => Files.deleteIfExists(f))
      }))
      val store = root.toString + "/store"
      val ev = graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          to_date(col("ts")).cast("string").as("day"))
      // epoch 1: bootstrap = 80% of events
      upsert(spark, store, ev.filter(col("event_id") % 10 < 8),
        Seq("event_id"), "day")
      // epoch 2: ids %10 >= 6 — 6,7 matched (6 also MOVES day +1), 8,9 inserts
      upsert(spark, store,
        ev.filter(col("event_id") % 10 >= 6)
          .withColumn("value", col("value") + lit(1000.0))
          .withColumn("day",
            when(col("event_id") % 10 === 6,
              date_add(col("day").cast("date"), 1).cast("string"))
              .otherwise(col("day"))),
        Seq("event_id"), "day")
      // epoch 3: ids %10 in (0,5) — both matched, values doubled
      upsert(spark, store,
        ev.filter(col("event_id") % 10 === 0 || col("event_id") % 10 === 5)
          .withColumn("value", col("value") * lit(2.0)),
        Seq("event_id"), "day")
      store
    })

  /** q110 — per-day rollup of the snapshot store's FINAL state, read
    * through the manifest (snapshot-isolated) reader. */
  def snapshotMergeRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Det.dsum
    read(spark, q110Store(spark, sfDir))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      // nulls-last matches the oracle engine's ORDER BY default (a null
      // day exists iff the fixture ships null timestamps)
      .orderBy(col("day").asc_nulls_last)
  }

  private val q110Sql = {
    val dsum = graft.functions.Det.sqlDsum _
    s"""WITH ev AS (
       |  SELECT event_id, user_id, event_type, value,
       |         cast(cast(ts AS date) AS varchar) AS day
       |  FROM events),
       |v0 AS (SELECT * FROM ev WHERE event_id % 10 < 8),
       |u1 AS (
       |  SELECT event_id, user_id, event_type, value + 1000.0 AS value,
       |         CASE WHEN event_id % 10 = 6
       |              THEN cast(cast(day AS date) + INTERVAL 1 DAY AS date)::varchar
       |              ELSE day END AS day
       |  FROM ev WHERE event_id % 10 >= 6),
       |s1 AS (
       |  SELECT * FROM v0 WHERE event_id NOT IN (SELECT event_id FROM u1)
       |  UNION ALL SELECT * FROM u1),
       |u2 AS (
       |  SELECT event_id, user_id, event_type, value * 2.0 AS value, day
       |  FROM ev WHERE event_id % 10 = 0 OR event_id % 10 = 5),
       |s2 AS (
       |  SELECT * FROM s1 WHERE event_id NOT IN (SELECT event_id FROM u2)
       |  UNION ALL SELECT * FROM u2)
       |SELECT day, count(*) AS n, ${dsum("value")} AS total_value
       |FROM s2 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def all: Seq[graft.Q] = Seq(
    graft.Q("q110_snapshot_merge", (s, d) => snapshotMergeRollup(s, d), Some(q110Sql)))
}
